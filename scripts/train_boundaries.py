"""Train InterFaceGAN linear boundaries from latents + attribute scores.

Parity: reference editing/interfacegan/train_boundaries.py +
generate_latents_and_attribute_scores.py — sample z → W, score images with an
attribute/age/pose network, fit linear-SVM boundaries per attribute. For
unaligned generators the pseudo-alignment trick (w0 = w_avg) is applied.
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path
from typing import Optional

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from stylegan3_editing_tpu.editing.attribute_scorers import (
    AgeEstimator,
    AttributeClassifier,
    CELEBA_ATTRIBUTES,
    PoseEstimator,
    score_latents,
)
from stylegan3_editing_tpu.editing.interfacegan import (
    pseudo_align_latents,
    train_boundary,
)
from stylegan3_editing_tpu.models.sg3 import Generator, sg3_r_config
from stylegan3_editing_tpu.models.sg3.convert import load_torch_pt, npz_to_variables
from stylegan3_editing_tpu.utils.cli import parse_dataclass


@dataclasses.dataclass
class BoundaryOptions:
    output_dir: str = "./boundaries"
    generator_path: Optional[str] = None
    output_size: int = 1024
    n_samples: int = 10000
    batch_size: int = 8
    truncation_psi: float = 0.7
    attribute: str = "Smiling"  # CelebA name, or 'age', or 'pose_yaw'
    pseudo_align: bool = False
    seed: int = 0
    decoder_channel_base: Optional[int] = None
    decoder_channel_max: Optional[int] = None
    decoder_num_layers: Optional[int] = None


def main(opts: BoundaryOptions):
    overrides = {k: v for k, v in {
        "channel_base": opts.decoder_channel_base,
        "channel_max": opts.decoder_channel_max,
        "num_layers": opts.decoder_num_layers}.items() if v}
    cfg = sg3_r_config(opts.output_size, **overrides)
    model = Generator(cfg)
    if opts.generator_path and opts.generator_path.endswith(".npz"):
        variables = npz_to_variables(opts.generator_path)
    elif opts.generator_path:
        variables, _ = load_torch_pt(opts.generator_path, cfg)
    else:
        variables = jax.jit(model.init)(jax.random.PRNGKey(opts.seed),
                                        jnp.zeros((1, cfg.z_dim)))
        print("WARNING: random generator (no --generator_path)")

    # Sample W latents.
    rng = np.random.RandomState(opts.seed)
    mapped = jax.jit(lambda v, z: model.apply(
        v, z, truncation_psi=opts.truncation_psi, method=model.map))
    all_ws = []
    for start in range(0, opts.n_samples, 256):
        n = min(256, opts.n_samples - start)
        z = jnp.asarray(rng.randn(n, cfg.z_dim).astype(np.float32))
        all_ws.append(np.asarray(mapped(variables, z)))
    ws = np.concatenate(all_ws)
    if opts.pseudo_align:
        w_avg = variables["ema"]["mapping"]["w_avg"]
        ws = np.asarray(pseudo_align_latents(jnp.asarray(ws), w_avg))

    # Scorer (random weights unless converted checkpoints are wired in).
    if opts.attribute == "age":
        scorer = AgeEstimator()
        s_vars = scorer.init(jax.random.PRNGKey(1),
                             jnp.zeros((1, 224, 224, 3)))
        score_fn = jax.jit(lambda imgs: scorer.apply(s_vars, imgs))
    elif opts.attribute.startswith("pose_"):
        scorer = PoseEstimator()
        s_vars = scorer.init(jax.random.PRNGKey(1),
                             jnp.zeros((1, 224, 224, 3)))
        axis = opts.attribute.split("_", 1)[1]
        score_fn = jax.jit(lambda imgs: scorer.apply(s_vars, imgs)[axis])
    else:
        idx = CELEBA_ATTRIBUTES.index(opts.attribute)
        scorer = AttributeClassifier()
        s_vars = scorer.init(jax.random.PRNGKey(1),
                             jnp.zeros((1, 224, 224, 3)))
        score_fn = jax.jit(lambda imgs: scorer.apply(s_vars, imgs)[:, idx])

    synth = jax.jit(lambda ws, t: model.apply(variables, ws,
                                              method=model.synthesize))
    scores = score_latents(synth, score_fn, jnp.asarray(ws),
                           batch_size=opts.batch_size)

    # Boundary on w0 (the reference trains on W, one row per sample).
    boundary = train_boundary(ws[:, 0, :], scores, chosen_num_or_ratio=0.02)
    out = Path(opts.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    np.save(out / f"{opts.attribute}_boundary.npy", boundary)
    print(f"saved boundary → {out / f'{opts.attribute}_boundary.npy'}")


if __name__ == "__main__":
    main(parse_dataclass(BoundaryOptions))
