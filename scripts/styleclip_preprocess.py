"""StyleCLIP global-directions preprocessing: S statistics + delta_i_c.

Parity: reference editing/styleclip_global_directions/preprocess/
{s_statistics.py, create_delta_i_c.py}. Both stages run as batched TPU jobs
(the reference loops one channel per generator call; here channels batch
onto the batch axis).
"""

from __future__ import annotations

import dataclasses
import pickle
import sys
from pathlib import Path
from typing import Optional

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from stylegan3_editing_tpu.editing.styleclip_global import (
    compute_delta_i_c,
    compute_s_statistics,
)
from stylegan3_editing_tpu.models.backbones.clip import CLIP, convert_clip_state
from stylegan3_editing_tpu.models.sg3 import Generator, sg3_r_config, sg3_t_config
from stylegan3_editing_tpu.models.sg3.convert import load_torch_pt, npz_to_variables
from stylegan3_editing_tpu.utils.cli import parse_dataclass


@dataclasses.dataclass
class PreprocessOptions:
    stage: str = "stats"  # 'stats' | 'delta_i_c'
    output_path: str = "./styleclip_stats"
    generator_path: Optional[str] = None
    clip_weights: Optional[str] = None  # OpenAI CLIP state dict (.pt)
    stylegan_size: int = 1024
    is_landscape: bool = False
    truncation_psi: float = 0.5
    truncation_cutoff: int = 8
    num_images: int = 100_000
    num_samples: int = 1
    manipulation_strength: float = 5.0
    channels_per_batch: int = 8
    seed: int = 0
    decoder_channel_base: Optional[int] = None
    decoder_channel_max: Optional[int] = None
    decoder_num_layers: Optional[int] = None


def build_generator(opts):
    overrides = {k: v for k, v in {
        "channel_base": opts.decoder_channel_base,
        "channel_max": opts.decoder_channel_max,
        "num_layers": opts.decoder_num_layers}.items() if v}
    cfg = (sg3_t_config if opts.is_landscape else sg3_r_config)(
        opts.stylegan_size, **overrides)
    model = Generator(cfg)
    if opts.generator_path and str(opts.generator_path).endswith(".npz"):
        variables = npz_to_variables(opts.generator_path)
    elif opts.generator_path:
        variables, _ = load_torch_pt(opts.generator_path, cfg)
    else:
        variables = jax.jit(model.init)(jax.random.PRNGKey(opts.seed),
                                        jnp.zeros((1, cfg.z_dim)))
        print("WARNING: random generator (no --generator_path)")
    return cfg, model, variables


def main(opts: PreprocessOptions):
    out = Path(opts.output_path)
    out.mkdir(parents=True, exist_ok=True)
    cfg, model, variables = build_generator(opts)

    if opts.stage == "stats":
        transform, s_mean, s_std, s_1k = compute_s_statistics(
            model, variables, num_images=opts.num_images,
            truncation_psi=opts.truncation_psi,
            truncation_cutoff=opts.truncation_cutoff, seed=opts.seed)
        with open(out / "s_stats", "wb") as f:
            pickle.dump([transform, s_mean, s_std], f)
        with open(out / "S_1000", "wb") as f:
            pickle.dump(s_1k, f)
        print(f"wrote s_stats + S_1000 → {out}")
        return

    assert opts.stage == "delta_i_c"
    clip_model = CLIP()
    if opts.clip_weights:
        import torch
        state = {k: v.numpy() for k, v in torch.load(
            opts.clip_weights, map_location="cpu").items()}
        clip_vars = convert_clip_state(state)
    else:
        clip_vars = clip_model.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 224, 224, 3)),
            jnp.zeros((1, 77), jnp.int32))
        print("WARNING: random CLIP (no --clip_weights)")
    with open(out / "s_stats", "rb") as f:
        transform, s_mean, s_std = pickle.load(f)
    with open(out / "S_1000", "rb") as f:
        s_1k = pickle.load(f)
    delta = compute_delta_i_c(
        model, variables, clip_model, clip_vars, s_1k, s_mean, s_std,
        num_samples=opts.num_samples,
        manipulation_strength=opts.manipulation_strength,
        channels_per_batch=opts.channels_per_batch)
    np.save(out / "delta_i_c.npy", delta)
    print(f"wrote delta_i_c {delta.shape} → {out / 'delta_i_c.npy'}")


if __name__ == "__main__":
    main(parse_dataclass(PreprocessOptions))
