"""Per-image pivotal tuning over inverted latents (CLI).

Parity: reference inversion/scripts/run_pti_images.py — starts from
`latents.npy` pivots, tunes the generator per image (LPIPS+L2, early stop),
saves tuned models + result images. TPU-first: images tune in parallel
batches via vmapped per-image weights.
"""

from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path
from typing import Optional

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax.numpy as jnp

from stylegan3_editing_tpu.data import ImagesDataset, encode_transforms
from stylegan3_editing_tpu.inversion import PTI, PTIOptions
from stylegan3_editing_tpu.models.sg3 import Generator, sg3_r_config
from stylegan3_editing_tpu.models.sg3.convert import (
    load_torch_pt,
    npz_to_variables,
    variables_to_npz,
)
from stylegan3_editing_tpu.utils.cli import parse_dataclass
from stylegan3_editing_tpu.utils.common import tensor2im


@dataclasses.dataclass
class RunPTIOptions:
    exp_dir: str = "./experiments/pti"
    images_path: str = "./data"
    latents_path: str = "./latents.npy"
    generator_path: Optional[str] = None
    landmarks_transforms_path: Optional[str] = None
    output_size: int = 1024
    learning_rate: float = 3e-4
    lpips_lambda: float = 1.0
    l2_lambda: float = 1.0
    steps: int = 350
    lpips_threshold: float = 0.06
    batch_size: int = 4
    save_models: bool = True
    # Video PTI (reference inversion/video/run_pti_video.py:96-171): ONE
    # generator tuned over ALL inputs (frames) instead of per-image copies.
    shared_weights: bool = False
    # decoder capacity overrides (smoke tests / small domains)
    decoder_channel_base: Optional[int] = None
    decoder_channel_max: Optional[int] = None
    decoder_num_layers: Optional[int] = None


def main(opts: RunPTIOptions):
    out_dir = Path(opts.exp_dir)
    (out_dir / "images").mkdir(parents=True, exist_ok=True)

    # Validate inputs before the (slow) generator build.
    latents = np.load(opts.latents_path, allow_pickle=True).item()
    transforms = None
    if opts.landmarks_transforms_path:
        transforms = np.load(opts.landmarks_transforms_path,
                             allow_pickle=True).item()

    overrides = {}
    if opts.decoder_channel_base:
        overrides["channel_base"] = opts.decoder_channel_base
    if opts.decoder_channel_max:
        overrides["channel_max"] = opts.decoder_channel_max
    if opts.decoder_num_layers:
        overrides["num_layers"] = opts.decoder_num_layers
    cfg = sg3_r_config(opts.output_size, **overrides)

    if opts.generator_path is None:
        import jax
        variables = jax.jit(Generator(cfg).init)(
            jax.random.PRNGKey(0), jnp.zeros((1, cfg.z_dim)))
        print("WARNING: tuning a randomly initialized generator "
              "(no --generator_path)")
    elif str(opts.generator_path).endswith(".npz"):
        variables = npz_to_variables(opts.generator_path)
    else:
        variables, _ = load_torch_pt(opts.generator_path, cfg)

    t = encode_transforms(resolution=cfg.img_resolution)["transform_inference"]
    dataset = ImagesDataset(opts.images_path, opts.images_path,
                            target_transform=t)
    names = [p.name for p in dataset.source_paths if p.name in latents]

    pti = PTI(cfg, variables, opts=PTIOptions(
        learning_rate=opts.learning_rate, lpips_lambda=opts.lpips_lambda,
        l2_lambda=opts.l2_lambda, steps=opts.steps,
        lpips_threshold=opts.lpips_threshold))

    name_to_idx = {p.name: i for i, p in enumerate(dataset.source_paths)}

    def load_rows(batch_names):
        codes = jnp.asarray(np.stack(
            [np.asarray(latents[n])[-1] for n in batch_names]))
        targets = jnp.asarray(np.stack(
            [dataset[name_to_idx[n]][1] for n in batch_names]))
        tfm = None
        if transforms is not None:
            tfm = jnp.asarray(np.stack(
                [np.asarray(transforms[n][-1] if isinstance(transforms[n],
                 (tuple, list)) else transforms[n]) for n in batch_names]))
        return codes, targets, tfm

    if opts.shared_weights:
        # Video mode: epochs over all frames with shared synthesis params.
        def batches():
            for start in range(0, len(names), opts.batch_size):
                yield load_rows(names[start:start + opts.batch_size])

        tic = time.time()
        tuned, history = pti.optimize_shared(batches, steps=opts.steps,
                                             batch_size=opts.batch_size)
        print(f"shared-weights PTI over {len(names)} frames: "
              f"{time.time() - tic:.1f}s, final loss "
              f"{history[-1]['loss']:.4f} (lpips {history[-1]['lpips']:.4f})")
        import jax
        model = Generator(cfg)
        tuned_vars = pti.tuned_variables(tuned)
        render = jax.jit(lambda ws: model.apply(
            tuned_vars, ws, method=model.synthesize))
        for start in range(0, len(names), opts.batch_size):
            batch_names = names[start:start + opts.batch_size]
            codes, _, _ = load_rows(batch_names)
            imgs = render(codes)
            for bi, name in enumerate(batch_names):
                tensor2im(np.asarray(imgs[bi])).save(out_dir / "images" / name)
        if opts.save_models:
            variables_to_npz({"synthesis_tuned": tuned},
                             str(out_dir / "pti_video_model.npz"))
        return

    for start in range(0, len(names), opts.batch_size):
        batch_names = names[start:start + opts.batch_size]
        codes, targets, tfm = load_rows(batch_names)
        tic = time.time()
        stacked, imgs, metrics = pti.optimize_batch(codes, targets, tfm)
        dt = time.time() - tic
        for bi, name in enumerate(batch_names):
            tensor2im(np.asarray(imgs[bi])).save(out_dir / "images" / name)
            if opts.save_models:
                import jax
                one = jax.tree_util.tree_map(lambda p: np.asarray(p[bi]),
                                             stacked)
                variables_to_npz({"synthesis_tuned": one},
                                 str(out_dir / f"{Path(name).stem}_model.npz"))
        print(f"batch {batch_names}: {dt:.1f}s, "
              f"lpips={np.round(metrics['lpips'], 4).tolist()}, "
              f"converged={metrics['converged'].tolist()}")


if __name__ == "__main__":
    main(parse_dataclass(RunPTIOptions))
