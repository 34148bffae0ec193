"""Batch ReStyle inversion: per-step reconstructions + latents.npy + stats.

Parity: reference inversion/scripts/inference_iterative.py — saves per-step
images, a name → [n_iters × n_styles × 512] latents dict, and runtime stats.
TPU-first: frames batch through one jitted inversion step.
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path
from typing import Optional

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax.numpy as jnp
from PIL import Image

from stylegan3_editing_tpu.data import BatchIterator, ImagesDataset, encode_transforms
from stylegan3_editing_tpu.models.encoders import get_average_image, run_restyle_iterations
from stylegan3_editing_tpu.utils.cli import parse_dataclass
from stylegan3_editing_tpu.utils.common import tensor2im
from stylegan3_editing_tpu.utils.inference_utils import load_encoder


@dataclasses.dataclass
class TestOptions:
    """Parity: inversion/options/test_options.py."""

    exp_dir: str = "./experiments/inference"
    checkpoint_path: Optional[str] = None
    data_path: str = "./data"
    resize_outputs: bool = True
    test_batch_size: int = 2
    n_iters_per_batch: int = 3
    n_images: Optional[int] = None
    landmarks_transforms_path: Optional[str] = None


def run(opts: TestOptions):
    out_dir = Path(opts.exp_dir) / "inference_results"
    out_dir.mkdir(parents=True, exist_ok=True)

    model, variables, train_opts = load_encoder(opts.checkpoint_path)
    avg_image, latent_avg = get_average_image(model, variables)

    transforms = None
    if opts.landmarks_transforms_path:
        transforms = np.load(opts.landmarks_transforms_path,
                             allow_pickle=True).item()

    t = encode_transforms()["transform_inference"]
    dataset = ImagesDataset(opts.data_path, opts.data_path, target_transform=t)
    names = [p.name for p in dataset.source_paths]
    if opts.n_images:
        names = names[:opts.n_images]

    all_latents = {}
    times = []
    it = BatchIterator(dataset, opts.test_batch_size, shuffle=False)
    count = 0
    for x, _ in it.epoch_batches():
        if opts.n_images and count >= opts.n_images:
            break
        batch_names = names[count:count + x.shape[0]]
        lm = None
        if transforms is not None:
            lm = jnp.asarray(np.stack([transforms[n][-2] if isinstance(
                transforms[n], tuple) else transforms[n] for n in batch_names]))
        tic = time.time()
        results = run_restyle_iterations(
            model, variables, jnp.asarray(x), avg_image, latent_avg,
            n_iters=opts.n_iters_per_batch, landmarks_transform=lm,
            resize=opts.resize_outputs)
        times.append(time.time() - tic)

        for bi, name in enumerate(batch_names):
            all_latents[name] = np.stack(
                [np.asarray(codes[bi]) for _, _, codes in results])
            for step, (aligned, unaligned, _) in enumerate(results):
                img = unaligned if unaligned is not None else aligned
                step_dir = out_dir / f"step_{step}"
                step_dir.mkdir(exist_ok=True)
                tensor2im(np.asarray(img[bi])).save(step_dir / name)
        count += x.shape[0]

    np.save(Path(opts.exp_dir) / "latents.npy", all_latents)
    stats = {"mean_per_batch_s": float(np.mean(times)),
             "std_per_batch_s": float(np.std(times)),
             "batches": len(times)}
    with open(Path(opts.exp_dir) / "stats.txt", "w") as f:
        f.write(json.dumps(stats))
    print(f"inverted {count} images | {stats}")
    return all_latents


if __name__ == "__main__":
    run(parse_dataclass(TestOptions))
