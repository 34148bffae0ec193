"""Reconstruction metrics (LPIPS / L2 / MS-SSIM) over output directories.

Parity: reference inversion/scripts/calc_losses_on_images.py — compares
per-step inversion outputs against ground-truth images, reporting mean±std
per metric. TPU-first: batched jitted metric evaluation.
"""

from __future__ import annotations

import dataclasses
import json
import sys
from pathlib import Path
from typing import Optional

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
from PIL import Image

from stylegan3_editing_tpu.criteria import LPIPS, msssim
from stylegan3_editing_tpu.data.transforms import compose, pil_to_array, resize
from stylegan3_editing_tpu.utils.cli import parse_dataclass


@dataclasses.dataclass
class LossCalcOptions:
    mode: str = "lpips"  # 'lpips' | 'l2' | 'msssim'
    output_path: str = "./inference_results"
    gt_path: str = "./gt_images"
    batch_size: int = 4
    lpips_variables: Optional[str] = None  # converted heads (.npz)


def run(opts: LossCalcOptions):
    prep = compose(resize(256), pil_to_array)
    out_root = Path(opts.output_path)
    step_dirs = sorted(out_root.glob("step_*")) or [out_root]

    lpips = LPIPS(net_type="alex")
    lpips_vars = None
    if opts.mode == "lpips":
        x0 = jnp.zeros((1, 256, 256, 3))
        lpips_vars = lpips.init(jax.random.PRNGKey(0), x0, x0)
        if opts.lpips_variables:
            from stylegan3_editing_tpu.models.sg3.convert import npz_to_variables
            lpips_vars = npz_to_variables(opts.lpips_variables)

    @jax.jit
    def metric(a, b):
        if opts.mode == "lpips":
            return jax.vmap(lambda x, y: lpips.apply(
                lpips_vars, x[None], y[None]))(a, b)
        if opts.mode == "l2":
            return jnp.mean(jnp.square(a - b), axis=(1, 2, 3))
        return jax.vmap(lambda x, y: msssim(x[None], y[None],
                                            val_range=2.0))(a, b)

    results = {}
    for step_dir in step_dirs:
        scores = []
        names = sorted(p.name for p in step_dir.iterdir()
                       if p.suffix.lower() in (".png", ".jpg", ".jpeg"))
        for start in range(0, len(names), opts.batch_size):
            chunk = names[start:start + opts.batch_size]
            a = jnp.asarray(np.stack(
                [prep(Image.open(step_dir / n)) for n in chunk]))
            b = jnp.asarray(np.stack(
                [prep(Image.open(Path(opts.gt_path) / n)) for n in chunk]))
            scores.extend(np.asarray(metric(a, b)).tolist())
        results[step_dir.name] = {"mean": float(np.mean(scores)),
                                  "std": float(np.std(scores)),
                                  "n": len(scores)}
        print(f"{opts.mode} {step_dir.name}: "
              f"{results[step_dir.name]['mean']:.4f} "
              f"± {results[step_dir.name]['std']:.4f}")
    out_file = out_root / f"{opts.mode}_scores.json"
    with open(out_file, "w") as f:
        json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    run(parse_dataclass(LossCalcOptions))
