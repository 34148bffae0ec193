"""One-off: how much of the synthesis step is NOT filtered_lrelu?

Times full 1024² synthesis twice: (a) normal fused path, (b) with
filtered_lrelu monkeypatched to a shape-correct near-no-op (zeros of the
output shape + bias broadcast so downstream magnitudes stay sane). The
difference isolates the in-model flrelu cost; the stub time bounds the
non-flrelu remainder (modulated conv, Fourier input, ToRGB, layout ops).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sg3tpu_tpu_cache")
os.environ.setdefault("SG3TPU_FLRELU_IMPL", "fused")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--mode", default="both", choices=("real", "stub", "both"))
    args = ap.parse_args()

    import importlib

    from stylegan3_editing_tpu.models.sg3 import Generator, sg3_r_config
    fl_mod = importlib.import_module(
        "stylegan3_editing_tpu.ops.filtered_lrelu")
    syn_mod = importlib.import_module(
        "stylegan3_editing_tpu.models.sg3.synthesis")
    from stylegan3_editing_tpu.ops.upfirdn2d import _filter_size, parse_padding

    cfg = sg3_r_config(1024)
    model = Generator(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, cfg.z_dim), jnp.float32))

    real_flrelu = fl_mod.filtered_lrelu

    def stub(x, fu=None, fd=None, b=None, up=1, down=1, padding=0,
             gain=float(np.sqrt(2)), slope=0.2, clamp=None,
             flip_filter=False, impl="auto"):
        px0, px1, py0, py1 = parse_padding(padding)
        fu_w, fu_h = _filter_size(
            None if fu is None else jnp.asarray(fu, jnp.float32))
        fd_w, fd_h = _filter_size(
            None if fd is None else jnp.asarray(fd, jnp.float32))
        n, h, w, c = x.shape
        ow = (w * up + px0 + px1 - (fu_w - 1) - (fd_w - 1) + (down - 1)) // down
        oh = (h * up + py0 + py1 - (fu_h - 1) - (fd_h - 1) + (down - 1)) // down
        base = jnp.zeros((n, oh, ow, c), x.dtype)
        if b is not None:
            base = base + b.astype(x.dtype)
        # Keep a data dependence on x so nothing upstream is DCE'd.
        return base + jnp.mean(x, dtype=jnp.float32).astype(x.dtype) * 1e-6

    def timed(label):
        def body(seed):
            def step(i, acc):
                z = jax.random.normal(
                    jax.random.fold_in(jax.random.PRNGKey(1), i + seed),
                    (args.batch, cfg.z_dim))
                img = model.apply(variables, z, truncation_psi=0.7)
                return acc + jnp.sum(img, dtype=jnp.float32)
            return lax.fori_loop(0, args.iters, step, 0.0)

        run = jax.jit(body)
        float(run(0))
        t0 = time.perf_counter()
        float(run(1))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{label}: {dt*1e3:.1f} ms/step (batch {args.batch})")
        return dt

    if args.mode in ("real", "both"):
        timed("real ")
    if args.mode in ("stub", "both"):
        fl_mod.filtered_lrelu = stub
        syn_mod.filtered_lrelu = stub
        try:
            timed("stub ")
        finally:
            fl_mod.filtered_lrelu = real_flrelu
            syn_mod.filtered_lrelu = real_flrelu


if __name__ == "__main__":
    main()
