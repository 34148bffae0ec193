"""One-off: VMEM working-set budget sweep on the hot layers at batch 8.

The 9 MB plateau was established at batch 2; the fold changes tile shapes
at batch 8, so re-check 9 vs 12 vs 16 MB on the layers that dominate.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sg3tpu_tpu_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", default="L9,L10,L11,L12,L13")
    ap.add_argument("--budgets", default="9,12,16")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    from stylegan3_editing_tpu.models.sg3 import sg3_r_config
    from stylegan3_editing_tpu.models.sg3.config import build_synthesis_layout
    from stylegan3_editing_tpu.ops.pallas_flrelu import fused_filtered_lrelu

    cfg = sg3_r_config(1024)
    layout = build_synthesis_layout(cfg)
    want = set(args.layers.split(","))

    for L in layout.layers:
        if L.up_factor == 1 and L.down_factor == 1:
            continue
        if not any(L.name.startswith(w + "_") for w in want):
            continue
        dtype = jnp.bfloat16 if L.use_bf16 else jnp.float32
        x = jax.random.normal(
            jax.random.PRNGKey(L.idx),
            (args.batch, L.in_size[0], L.in_size[1], L.out_channels), dtype)
        b = jnp.zeros((L.out_channels,), jnp.float32)
        for mb in [float(v) for v in args.budgets.split(",")]:
            os.environ["SG3TPU_FLRELU_BUDGET_MB"] = str(mb)

            def call(xc, _L=L, _b=b):
                return fused_filtered_lrelu(
                    xc, fu=_L.up_filter, fd=_L.down_filter, b=_b,
                    up=_L.up_factor, down=_L.down_factor,
                    padding=_L.padding, gain=np.sqrt(2.0), slope=0.2,
                    clamp=_L.conv_clamp)

            def body(x_in, seed):
                def step(i, carry):
                    xc, acc = carry
                    y = call(xc * (1.0 + 1e-6 * i + 1e-9 * seed))
                    return xc, acc + jnp.sum(y, dtype=jnp.float32)
                _, acc = lax.fori_loop(0, args.iters, step, (x_in, 0.0))
                return acc

            run = jax.jit(body)
            try:
                float(run(x, 0))
            except Exception as e:
                print(f"{L.name:14s} budget={mb:5.1f}MB FAIL: {str(e)[:90]}")
                continue
            t0 = time.perf_counter()
            float(run(x, 1))
            dt = (time.perf_counter() - t0) / args.iters
            print(f"{L.name:14s} budget={mb:5.1f}MB {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
