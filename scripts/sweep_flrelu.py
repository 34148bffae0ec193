"""Config sweep for the fused filtered_lrelu kernel on the real chip.

Varies the per-tile VMEM budget (tile size) and the channel block width for
a chosen layer and prints ms/call per config — the empirical knob search
that BASELINE.md's round-3 scheduling notes come from.

Usage: python scripts/sweep_flrelu.py --layer L10 [--budgets 4.5,9,18]
           [--cblocks 128,256] [--iters 8]
"""

from __future__ import annotations

import argparse
import math
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--layer", required=True)
    ap.add_argument("--budgets", default="4.5,9,18")
    ap.add_argument("--cblocks", default="128,256")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    from stylegan3_editing_tpu.models.sg3 import sg3_r_config
    from stylegan3_editing_tpu.models.sg3.config import build_synthesis_layout
    from stylegan3_editing_tpu.ops.pallas_flrelu import fused_filtered_lrelu

    layout = build_synthesis_layout(sg3_r_config(1024))
    L = next(l for l in layout.layers if l.name.startswith(args.layer))
    dtype = jnp.bfloat16 if L.use_bf16 else jnp.float32
    x = jax.random.normal(
        jax.random.PRNGKey(0),
        (args.batch, L.in_size[0], L.in_size[1], L.out_channels), dtype)
    b = jnp.zeros((L.out_channels,), jnp.float32)

    for budget in args.budgets.split(","):
        os.environ["SG3TPU_FLRELU_BUDGET_MB"] = budget
        for cb in (int(c) for c in args.cblocks.split(",")):

            def call(xc, _cb=cb):
                return fused_filtered_lrelu(
                    xc, L.up_filter, L.down_filter, b, L.up_factor,
                    L.down_factor, tuple(L.padding), gain=math.sqrt(2),
                    slope=0.2, clamp=L.conv_clamp, c_block=_cb)

            probe = call(x)
            if probe is None:
                print(f"{L.name} budget={budget} cb={cb}: unsupported")
                continue

            def body(x_in, seed):
                def step(i, carry):
                    xc, acc = carry
                    y = call(xc)
                    return xc, acc + y[0, 0, 0, 0].astype(jnp.float32)
                _, acc = lax.fori_loop(
                    0, args.iters, step, (x_in, jnp.float32(seed) * 0))
                return acc

            run = jax.jit(body)
            try:
                float(run(x, 0))  # compile + first
                t0 = time.perf_counter()
                float(run(x, 1))
                ms = (time.perf_counter() - t0) / args.iters * 1e3
                print(f"{L.name} budget={budget} cb={cb}: {ms:8.2f} ms",
                      flush=True)
            except Exception as e:  # compile failure: print and continue
                msg = str(e).replace("\n", " ")[:300]
                print(f"{L.name} budget={budget} cb={cb}: FAIL {msg}",
                      flush=True)


if __name__ == "__main__":
    main()
