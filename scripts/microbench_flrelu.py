"""Per-layer filtered_lrelu microbenchmark at the SG3-R 1024² geometries.

Times each synthesis layer's filtered_lrelu in isolation (chained fori_loop,
forced transfer — block_until_ready is a no-op under axon) and prints a
table: layer, impl, ms/call, achieved Gflop/s vs the VPU probe ceiling.

Usage:
    python scripts/microbench_flrelu.py [--impl fused|xla] [--layers L10,L11]
    python scripts/microbench_flrelu.py --batch 2 --iters 8
    python scripts/microbench_flrelu.py --mode bwd   # fused backward kernel
        (engine via SG3TPU_FLRELU_DOWN_BWD=vpu|mxu — the round-5 backward
        engine shootout; forward rows are unaffected by that knob)
"""

from __future__ import annotations

import argparse
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


def layer_flops(L, batch: int) -> float:
    """Approximate fp32 flops per call: up-grid points × ~(2·taps/up + act).

    Rank = the ACTUAL number of SVD terms the kernel runs (incl. the bf16
    rank truncation), not a worst-case 4 — else Gflop/s flatters radial
    layers whose filters are rank 2-3."""
    uh = L.in_size[0] * L.up_factor
    uw = L.in_size[1] * L.up_factor
    per_point = 2 * (L.up_taps / L.up_factor) * 2 + 4  # sep up (H+W) + act
    down_pts = (uh // L.down_factor) * (uw // L.down_factor)
    rank = 1.0
    fd = np.asarray(L.down_filter, np.float64)
    if fd.ndim == 2:
        from stylegan3_editing_tpu.ops.fir import _separate_2d
        from stylegan3_editing_tpu.ops.pallas_flrelu import \
            _truncate_rank_terms
        terms = _separate_2d(fd) or []
        if L.use_bf16:
            terms = _truncate_rank_terms(terms)
        # Effective rank = nonzero-tap fraction (tap-tail compression
        # zeroes entries; the chains skip them — no FMA issued).
        nz = sum(int(np.count_nonzero(c)) + int(np.count_nonzero(r))
                 for c, r in terms)
        rank = max(nz / (2.0 * L.down_taps), 1e-6)
    down = 2 * (L.down_taps / 1) * 2 * rank * down_pts  # sep down per rank
    return batch * L.out_channels * (uh * uw * per_point + down)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="fused")
    ap.add_argument("--layers", default=None)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--mode", default="fwd", choices=["fwd", "bwd"],
                    help="bwd times fused_filtered_lrelu_bwd (dx kernel)")
    args = ap.parse_args()

    from stylegan3_editing_tpu.models.sg3 import sg3_r_config
    from stylegan3_editing_tpu.models.sg3.config import build_synthesis_layout
    from stylegan3_editing_tpu.ops.filtered_lrelu import filtered_lrelu

    cfg = sg3_r_config(1024)
    layout = build_synthesis_layout(cfg)
    want = set(args.layers.split(",")) if args.layers else None

    total_ms = 0.0
    for L in layout.layers:
        if L.up_factor == 1 and L.down_factor == 1:
            continue  # ToRGB — no FIR
        if want and not any(L.name.startswith(w) for w in want):
            continue
        dtype = jnp.bfloat16 if L.use_bf16 else jnp.float32
        x = jax.random.normal(
            jax.random.PRNGKey(L.idx),
            (args.batch, L.in_size[0], L.in_size[1], L.out_channels), dtype)
        b = jnp.zeros((L.out_channels,), jnp.float32)
        gain = np.sqrt(2.0)

        if args.mode == "bwd":
            from stylegan3_editing_tpu.ops.pallas_flrelu import \
                fused_filtered_lrelu_bwd

            # dy at the layer's OUTPUT geometry (composition size formula).
            tu = len(np.asarray(L.up_filter))
            fd_np = np.asarray(L.down_filter)
            td_h, td_w = ((len(fd_np),) * 2 if fd_np.ndim == 1
                          else fd_np.shape)
            px0, px1, py0, py1 = L.padding
            oh = (L.in_size[0] * L.up_factor + py0 + py1 - (tu - 1)
                  - (td_h - 1) + 1) // L.down_factor
            ow = (L.in_size[1] * L.up_factor + px0 + px1 - (tu - 1)
                  - (td_w - 1) + 1) // L.down_factor
            dy = jax.random.normal(
                jax.random.PRNGKey(100 + L.idx),
                (args.batch, oh, ow, L.out_channels), dtype)

            def call_bwd(dyc, xc, _L=L, _b=b, _g=gain):
                return fused_filtered_lrelu_bwd(
                    dyc, xc, fu=np.asarray(_L.up_filter),
                    fd=np.asarray(_L.down_filter), b=_b, up=_L.up_factor,
                    down=_L.down_factor, padding=_L.padding, gain=_g,
                    slope=0.2, clamp=_L.conv_clamp)

            def body(dy_in, x_in, seed):
                def step(i, carry):
                    dyc, xc, acc = carry
                    dx = call_bwd(dyc * (1.0 + 1e-6 * i + 1e-9 * seed), xc)
                    return dyc, xc, acc + jnp.sum(dx, dtype=jnp.float32)
                _, _, acc = lax.fori_loop(0, args.iters, step,
                                          (dy_in, x_in, 0.0))
                return acc

            run = jax.jit(body)
            run_args = (dy, x)
        else:
            def call(xc, _L=L, _b=b, _g=gain):
                return filtered_lrelu(
                    xc, fu=_L.up_filter, fd=_L.down_filter, b=_b,
                    up=_L.up_factor, down=_L.down_factor, padding=_L.padding,
                    gain=_g, slope=0.2, clamp=_L.conv_clamp, impl=args.impl)

            def body(x_in, seed):
                # x_in is an ARGUMENT (a closure-captured x becomes an HLO
                # constant — at 1044² that overflows the remote compile
                # helper's request-size limit, HTTP 413).
                def step(i, carry):
                    xc, acc = carry
                    y = call(xc * (1.0 + 1e-6 * i + 1e-9 * seed))
                    return xc, acc + jnp.sum(y, dtype=jnp.float32)
                _, acc = lax.fori_loop(0, args.iters, step, (x_in, 0.0))
                return acc

            run = jax.jit(body)
            run_args = (x,)

        tag = args.impl if args.mode == "fwd" else "bwd:" + os.environ.get(
            "SG3TPU_FLRELU_DOWN_BWD",
            os.environ.get("SG3TPU_FLRELU_DOWN", "auto"))
        try:
            float(run(*run_args, 0))
        except Exception as e:
            # The axon helper buries the REAL error (OOM/Mosaic/layout) in
            # the exception text's log lines — keep enough to grep it.
            msg = str(e)
            for key in ("Ran out of memory", "Mosaic", "RESOURCE_EXHAUSTED",
                        "exceeded", "Scoped allocation"):
                i = msg.find(key)
                if i >= 0:
                    msg = msg[max(0, i - 200):i + 400]
                    break
            else:
                msg = msg[:600]
            print(f"{L.name:16s} {tag:10s} COMPILE-FAIL: {msg}", flush=True)
            continue
        t0 = time.perf_counter()
        float(run(*run_args, 1))
        dt = (time.perf_counter() - t0) / args.iters
        gf = layer_flops(L, args.batch) / dt / 1e9
        total_ms += dt * 1e3
        print(f"{L.name:16s} {tag:10s} {dt*1e3:8.2f} ms  "
              f"{gf:8.1f} Gflop/s", flush=True)
    print(f"{'TOTAL':16s} {tag if 'tag' in dir() else args.impl:10s} "
          f"{total_ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
