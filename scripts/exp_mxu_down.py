"""Feasibility + perf probe: banded-matmul down-FIR on the MXU inside Pallas.

The fused filtered_lrelu kernel's down-pass is 60-75% of hot-layer time and
runs as VPU FMA chains (BASELINE.md round-3). The MXU sits idle. This probe
answers, on the real chip:

  1. Does Mosaic lower `lax.dot_general` with a 3-D rhs contracting the
     MIDDLE (sublane) dim — [J, Qw] x [Qh, Qw, C] -> [J, Qh, C]?  (This is
     the transpose-free shape for a banded down-W matmul.)
  2. Same for the chained second axis: [I, Qh] x [J, Qh, C] -> [I, J, C].
  3. How fast vs the equivalent VPU tap chain at L11-like tile shapes?

Usage: python scripts/exp_mxu_down.py [--dtype bf16|f32] [--iters 32]
"""

from __future__ import annotations

import argparse
import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def banded(j_out: int, q_in: int, taps: np.ndarray, stride: int = 1):
    """M[j, q] = taps[t] where q = j*stride + t."""
    m = np.zeros((j_out, q_in), np.float32)
    for j in range(j_out):
        for t, v in enumerate(taps):
            q = j * stride + t
            if q < q_in:
                m[j, q] = v
    return m


def kernel_mxu(p_ref, o_ref, *, mw, mh, acc_dtype):
    p = p_ref[...]
    t = lax.dot_general(mw, p, (((1,), (1,)), ((), ())),
                        preferred_element_type=acc_dtype)  # [J, Qh, C]
    o = lax.dot_general(mh, t, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # [I, J, C]
    o_ref[...] = o


def kernel_vpu(p_ref, o_ref, *, taps_w, taps_h, i_out, j_out):
    p = p_ref[...].astype(jnp.float32)  # [Qh, Qw, C]
    acc = None
    for t, v in enumerate(taps_w):
        term = p[:, t:t + j_out, :] * float(v)
        acc = term if acc is None else acc + term  # [Qh, J, C]
    out = None
    for t, v in enumerate(taps_h):
        term = acc[t:t + i_out, :, :] * float(v)
        out = term if out is None else out + term  # [I, J, C]
    o_ref[...] = out


def run(name, fn, p, out_shape, iters):
    f = jax.jit(lambda x: fn(x))
    try:
        y = f(p)
        y = np.asarray(y)
    except Exception as e:
        print(f"{name:10s} FAIL: {str(e)[:300]}")
        return None, None
    # chained timing (block_until_ready is a no-op under axon)
    def chain(x):
        def step(i, carry):
            xc, acc = carry
            yy = fn(xc * (1.0 + 1e-9 * i))
            return xc, acc + jnp.sum(yy, dtype=jnp.float32)
        _, acc = lax.fori_loop(0, iters, step, (x, 0.0))
        return acc
    g = jax.jit(chain)
    float(g(p))
    t0 = time.perf_counter()
    float(g(p))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:10s} {dt * 1e3:8.3f} ms/call")
    return y, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="f32")
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--qh", type=int, default=76)
    ap.add_argument("--qw", type=int, default=76)
    ap.add_argument("--c", type=int, default=128)
    ap.add_argument("--taps", type=int, default=12)
    args = ap.parse_args()

    dt_in = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    taps = np.hanning(args.taps + 2)[1:-1].astype(np.float32)
    i_out = args.qh - args.taps + 1
    j_out = args.qw - args.taps + 1
    mw = jnp.asarray(banded(j_out, args.qw, taps), dt_in)
    mh = jnp.asarray(banded(i_out, args.qh, taps), dt_in)

    key = jax.random.PRNGKey(0)
    p = jax.random.normal(key, (args.qh, args.qw, args.c), dt_in)

    out_shape = jax.ShapeDtypeStruct((i_out, j_out, args.c), jnp.float32)

    def mk(kern, **kw):
        return lambda x: pl.pallas_call(
            functools.partial(kern, **kw),
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    print(f"planes [{args.qh},{args.qw},{args.c}] {args.dtype}, "
          f"taps {args.taps}, out [{i_out},{j_out},{args.c}]")
    y_vpu, _ = run("vpu-chain", mk(kernel_vpu, taps_w=taps, taps_h=taps,
                                   i_out=i_out, j_out=j_out),
                   p, out_shape, args.iters)
    y_mxu, _ = run("mxu-dot", mk(kernel_mxu, mw=mw, mh=mh,
                                 acc_dtype=jnp.float32),
                   p, out_shape, args.iters)
    if y_vpu is not None and y_mxu is not None:
        err = np.max(np.abs(y_vpu - y_mxu)) / (np.max(np.abs(y_vpu)) + 1e-9)
        print(f"rel err vpu vs mxu: {err:.2e}")


if __name__ == "__main__":
    main()
