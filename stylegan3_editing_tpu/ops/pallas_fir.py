"""Pallas TPU kernel: 1-D polyphase FIR resample with VMEM tap reuse.

The performance core of alias-free synthesis (SURVEY.md §7 "hard parts").
XLA's depthwise convs run ~10× off memory-bound on TPU for SG3's 12-tap
up/down filters, and a shift-and-add formulation amplifies HBM reads taps×
(TPU has no HBM cache). This kernel loads each input tile into VMEM ONCE
and applies every tap/phase from VMEM — one HBM read + one write per pass
(measured 3.6× over the XLA conv on the hot up-pass).

Supports: arbitrary (up, down, pad0, pad1) along H or W of an NHWC tensor,
static numpy taps. 2-D radial filters run as a few exact SVD-separated
rank-1 terms at the caller. Strided (down) reads arrive pre-split into
`stride` sub-phase arrays (host-side XLA slices) so every in-kernel read is
contiguous (Mosaic has no strided gather). Differentiable via the analytic
upfirdn adjoint (`pallas_upfirdn2d`).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _phase_plan(length: int, ntaps: int, up: int, down: int, pad0: int,
                pad1: int):
    """Static polyphase plan: z[P·q + r] = Σ_t fc_r[t]·x[q·s + c_r + t]."""
    out_len = (length * up + pad0 + pad1 - ntaps) // down + 1
    g = math.gcd(up, down)
    num_phases = up // g
    stride = down // g
    # Uniform per-phase output count (output padded up to a multiple of P).
    out_alloc = -(-out_len // num_phases) * num_phases
    q_count = out_alloc // num_phases
    phases = []
    min_c = 0
    max_idx = 0
    for r in range(num_phases):
        j0 = (pad0 - r * down) % up
        c_r = (r * down + j0 - pad0) // up
        phases.append((j0, c_r))
        min_c = min(min_c, c_r)
        t_count = (ntaps - j0 + up - 1) // up
        if t_count > 0:
            max_idx = max(max_idx, (q_count - 1) * stride + c_r + t_count - 1)
    left = -min_c
    right = max(0, max_idx + left - (length - 1))
    return out_len, out_alloc, num_phases, stride, phases, left, right


def _fir_kernel(*refs, taps, up, phases, stride, axis_in_block, chunk):
    """Polyphase FIR along `axis_in_block` of the VMEM block.

    fori_loop over fixed `chunk`-sized output windows (dynamic pl.ds
    offsets → compact Mosaic code, small fp32 accumulators). Input index
    math: m = q·s + c_r + t lives in sub-phase (c_r+t) % s at offset
    q + (c_r+t)//s (every c_r+t ≥ 0 after host padding).
    """
    x_refs, o_ref = refs[:-1], refs[-1]
    num_phases = len(phases)
    out_alloc = o_ref.shape[axis_in_block]  # multiple of num_phases
    chunk = max((chunk // num_phases) * num_phases, num_phases)
    chunk = min(chunk, out_alloc)
    qc = chunk // num_phases

    def read(sub, start, size):
        idx = [slice(None)] * len(x_refs[sub].shape)
        idx[axis_in_block] = pl.ds(start, size)
        return x_refs[sub][tuple(idx)]

    num_windows = pl.cdiv(out_alloc, chunk)

    def window(i, carry):
        ostart = jnp.minimum(i * chunk, out_alloc - chunk)
        # out_alloc and chunk are multiples of P → ostart stays aligned.
        q0 = ostart // num_phases
        per_phase = []
        for (j0, c_r) in phases:
            taps_r = taps[j0::up]
            acc = None
            for t in range(len(taps_r)):
                base = c_r + t
                sub = base % stride
                off = base // stride
                term = read(sub, q0 + off, qc).astype(jnp.float32) \
                    * np.float32(taps_r[t])
                acc = term if acc is None else acc + term
            if acc is None:
                shape = list(x_refs[0].shape)
                shape[axis_in_block] = qc
                acc = jnp.zeros(shape, jnp.float32)
            per_phase.append(acc)
        if num_phases == 1:
            result = per_phase[0]
        else:
            stacked = jnp.stack(per_phase, axis=axis_in_block + 1)
            shape = list(per_phase[0].shape)
            shape[axis_in_block] *= num_phases
            result = stacked.reshape(shape)
        idx = [slice(None)] * len(o_ref.shape)
        idx[axis_in_block] = pl.ds(ostart, chunk)
        o_ref[tuple(idx)] = result.astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, num_windows, window, 0)


def _round_up(v, m):
    return (v + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=(
    "axis", "up", "down", "pad0", "pad1", "taps_tuple"))
def _fir_pallas_axis(x, *, taps_tuple, axis, up, down, pad0, pad1):
    """Run the kernel along `axis` (1=H or 2=W) of NHWC x."""
    taps = np.asarray(taps_tuple, np.float32)
    n, h, w, c = x.shape
    length = x.shape[axis]
    out_len, out_alloc, num_phases, stride, phases, leftp, rightp = \
        _phase_plan(length, len(taps), up, down, pad0, pad1)

    # Zero-pad the filter axis on the host graph (cheap, fused by XLA).
    pad_cfg = [(0, 0)] * 4
    pad_cfg[axis] = (leftp, rightp)
    xp = jnp.pad(x, pad_cfg) if (leftp or rightp) else x
    in_len = xp.shape[axis]

    # stride > 1: pre-split into `stride` sub-phase arrays so every
    # in-kernel read is contiguous.
    if stride > 1:
        extra = (-in_len) % stride
        if extra:
            pad_cfg = [(0, 0)] * 4
            pad_cfg[axis] = (0, extra)
            xp = jnp.pad(xp, pad_cfg)
            in_len += extra
        subs = []
        for p in range(stride):
            idx = [slice(None)] * 4
            idx[axis] = slice(p, None, stride)
            subs.append(xp[tuple(idx)])
        inputs = subs
        sub_len = in_len // stride
    else:
        inputs = [xp]
        sub_len = in_len

    # Offsets relative to the padded input.
    phases_shifted = [(j0, c_r + leftp) for (j0, c_r) in phases]

    # Mosaic: last two block dims must be divisible by (8, 128) or equal to
    # the array dims — keep channel + filter axes whole, tile the other axis.
    # VMEM budget accounts for ALL blocks (sub-phase inputs + output) at the
    # element size of x, ×2 for Mosaic's double buffering, within ~10 MB of
    # the 16 MB scoped limit (headroom for accumulators/spills).
    esize = jnp.dtype(x.dtype).itemsize
    budget = 10 * 2 ** 20
    if axis == 2:
        per_row = max((sub_len * len(inputs) + out_alloc) * c * esize * 2, 1)
        hb = max(min(h, budget // per_row), 1)
        grid = (n, pl.cdiv(h, hb))
        in_specs = [pl.BlockSpec((1, hb, sub_len, c),
                                 lambda i, j: (i, j, 0, 0),
                                 memory_space=pltpu.VMEM)
                    for _ in inputs]
        out_spec = pl.BlockSpec((1, hb, out_alloc, c),
                                lambda i, j: (i, j, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = (n, h, out_alloc, c)
        axis_in_block = 2
    else:
        per_col = max((sub_len * len(inputs) + out_alloc) * c * esize * 2, 1)
        wb = max(min(w, budget // per_col), 1)
        wb = max((wb // 8) * 8, min(8, w))
        if w % wb != 0 and wb > 8:
            wb = 8  # keep blocks aligned; Pallas pads the ragged tail
        grid = (n, pl.cdiv(w, wb))
        in_specs = [pl.BlockSpec((1, sub_len, wb, c),
                                 lambda i, j: (i, 0, j, 0),
                                 memory_space=pltpu.VMEM)
                    for _ in inputs]
        out_spec = pl.BlockSpec((1, out_alloc, wb, c),
                                lambda i, j: (i, 0, j, 0),
                                memory_space=pltpu.VMEM)
        out_shape = (n, out_alloc, w, c)
        axis_in_block = 1

    kernel = functools.partial(
        _fir_kernel, taps=taps, up=up, phases=phases_shifted,
        stride=stride, axis_in_block=axis_in_block,
        chunk=256 if axis == 1 else out_alloc)

    interpret = jax.devices()[0].platform != "tpu"
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=interpret,
    )(*inputs)
    if out_alloc != out_len:
        out = jax.lax.slice_in_dim(out, 0, out_len, axis=axis)
    return out


_VJP_CACHE: dict = {}


def pallas_upfirdn2d(x, f: np.ndarray, up, down, padding, flip_filter, gain):
    """Differentiable Pallas upfirdn2d (None if not expressible).

    The VJP is analytic: the adjoint of upfirdn2d is upfirdn2d with swapped
    up/down, mirrored padding, and flipped filter (reference
    torch_utils/ops/upfirdn2d.py:252-270).
    """
    from .fir import _separate_2d

    f_arr = np.asarray(f, np.float64)
    if f_arr.ndim == 2:
        fc = f_arr if flip_filter else f_arr[::-1, ::-1]
        if _separate_2d(fc * gain) is None:
            return None

    key = (f_arr.tobytes(), f_arr.shape, up, down, padding, flip_filter,
           float(gain))
    if key not in _VJP_CACHE:
        upx, upy = up
        downx, downy = down
        px0, px1, py0, py1 = padding
        fw = f_arr.shape[-1]
        fh = f_arr.shape[0] if f_arr.ndim == 2 else f_arr.shape[-1]

        @jax.custom_vjp
        def op(x):
            return fir_resample_pallas(x, f_arr, up, down, padding,
                                       flip_filter, gain)

        def fwd(x):
            return op(x), (x.shape,)

        def bwd(res, dy):
            (x_shape,) = res
            ih, iw = x_shape[1], x_shape[2]
            oh, ow = dy.shape[1], dy.shape[2]
            p = (fw - px0 - 1,
                 iw * upx - ow * downx + px0 - upx + 1,
                 fh - py0 - 1,
                 ih * upy - oh * downy + py0 - upy + 1)
            dx = fir_resample_pallas(dy, f_arr, (downx, downy), (upx, upy),
                                     p, not flip_filter, gain)
            return (dx,)

        op.defvjp(fwd, bwd)
        _VJP_CACHE[key] = op
    return _VJP_CACHE[key](x)


def fir_resample_pallas(
    x: jax.Array,
    f: np.ndarray,
    up: Tuple[int, int],
    down: Tuple[int, int],
    padding: Tuple[int, int, int, int],
    flip_filter: bool,
    gain: float,
) -> Optional[jax.Array]:
    """NHWC upfirdn2d via the Pallas kernel. None → caller falls back."""
    from .fir import _separate_2d

    upx, upy = up
    downx, downy = down
    px0, px1, py0, py1 = padding
    f = np.asarray(f, np.float64)

    def run(x, taps, axis, u, d, p0, p1):
        return _fir_pallas_axis(
            x, taps_tuple=tuple(float(t) for t in taps), axis=axis, up=u,
            down=d, pad0=p0, pad1=p1)

    if f.ndim == 1:
        fc = f if flip_filter else f[::-1]
        fc = fc * (gain ** 0.5)
        x = run(x, fc, 2, upx, downx, px0, px1)
        x = run(x, fc, 1, upy, downy, py0, py1)
        return x

    fc = f if flip_filter else f[::-1, ::-1]
    terms = _separate_2d(fc * gain)
    if terms is None:
        return None
    out = None
    for col_taps, row_taps in terms:
        y = run(x, row_taps, 2, upx, downx, px0, px1)
        y = run(y, col_taps, 1, upy, downy, py0, py1)
        out = y if out is None else out + y
    return out
