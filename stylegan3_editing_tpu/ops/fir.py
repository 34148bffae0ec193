"""Polyphase shift-and-add FIR resampling — the TPU fast path of upfirdn2d.

XLA lowers depthwise convolutions poorly on TPU (measured 28× off
memory-bound for the strided 12-tap down-filter of SG3's hot layers). This
module re-expresses pad→zero-upsample→FIR→downsample as a *polyphase
shift-and-add*: per output phase, a handful of slices scaled by scalar taps
and summed — pure elementwise VPU work that XLA fuses into one memory-bound
kernel (measured ≥10× faster than `lax.conv_general_dilated` on v5e).

Math: with upsampling u, downsampling d, left pad p0 and correlation taps
fc (already flipped for convolution), output index o satisfies
    z[o] = Σ_j fc[j] · x[(o·d + j − p0)/u]   where u | (o·d + j − p0).
Let g = gcd(u, d) and P = u/g. For each phase r = o mod P:
    j ≡ (p0 − r·d) (mod u), taps fc_r = fc[j0_r::u],
    z[P·q + r] = Σ_t fc_r[t] · x[q·(d/g) + c_r + t],
so each phase is a stride-(d/g) sliding dot product — strides are removed by
reshaping the input axis into (d/g) sub-phases, leaving only contiguous
slices.

2-D (radial) filters decompose exactly via SVD into a few separable
rank-1 terms (the alias-free jinc·Kaiser filters have numerical rank ≤ 4),
each running as two 1-D passes.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Maximum relative SVD reconstruction error for exact-rank separation.
_SVD_TOL = 1e-6


def _resample_1d(x: jax.Array, taps, axis: int, up: int,
                 down: int, pad0: int, pad1: int) -> jax.Array:
    """1-D polyphase FIR resample along `axis`.

    `taps` = correlation taps (flipped filter): numpy (constants) or a
    traced 1-D array (static length; coefficients stay symbolic).
    """
    length = x.shape[axis]
    ntaps = int(taps.shape[0])
    out_len = (length * up + pad0 + pad1 - ntaps) // down + 1
    assert out_len > 0

    g = math.gcd(up, down)
    num_phases = up // g
    stride = down // g

    # Per-phase taps/offsets.
    phases = []
    min_c = 0
    for r in range(num_phases):
        j0 = (pad0 - r * down) % up
        taps_r = taps[j0::up]
        c_r = (r * down + j0 - pad0) // up
        q_r = (out_len - r + num_phases - 1) // num_phases  # outputs in phase
        phases.append((taps_r, c_r, q_r))
        min_c = min(min_c, c_r)

    # Pad the axis so every slice index is valid.
    left = -min_c
    max_idx = max((q - 1) * stride + c + len(t) - 1
                  for (t, c, q) in phases)
    right = max(0, max_idx + left - (length - 1))
    pad_cfg = [(0, 0)] * x.ndim
    pad_cfg[axis] = (left, right)
    xp = jnp.pad(x, pad_cfg) if (left or right) else x
    padded_len = xp.shape[axis]

    def take(start: int, count: int, step: int) -> jax.Array:
        if step == 1:
            return jax.lax.slice_in_dim(xp, start, start + count, axis=axis)
        # Remove the stride by splitting the axis into `step` sub-phases.
        usable = (padded_len // step) * step
        base = jax.lax.slice_in_dim(xp, 0, usable, axis=axis)
        shape = list(base.shape)
        shape[axis:axis + 1] = [usable // step, step]
        grouped = base.reshape(shape)
        sub = start % step
        off = start // step
        picked = jax.lax.index_in_dim(grouped, sub, axis=axis + 1,
                                      keepdims=False)
        return jax.lax.slice_in_dim(picked, off, off + count, axis=axis)

    outs = []
    for (taps_r, c_r, q_r) in phases:
        if q_r == 0:
            outs.append(None)
            continue
        acc = None
        for t in range(int(taps_r.shape[0])):
            coeff = (jnp.asarray(taps_r[t], x.dtype)
                     if isinstance(taps_r, np.ndarray)
                     else taps_r[t].astype(x.dtype))
            sl = take(c_r + left + t, q_r, stride)
            term = sl * coeff
            acc = term if acc is None else acc + term
        if acc is None:  # zero taps in this phase (can happen with crops)
            shape = list(x.shape)
            shape[axis] = q_r
            acc = jnp.zeros(shape, x.dtype)
        outs.append(acc)

    if num_phases == 1:
        return outs[0]

    # Interleave phases along the axis: pad ragged phases, stack, reshape.
    q_max = max(o.shape[axis] for o in outs if o is not None)
    fixed = []
    for o in outs:
        if o is None or o.shape[axis] < q_max:
            shape = list(x.shape)
            shape[axis] = q_max - (0 if o is None else o.shape[axis])
            filler = jnp.zeros(shape, x.dtype)
            o = filler if o is None else jnp.concatenate([o, filler], axis=axis)
        fixed.append(o)
    stacked = jnp.stack(fixed, axis=axis + 1)  # [..., q_max, P, ...]
    shape = list(x.shape)
    shape[axis] = q_max * num_phases
    merged = stacked.reshape(shape)
    return jax.lax.slice_in_dim(merged, 0, out_len, axis=axis)


def fir_resample_traced_1d(
    x: jax.Array,
    f: jax.Array,
    up: Tuple[int, int],
    down: Tuple[int, int],
    padding: Tuple[int, int, int, int],
    flip_filter: bool,
    gain: float,
) -> jax.Array:
    """Separable fast path with TRACED coefficients (e.g. checkpoint-loaded
    filter buffers): phase structure is static, tap values stay symbolic."""
    upx, upy = up
    downx, downy = down
    px0, px1, py0, py1 = padding
    fc = f if flip_filter else jnp.flip(f, axis=0)
    fc = fc * (gain ** 0.5)
    x = _resample_1d(x, fc, axis=2, up=upx, down=downx, pad0=px0, pad1=px1)
    x = _resample_1d(x, fc, axis=1, up=upy, down=downy, pad0=py0, pad1=py1)
    return x


def _separate_2d(f: np.ndarray) -> Optional[list]:
    """Exact separable decomposition of a 2-D filter: [(col_taps, row_taps)].

    Returns None when the filter isn't numerically low-rank (tol 1e-6)."""
    u, s, vt = np.linalg.svd(f.astype(np.float64))
    smax = s[0] if s.size else 0.0
    if smax == 0:
        return [(np.zeros(f.shape[0]), np.zeros(f.shape[1]))]
    rank = int(np.sum(s > _SVD_TOL * smax))
    approx = (u[:, :rank] * s[:rank]) @ vt[:rank]
    if np.abs(approx - f).max() > 10 * _SVD_TOL * np.abs(f).max():
        return None
    return [((u[:, r] * s[r]).astype(np.float64), vt[r].astype(np.float64))
            for r in range(rank)]


def fir_resample_2d(
    x: jax.Array,
    f: np.ndarray,
    up: Tuple[int, int],
    down: Tuple[int, int],
    padding: Tuple[int, int, int, int],
    flip_filter: bool,
    gain: float,
) -> Optional[jax.Array]:
    """NHWC upfirdn2d via polyphase shift-and-add.

    `f`: numpy filter (1-D separable or 2-D). Returns None when this fast
    path cannot express the filter (caller falls back to the conv path).
    """
    upx, upy = up
    downx, downy = down
    px0, px1, py0, py1 = padding
    f = np.asarray(f, np.float64)

    if f.ndim == 1:
        fc = f if flip_filter else f[::-1]
        fx = fc * (gain ** 0.5)
        fy = fc * (gain ** 0.5)
        x = _resample_1d(x, fx, axis=2, up=upx, down=downx, pad0=px0, pad1=px1)
        x = _resample_1d(x, fy, axis=1, up=upy, down=downy, pad0=py0, pad1=py1)
        return x

    # 2-D: exact separable decomposition (radial alias-free filters are
    # numerically rank ≤ 4).
    fc = f if flip_filter else f[::-1, ::-1]
    terms = _separate_2d(fc * gain)
    if terms is None:
        return None
    out = None
    for col_taps, row_taps in terms:
        y = _resample_1d(x, row_taps, axis=2, up=upx, down=downx,
                         pad0=px0, pad1=px1)
        y = _resample_1d(y, col_taps, axis=1, up=upy, down=downy,
                         pad0=py0, pad1=py1)
        out = y if out is None else out + y
    return out
