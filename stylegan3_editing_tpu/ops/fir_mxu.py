"""Block-banded MXU formulation of upfirdn2d — the TPU fast path.

The reference implements pad→zero-upsample→FIR→downsample as a CUDA kernel
(/root/reference/torch_utils/ops/upfirdn2d.cu); a direct XLA depthwise conv
lowers to VPU code that runs ~10× off memory-bound, and TPU VPU FLOPs are a
small fraction of MXU FLOPs. This module instead expresses each 1-D polyphase
FIR pass as *dense matmuls against small block-banded constants*:

  Out[t·T + o] = Σ_λ B[λ, o] · x[T·step + base0 + λ],   step = t·down/up

Because up | t·down, the in-tile index λ(o, j) = (o·down + j − pad0)/up − base0
is tile-independent: every output tile multiplies the SAME [tile_in, t]
banded matrix against a sliding input window. The window (tile_in = step +
O(taps)) is decomposed into ≤2 step-aligned chunks, so the input is consumed
via *zero-copy reshapes* ([L] → [nT, step]) plus one small spill slice — no
im2col duplication, no gather. Each pass is one main GEMM (contraction dim =
step) plus one sliver GEMM, both on the MXU; the banded matrices are
trace-time numpy constants and the einsum transpose rule makes the backward
pass another banded matmul — fully differentiable, no custom kernels.

2-D (radial jinc) filters decompose exactly into ≤4 separable rank-1 terms
(SVD, see fir._separate_2d); all ranks run as ONE pass pair: the H pass emits
a rank dim, the W pass contracts (rank, window) jointly.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=None)
def _banded_plan(fc_bytes: bytes, ntaps: int, up: int, down: int, pad0: int,
                 tile: int):
    """Static plan: banded matrix B [tile_in, tile], base offset, tile step.

    B[λ, o] = fc[j] where λ = (o·down + j − pad0)/up − base0 for the (o, j)
    pairs with up | (o·down + j − pad0). Requires up | tile·down.
    """
    fc = np.frombuffer(fc_bytes, np.float64)
    assert (tile * down) % up == 0
    entries = {}
    for o in range(tile):
        for j in range(ntaps):
            m = o * down + j - pad0
            if m % up == 0:
                entries[(m // up, o)] = fc[j]
    if not entries:  # degenerate (fully cropped); keep a zero matrix
        entries[(0, 0)] = 0.0
    lams = [k[0] for k in entries]
    base0 = min(lams)
    tile_in = max(lams) - base0 + 1
    B = np.zeros((tile_in, tile), np.float64)
    for (lam, o), v in entries.items():
        B[lam - base0, o] = v
    step = tile * down // up
    return B, base0, tile_in, step


def _pick_tile(up: int, down: int, tile: int) -> int:
    """Smallest t ≥ tile with up | t·down (t·down/up is the tile step)."""
    t = tile
    while (t * down) % up:
        t += 1
    return t


def _precision(dtype):
    return lax.Precision.HIGHEST if dtype == jnp.float32 else lax.Precision.DEFAULT


def _plan_all(taps_2d: np.ndarray, up: int, down: int, pad0: int, tile: int):
    """Banded plans for each rank row of taps_2d (identical geometry)."""
    Bs, base0, tile_in, step = [], None, None, None
    for r in range(taps_2d.shape[0]):
        B, base0, tile_in, step = _banded_plan(
            np.ascontiguousarray(np.asarray(taps_2d[r], np.float64)).tobytes(),
            int(taps_2d.shape[1]), up, down, pad0, tile)
        Bs.append(B)
    return np.stack(Bs), base0, tile_in, step  # [R, tile_in, t]


# einsum specs keyed by (rank_mode, spatial axis). `s` is the chunk-local
# window index, `o` the in-tile output index, `r` the SVD rank.
_EINSUM = {
    ("none", 2): ("nhtsc,so->nhtoc", 2),
    ("none", 1): ("ntswc,so->ntowc", 1),
    ("emit", 1): ("ntswc,sro->nrtowc", 2),   # out [N, R, nT·t, W, C]
    ("emit", 2): ("nhtsc,sro->nrhtoc", 3),   # out [N, R, H, nT·t, C]
    ("contract", 1): ("nrtswc,rso->ntowc", 1),
    ("contract", 2): ("nrhtsc,rso->nhtoc", 2),
}


def _fir_pass(x: jax.Array, taps: np.ndarray, axis: int, up: int, down: int,
              pad0: int, pad1: int, tile: int, rank_mode: str) -> jax.Array:
    """One banded-GEMM FIR pass along spatial `axis` (1=H, 2=W of NHWC).

    rank_mode: 'none' (x NHWC, taps [ntaps]), 'emit' (x NHWC, taps
    [R, ntaps], output gains a rank dim at 1), 'contract' (x [N, R, ...],
    taps [R, ntaps], contracts rank jointly with the window).
    """
    taps = np.atleast_2d(np.asarray(taps, np.float64))  # [R, ntaps]
    ntaps = taps.shape[1]
    ax = axis + (1 if rank_mode == "contract" else 0)  # position in x
    length = x.shape[ax]
    out_len = (length * up + pad0 + pad1 - ntaps) // down + 1
    assert out_len > 0, (length, up, down, pad0, pad1, ntaps)
    t = _pick_tile(up, down, tile)
    nT = -(-out_len // t)

    Bs, base0, tile_in, step = _plan_all(taps, up, down, pad0, t)

    padL = max(0, -base0)
    start0 = base0 + padL
    n_chunks = -(-tile_in // step)
    need = start0 + (n_chunks - 1) * step + nT * step
    padR = max(0, need - (length + padL))
    if padL or padR:
        cfg = [(0, 0)] * x.ndim
        cfg[ax] = (padL, padR)
        x = jnp.pad(x, cfg)

    dtype = x.dtype
    prec = _precision(dtype)
    spec, out_axis = _EINSUM[(rank_mode, axis)]

    out = None
    for k in range(n_chunks):
        sk = min(step, tile_in - k * step)
        xk = lax.slice_in_dim(x, start0 + k * step,
                              start0 + k * step + nT * step, axis=ax)
        shape = list(xk.shape)
        shape[ax:ax + 1] = [nT, step]
        xk = xk.reshape(shape)
        if sk < step:
            xk = lax.slice_in_dim(xk, 0, sk, axis=ax + 1)
        Bk = Bs[:, k * step:k * step + sk]  # [R, sk, t]
        if rank_mode == "none":
            Bj = jnp.asarray(Bk[0], dtype)
        elif rank_mode == "emit":
            Bj = jnp.asarray(np.transpose(Bk, (1, 0, 2)), dtype)  # [sk, R, t]
        else:
            Bj = jnp.asarray(Bk, dtype)  # [R, sk, t]
        y = jnp.einsum(spec, xk, Bj, precision=prec,
                       preferred_element_type=jnp.float32)
        out = y if out is None else out + y

    out = out.astype(dtype)
    # Merge (nT, t) back into the spatial axis and trim to out_len.
    shape = list(out.shape)
    shape[out_axis:out_axis + 2] = [nT * t]
    out = out.reshape(shape)
    return lax.slice_in_dim(out, 0, out_len, axis=out_axis)


def fir_resample_mxu(
    x: jax.Array,
    f: np.ndarray,
    up: Tuple[int, int],
    down: Tuple[int, int],
    padding: Tuple[int, int, int, int],
    flip_filter: bool,
    gain: float,
    tile: int = 128,
) -> Optional[jax.Array]:
    """NHWC upfirdn2d via block-banded MXU matmuls. None → caller falls back.

    Separable 1-D filters run as two passes (√gain each). Radial 2-D filters
    SVD-separate into ≤4 rank-1 terms executed as ONE rank-stacked pass pair
    (H emits the rank dim, W contracts it) — two GEMM chains instead of 2·R
    passes over the upsampled grid.
    """
    from .fir import _separate_2d

    upx, upy = up
    downx, downy = down
    px0, px1, py0, py1 = padding
    f = np.asarray(f, np.float64)

    if f.ndim == 1:
        fc = f if flip_filter else f[::-1]
        fc = fc * (gain ** 0.5)
        x = _fir_pass(x, fc, 2, upx, downx, px0, px1, tile, "none")
        x = _fir_pass(x, fc, 1, upy, downy, py0, py1, tile, "none")
        return x

    fc = f if flip_filter else f[::-1, ::-1]
    terms = _separate_2d(fc * gain)
    if terms is None:
        return None
    # Per-rank sequential (W first — it shrinks the grid before the H pass
    # when down>1): rank-stacked variants materialize an R× intermediate
    # that blows HBM at 2k² grids.
    out = None
    for col_taps, row_taps in terms:
        y = _fir_pass(x, row_taps, 2, upx, downx, px0, px1, tile, "none")
        y = _fir_pass(y, col_taps, 1, upy, downy, py0, py1, tile, "none")
        out = y if out is None else out + y
    return out
