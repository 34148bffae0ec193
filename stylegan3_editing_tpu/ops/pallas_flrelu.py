"""Fused filtered leaky-ReLU as ONE Pallas TPU kernel per layer.

TPU counterpart of the reference's fused CUDA kernel
(/root/reference/torch_utils/ops/filtered_lrelu.cu:139-153): the whole
bias → up-FIR → leaky-ReLU·gain → clamp → down-FIR chain runs per output
tile inside VMEM — the ×u up-sampled intermediate grid (the HBM killer of
the composed path: ~2100² activations for SG3-R's top 1024² layers) is
never materialized off-chip. One HBM read of the input tile (+halo), one
HBM write of the output tile.

Design (TPU-first, not a CUDA translation):
- **Phase-plane polyphase**: the up-sampled grid is held as u×u separate
  phase planes (up-grid index y = q·u + p ↦ plane p, row q). Up-FIR writes
  planes contiguously; the stride-2 down-FIR *reads* planes contiguously
  (output m ↦ plane (2m+t) mod u, offset (2m+t)//u). No strided VMEM access
  anywhere; the only interleave is a final stack+reshape for u=4.
- **Radial down-filters** (SG3-R's jinc) enter as their exact rank-≤4 SVD
  separation (ops/fir._separate_2d); ranks accumulate into the output
  planes inside the kernel.
- Grid over (N, H-tiles, W-tiles, C-blocks); halo'd input tiles are DMA'd
  manually from an ANY-space ref (BlockSpecs cannot overlap). All index
  arithmetic is static per instance; tile starts are affine in the grid
  indices.
- fp32 tap arithmetic regardless of input dtype (parity with the reference
  kernel's internal fp32 accumulation).

Differentiation: the kernel itself is forward-only; `ops.filtered_lrelu`
wraps it in a custom VJP whose backward differentiates the composed XLA
path (exact same math). A fully fused backward kernel (same phase-plane
shape with up/down roles swapped, pre-activation recomputed per tile in
VMEM) is the natural next optimization.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------- host plans


class _AxisPlan:
    """Static per-axis plan for up-FIR phase planes + stride-2 down-FIR.

    Correlation convention: taps already flipped & gain-folded by the caller.
    """

    def __init__(self, length: int, tile: int, fu: np.ndarray, td: int,
                 up: int, pad0: int, pad1: int, align: int = 1):
        self.u = up
        self.tile = tile
        self.length = length
        tu = len(fu)
        # Up-grid (after up-FIR) and output lengths.
        self.len_a = length * up + pad0 + pad1 - tu + 1
        self.len_out = (self.len_a - td) // 2 + 1
        assert self.len_out > 0
        self.n_tiles = -(-self.len_out // tile)
        self.out_pad = self.n_tiles * tile
        # Per-phase taps and input offsets: A[q·u+p] = Σ_j taps[p][j]·x[q+c_p+j]
        self.phase_taps = []
        self.phase_off = []
        for p in range(up):
            s0 = (pad0 - p) % up
            taps = fu[s0::up]
            c_p = (p + s0 - pad0) // up
            self.phase_taps.append(np.asarray(taps, np.float64))
            self.phase_off.append(c_p)
        # Planes per tile: q ∈ [q0, q0+Q), q0 = blk·stride_q.
        ly = 2 * tile + td - 1
        self.q_count = (ly - 1) // up + 1
        self.stride_q = 2 * tile // up
        assert 2 * tile % up == 0, "tile must be a multiple of up/2"
        base_in = min(self.phase_off)
        hi = max(c + len(t) for c, t in zip(self.phase_off, self.phase_taps))
        self.in_tile = self.q_count + hi - base_in - 1
        self.base_in = base_in
        # Host padding so all tile reads hit valid (zero-padded) memory.
        # `align`: DMA slice starts/lengths along this axis must be multiples
        # of the sublane tile (the axon TPU worker faults on unaligned DMA
        # windows) — grow pad_left so tile starts are aligned, round the
        # window length up, and grow pad_right to cover.
        self.pad_left = max(0, -base_in)
        if align > 1:
            self.pad_left += (-(base_in + self.pad_left)) % align
            assert self.stride_q % align == 0, (
                f"tile {tile} gives DMA stride {self.stride_q} not divisible "
                f"by align {align}")
            self.in_tile = -(-self.in_tile // align) * align
        # Last tile's read end (unpadded coords) vs the input length.
        self.pad_right = max(
            0, (self.n_tiles - 1) * self.stride_q + base_in + self.in_tile
            - length)
        # In-kernel window offsets relative to the tile's input start
        # (tile start row = blk·stride_q + base_in + pad_left).
        self.win_off = [c - base_in for c in self.phase_off]

    def tile_start(self, blk):
        return blk * self.stride_q + self.base_in + self.pad_left

    def valid_range(self) -> Tuple[int, int]:
        """[lo, hi) of valid (non-host-padding) rows in padded coords."""
        return self.pad_left, self.pad_left + self.length


def _down_groups(u: int, td: int):
    """Static read plan of the stride-2 down-FIR over u phase planes.

    Returns [(a, plane, offset, tap_index)] for output parity classes
    a ∈ range(u // 2) (1 class for u=2, 2 interleaved classes for u=4).
    """
    classes = max(u // 2, 1)
    plan = []
    for a in range(classes):
        for t in range(td):
            y = 2 * a + t
            plan.append((a, y % u, y // u, t))
    return classes, plan


# ----------------------------------------------------------------- kernel


def _act_lrelu(v, slope: float, gain: float, clamp: Optional[float]):
    # Python-float (weak-typed) constants keep the compute dtype — the
    # kernel runs fp32 by default, bf16 under SG3TPU_FLRELU_BF16=1.
    # For 0 ≤ slope ≤ 1, lrelu is max(v, slope·v): 2 vector ops instead of
    # cmp+mul+select. The fused forward folds gain into the down-FIR taps
    # (linear; clamp bound pre-divided) and passes gain=1 — the act runs on
    # the 4×-sized up grid, so each op saved there counts quadruple.
    s = float(slope)
    if 0.0 <= s <= 1.0 and float(gain) == 1.0:
        v = jnp.maximum(v, v * s)
    else:
        v = jnp.where(v >= 0, v, v * s) * float(gain)
    if clamp is not None:
        v = jnp.clip(v, -float(clamp), float(clamp))
    return v


def _tree_sum(terms):
    """Serial-chain sum of a term list.

    Measured (L11, v5e): the single serial `acc += term` chain (84.2 ms)
    BEATS both a pairwise tree and 2 interleaved accumulator chains (97.3 ms
    each) — the VPU is not add-latency-bound here; extra live accumulators
    only add register pressure. Keep the chain serial.
    """
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return acc


def _ablated(stage: str, axis: int) -> bool:
    """Timing diagnostic: SG3TPU_FLRELU_ABLATE lists pass tokens
    (up/down × h/w, e.g. 'upw,downh') whose tap chains collapse to their
    FIRST term only — identical shapes/geometry, wrong numerics, so the
    measured delta isolates where kernel time actually goes."""
    import os

    tok = ("up" if stage == "up" else "down") + ("h" if axis == 0 else "w")
    return tok in os.environ.get("SG3TPU_FLRELU_ABLATE", "").split(",")


def _up_pass(x, plan: _AxisPlan, axis: int, count: int, phases=None):
    """Phase planes along `axis`: list of u arrays with `count` entries.
    `phases` restricts computation to a subset (others → None)."""
    ablate = _ablated("up", axis)
    planes = []
    for p in range(plan.u):
        if phases is not None and p not in phases:
            planes.append(None)
            continue
        taps = plan.phase_taps[p]
        off = plan.win_off[p]
        terms = []
        for j, tap in enumerate(taps):
            if float(tap) == 0.0:  # compressed-out tap — no FMA
                continue
            idx = [slice(None)] * x.ndim
            idx[axis] = slice(off + j, off + j + count)
            terms.append(x[tuple(idx)] * float(tap))
        if ablate:
            terms = terms[:1]
        if not terms:
            shape = list(x.shape)
            shape[axis] = count
            planes.append(jnp.zeros(shape, x.dtype))
        else:
            planes.append(_tree_sum(terms))
    return planes


def _down_pass(planes, taps: np.ndarray, u: int, axis: int, count: int,
               ref_shape=None):
    """Stride-2 down-FIR over `u` phase planes → list of parity outputs.

    Planes may be None (phase-subset partial kernels): their taps are
    skipped and the caller sums the partials outside."""
    classes, plan = _down_groups(u, len(taps))
    ablate = _ablated("down", axis)
    terms = [[] for _ in range(classes)]
    for a, p, off, t in plan:
        if planes[p] is None or float(taps[t]) == 0.0:
            continue
        idx = [slice(None)] * planes[p].ndim
        idx[axis] = slice(off, off + count)
        terms[a].append(planes[p][tuple(idx)] * float(taps[t]))
    if ablate:
        terms = [ts[:1] for ts in terms]
    outs = [_tree_sum(ts) if ts else None for ts in terms]
    if ref_shape is None and any(o is None for o in outs):
        src = next(p for p in planes if p is not None)
        ref_shape = src.shape
    if ref_shape is not None:
        for a in range(classes):
            if outs[a] is None:
                shape = list(ref_shape)
                shape[axis] = count
                outs[a] = jnp.zeros(shape, jnp.float32)
    return outs


def _truncate_rank_terms(terms, tol: Optional[float] = None):
    """Compress the SVD rank terms of a radial down filter — bf16 only.

    Two moves, both bounded by the SAME relative-error budget tol·σ₀
    (Frobenius; σ₀ ≈ ‖fd‖_F):
      (a) drop whole rank terms with σ_r ≤ tol·σ₀;
      (b) zero tap-TAIL entries of the surviving 1-D factors while the
          accumulated RSS error stays ≤ tol·σ₀ — the chains skip
          zero taps, so every zeroed tap is one vector FMA saved with NO
          geometry change (offsets/pads untouched).

    Ablation on the chip located ~60-75% of hot-layer kernel time in the
    down-pass FMA chains (L11: down-W 48 ms + down-H 37 ms of 77.6 total),
    so rank × taps is THE lever. At the default tol 3e-3 the SG3-R radial
    layers go rank 4→2 (L8/L11) / 3→2 / 2→1 (L5) with filter error
    ≤ 3.0e-3 relative — at bf16's own ~4e-3 resolution, on layers already
    storing activations in bf16. fp32 layers keep the 1e-6-exact
    separation (reference parity 3.7e-7). SG3TPU_FD_RANK_TOL=0 disables.
    ‖col_r‖₂ = σ_r, ‖row_r‖₂ = 1 by construction (fir._separate_2d).
    """
    import os

    if tol is None:
        tol = float(os.environ.get("SG3TPU_FD_RANK_TOL", "3e-3"))
    if tol <= 0:
        return terms
    sigmas = [float(np.linalg.norm(col)) for col, _ in terms]
    keep = [t for t, s in zip(terms, sigmas) if s > tol * sigmas[0]]
    if not keep:
        keep = terms[:1]
    # (b) zero the smallest-contribution tap entries, tails inward, while
    # the total RSS (ranks dropped in (a) are far below tol·σ₀ and are
    # ignored here) stays within budget. Zeroing col_r[t] perturbs fd by
    # |col_r[t]|·‖row_r‖ = |col_r[t]|; zeroing row_r[t] by σ_r·|row_r[t]|.
    budget = (tol * sigmas[0]) ** 2
    spent = 0.0
    cand = []  # (err², rank_index, which_factor, tap_index)
    for r, (col, row) in enumerate(keep):
        s_r = float(np.linalg.norm(col))
        for t in range(len(col)):
            cand.append((float(col[t]) ** 2, r, 0, t))
        for t in range(len(row)):
            cand.append((s_r * float(row[t]) ** 2 * s_r, r, 1, t))
    keep = [(col.copy(), row.copy()) for col, row in keep]
    for err2, r, which, t in sorted(cand):
        if err2 == 0.0 or spent + err2 > budget:
            continue
        spent += err2
        keep[r][which][t] = 0.0
    return keep


def _truncate_taps_1d(taps: np.ndarray, tol: Optional[float] = None
                      ) -> np.ndarray:
    """Zero negligible 1-D up-filter taps — bf16 layers only.

    Same bounded-RSS policy as the radial-fd rank/tap truncation
    (`_truncate_rank_terms` move (b)): zero the smallest-|tap| entries while
    the accumulated RSS error stays ≤ tol·‖taps‖₂. The FMA chains skip
    zero taps, so each zeroed tap saves one vector FMA on the up grid with
    NO geometry change. At the default 3e-3 the SG3-R 12-tap Kaiser designs
    lose their 2 outermost taps (|tap| ≈ 1.4-2.0e-3 relative — below
    bf16's own ~4e-3 resolution); the ×4 24-tap designs lose 0-4.
    SG3TPU_FU_TAP_TOL=0 disables.
    """
    import os

    if tol is None:
        tol = float(os.environ.get("SG3TPU_FU_TAP_TOL", "3e-3"))
    if tol <= 0:
        return taps
    norm = float(np.linalg.norm(taps))
    budget = (tol * norm) ** 2
    out = np.asarray(taps, np.float64).copy()
    spent = 0.0
    for i in np.argsort(np.abs(out)):
        err2 = float(out[i]) ** 2
        if err2 == 0.0 or spent + err2 > budget:
            continue
        spent += err2
        out[i] = 0.0
    return out


def _auto_down_mode(up: int, h: Optional[int] = None,
                    c: Optional[int] = None) -> Tuple[str, Optional[int]]:
    """Measured per-geometry down-engine choice → (mode, tile_budget_MB).

    `c` is the post-fold n·C the kernel actually sees on its lane axis
    (the batch→lane fold merges n into c; for unfolded inputs the caller
    multiplies n·C itself so the gates below see the same quantity either
    way). `h` is the input height, fold-invariant.

    Round-4 rule (BASELINE.md round-4 table): the banded per-plane MXU
    down-pass beats the VPU FMA chains on every up=2 geometry measured
    (L11 84.2→38.5 ms, L12 24.0→18.6, L13 22.9→18.0 at batch 2) but loses
    on up=4 — the ×4 polyphase read plan splits into R·classes·u tiny dots.

    Round-5 refinements (BASELINE.md round-5 shared-engine shootout, batch
    2/8 clean matrices on the v5e chip) — the PHASE-SHARED engine
    (`mxu_shared`, one dot per stage) wins on exactly these SG3-R flagship
    geometries and is adopted for them; keys are the post-lane-fold shapes
    the dispatch actually sees (h is fold-invariant; c folds to n·C):

    - L11 (up=2, in 1044², C=102): shared 123.3 vs per-plane 131.4 ms at
      batch 8 (replicated ×2), tie at batch 2 (38.16 vs 38.50) — adopted
      at every batch.
    - L9 (up=4, in 276², C=256, never folds): shared 103.6 vs VPU 121.1 ms
      at batch 8, 30.86 vs 34.30 at batch 2 — adopted at batch ≥ 2
      (batch 1 unmeasured, stays vpu).
    - L10 (up=4, in 532², C=161): shared at an 18 MB tile budget 250.4/
      250.7 vs 253.9 VPU at batch 8 (replicated ×2); at batch ≤4 every
      engine loses to VPU (b1 52.6 vs 51.2, b4 146.4 vs 141.6) — adopted
      only at folded batch ≥ 8 (c ≥ 8·161).

    Everything else keeps the round-4 rule. CPU/interpret keeps the VPU
    path (no MXU to ride; simpler interpreted kernel).
    """
    if jax.default_backend() != "tpu":
        return "vpu", None
    if up == 2:
        if h == 1044 and c is not None and c % 102 == 0:
            return "mxu_shared", None  # L11 geometry
        return "mxu", None
    if up == 4 and h == 276 and c is not None and c % 256 == 0 \
            and c >= 2 * 256:
        return "mxu_shared", None  # L9 geometry at batch ≥ 2
    if up == 4 and h == 532 and c is not None and c % 161 == 0 \
            and c >= 8 * 161:
        return "mxu_shared", 18  # L10 geometry at the bench batch
    return "vpu", None


def _down_matrices(terms, u: int, classes: int, count: int, q_count: int,
                   which: int) -> np.ndarray:
    """Banded matrices for the MXU down-pass (SG3TPU_FLRELU_DOWN=mxu).

    One [count, q_count] matrix per (rank, parity class, phase plane),
    flattened to [R·classes·u, count, q_count] — index (r·classes+a)·u+p.
    M[j, q] = taps[t] where the stride-2 polyphase read plan
    (`_down_groups`) maps output j of class a to plane p, row q = y//u + j,
    y = 2a + t. The whole banded structure lives in the matrix, so the
    kernel contracts each phase plane's row axis with ONE `dot_general`
    (rides the MXU) instead of a `taps`-long VPU FMA chain.
    `which`: 0 = col taps (H stage), 1 = row taps (W stage).
    """
    mats = np.zeros((len(terms) * classes * u, count, q_count), np.float32)
    for r, term in enumerate(terms):
        taps = term[which]
        for a in range(classes):
            for t in range(len(taps)):
                v = float(taps[t])
                if v == 0.0:
                    continue
                y = 2 * a + t
                p, off = y % u, y // u
                idx = (r * classes + a) * u + p
                for j in range(count):
                    q = off + j
                    if q < q_count:
                        mats[idx, j, q] += v
    return mats


def _down_matrices_shared_w(terms, u: int, classes: int, count: int,
                            q_count: int, phases) -> np.ndarray:
    """W-stage matrix of the PHASE-SHARED MXU down-pass
    (SG3TPU_FLRELU_DOWN=mxu_shared).

    The round-4 per-plane banding (`_down_matrices`) loses on u=4: the
    4-phase read plan splits the work into R·classes·u tiny dots whose
    contraction dim is one plane's q_count (~27 rows) — ~2% MXU
    utilization. Here the ACTIVE phase planes are concatenated along the
    contraction axis (plane-major: column p_i·q_count + q) and the
    (rank, parity-class) pairs stack into the output rows
    (row (r·classes + a)·count + j), so the whole W down-stage per H-plane
    is ONE [R·classes·count, P·q_count] dot — u=2-sized operands, the
    regime where banding measured 1.37-1.59× wins.
    """
    pos = {p: i for i, p in enumerate(phases)}
    m = np.zeros((len(terms) * classes * count, len(phases) * q_count),
                 np.float32)
    for r, term in enumerate(terms):
        taps = term[1]
        for a in range(classes):
            for t in range(len(taps)):
                v = float(taps[t])
                if v == 0.0:
                    continue
                y = 2 * a + t
                p, off = y % u, y // u
                if p not in pos:
                    continue  # inactive plane: the other split half owns it
                for j in range(count):
                    q = off + j
                    if q < q_count:
                        m[(r * classes + a) * count + j,
                          pos[p] * q_count + q] += v
    return m


def _down_matrices_shared_h(terms, u: int, classes: int, count: int,
                            q_count: int, phases) -> np.ndarray:
    """H-stage matrix of the phase-shared MXU down-pass: ranks move into
    the CONTRACTION dim (the rank sum Σ_r col_r⊗row_r happens inside the
    dot) alongside the H phase planes — column (r·P + p_i)·q_count + q,
    blocks (rank, phase)-major — while only the H parity classes stack
    into the output rows (row a·count + j). One [classes·count,
    R·P·q_count] dot per W parity class finishes the whole down pass."""
    pos = {p: i for i, p in enumerate(phases)}
    n_p = len(phases)
    m = np.zeros((classes * count, len(terms) * n_p * q_count), np.float32)
    for r, term in enumerate(terms):
        taps = term[0]
        for a in range(classes):
            for t in range(len(taps)):
                v = float(taps[t])
                if v == 0.0:
                    continue
                y = 2 * a + t
                p, off = y % u, y // u
                if p not in pos:
                    continue
                for j in range(count):
                    q = off + j
                    if q < q_count:
                        m[a * count + j,
                          (r * n_p + pos[p]) * q_count + q] += v
    return m


def _up_matrices(plan: "_AxisPlan", in_len: int) -> np.ndarray:
    """Banded matrices for the MXU up-pass (SG3TPU_FLRELU_UP=mxu): one
    [q_count, in_len] matrix per phase plane — plane_p[q] = Σ_j
    taps_p[j]·x[win_off_p + j + q], so M_p[q, i] = taps_p[j] at
    i = win_off_p + j + q. Contracting x's axis with dot_general moves the
    up-sampled axis to the FRONT: W-up [Qw, ih, C] then H-up [Qh, Qw, C] —
    exactly the plane layout the act/down stages expect."""
    mats = np.zeros((plan.u, plan.q_count, in_len), np.float32)
    for p in range(plan.u):
        taps = plan.phase_taps[p]
        off = plan.win_off[p]
        for j, tap in enumerate(taps):
            v = float(tap)
            if v == 0.0:
                continue
            for q in range(plan.q_count):
                i = off + j + q
                if i < in_len:
                    mats[p, q, i] += v
    return mats


def _up_dot(x, m_ref, u: int, phases, prec, cast_dtype):
    """MXU up-pass: per phase, one dot contracting x's axis 1."""
    planes = []
    for p in range(u):
        if phases is not None and p not in phases:
            planes.append(None)
            continue
        m = m_ref[p]
        xx = x
        if cast_dtype is not None:
            m = m.astype(cast_dtype)
            xx = xx.astype(cast_dtype)
        planes.append(lax.dot_general(m, xx, (((1,), (1,)), ((), ())),
                                      precision=prec,
                                      preferred_element_type=jnp.float32))
    return planes


def _down_dot(planes, mat_of, u: int, classes: int, prec, cast_dtype):
    """MXU down stage: per parity class, Σ_p M[a,p] · planes[p].

    planes[p]: [L, Q, C] with the contraction axis in the MIDDLE (axis 1);
    dot_general (((1,), (1,)), ((), ())) yields [count, L, C] — the downed
    axis moves to the FRONT, so chaining W then H stages lands the output
    tile in [TM, TW, C] order directly.
    """
    outs = []
    for a in range(classes):
        acc = None
        for p in range(u):
            if planes[p] is None:
                continue
            m = mat_of(a, p)
            x = planes[p]
            if cast_dtype is not None:
                m = m.astype(cast_dtype)
                x = x.astype(cast_dtype)
            d = lax.dot_general(m, x, (((1,), (1,)), ((), ())),
                                precision=prec,
                                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        outs.append(acc)
    return outs


def _interleave(parts, axis: int):
    """Interleave parity-class arrays along `axis` (stack + reshape)."""
    if len(parts) == 1:
        return parts[0]
    stacked = jnp.stack(parts, axis=axis + 1)
    shape = list(parts[0].shape)
    shape[axis] *= len(parts)
    return stacked.reshape(shape)


def _decode_step(k, dims):
    """1-D grid step → (n, hb, wb, cb). C-blocks innermost."""
    _, nh, nw, nc = dims
    cb = k % nc
    r = k // nc
    wb = r % nw
    r = r // nw
    hb = r % nh
    n = r // nh
    return n, hb, wb, cb


def _flrelu_kernel_extra(x_ref, b_ref, *rest, extra_names, **kw):
    """Operand-order shim: MXU up/down variants take their banded matrices
    as extra VMEM inputs, keyed by `extra_names` order."""
    n = len(extra_names)
    refs = dict(zip(extra_names, rest[:n]))
    o_ref, xt, sem = rest[n], rest[n + 1], rest[n + 2]
    _flrelu_kernel(x_ref, b_ref, o_ref, xt, sem,
                   mw_ref=refs.get("mw"), mh_ref=refs.get("mh"),
                   msw_ref=refs.get("msw"), msh_ref=refs.get("msh"),
                   uw_ref=refs.get("uw"), uh_ref=refs.get("uh"), **kw)


def _flrelu_kernel(x_ref, b_ref, o_ref, xt, sem, *, plan_h, plan_w,
                   terms, slope, gain, clamp, u, dims,
                   compute_dtype=jnp.float32, w_phases=None,
                   mw_ref=None, mh_ref=None, msw_ref=None, msh_ref=None,
                   uw_ref=None, uh_ref=None,
                   mxu_prec=None, mxu_cast=None):
    """One output tile per 1-D grid step, with double-buffered input DMA:
    step k waits on the tile prefetched at step k-1 and starts step k+1's
    transfer before computing (guide pattern 'Double Buffering')."""
    k = pl.program_id(0)
    total = pl.num_programs(0)
    tc = xt.shape[-1]

    def start_dma(step, slot):
        n, hb, wb, cb = _decode_step(step, dims)
        return pltpu.make_async_copy(
            x_ref.at[n, pl.ds(plan_h.tile_start(hb), plan_h.in_tile),
                     pl.ds(plan_w.tile_start(wb), plan_w.in_tile),
                     pl.ds(cb * tc, tc)],
            xt.at[slot], sem.at[slot])

    slot = k % 2

    @pl.when(k == 0)
    def _():
        start_dma(k, slot).start()

    @pl.when(k + 1 < total)
    def _():
        start_dma(k + 1, (k + 1) % 2).start()

    start_dma(k, slot).wait()

    n, hb, wb, cb = _decode_step(k, dims)
    h0 = plan_h.tile_start(hb)
    w0 = plan_w.tile_start(wb)

    # Bias lands only on REAL input pixels: the host zero-padding must stay
    # zero (the composition pads after the bias add).
    ih, iw = plan_h.in_tile, plan_w.in_tile
    vlo_h, vhi_h = plan_h.valid_range()
    vlo_w, vhi_w = plan_w.valid_range()
    rows = jax.lax.broadcasted_iota(jnp.int32, (ih, iw, 1), 0) + h0
    cols = jax.lax.broadcasted_iota(jnp.int32, (ih, iw, 1), 1) + w0
    valid = ((rows >= vlo_h) & (rows < vhi_h)
             & (cols >= vlo_w) & (cols < vhi_w))
    x = xt[slot].astype(compute_dtype) + jnp.where(
        valid, b_ref[0, 0].astype(compute_dtype),
        jnp.zeros((), compute_dtype))

    # Phase-subset partial kernels (native ×4 split): compute only the
    # selected W-phases; absent planes' taps skip and the caller sums the
    # two partial outputs (W-phases never mix before the down stage, and
    # the act is per-plane, so the split is exact).
    active_w = tuple(range(u)) if w_phases is None else tuple(w_phases)
    # a_planes[p_h][p_w], each [Qh, Qw, TC], activated.
    a_planes = [[None] * u for _ in range(u)]
    if uw_ref is not None:
        # MXU up: W-dot moves Qw to the front ([Qw, ih, C]), the H-dot then
        # contracts ih (axis 1 again) → [Qh, Qw, C] — the same plane layout
        # the VPU path produces, so either down engine composes.
        w_planes = _up_dot(x, uw_ref, u, active_w, mxu_prec, mxu_cast)
        for p_w in active_w:
            h_of_w = _up_dot(w_planes[p_w], uh_ref, u, None, mxu_prec,
                             mxu_cast)
            for p_h in range(u):
                a_planes[p_h][p_w] = _act_lrelu(h_of_w[p_h], slope, gain,
                                                clamp)
    else:
        w_planes = _up_pass(x, plan_w, axis=1, count=plan_w.q_count,
                            phases=active_w)
        for p_w in active_w:
            h_of_w = _up_pass(w_planes[p_w], plan_h, axis=0,
                              count=plan_h.q_count)
            for p_h in range(u):
                a_planes[p_h][p_w] = _act_lrelu(h_of_w[p_h], slope, gain,
                                                clamp)

    classes_h = max(u // 2, 1)
    classes_w = max(u // 2, 1)
    th = plan_h.tile // classes_h
    tw = plan_w.tile // classes_w
    ref_shape = a_planes[0][active_w[0]].shape
    out_acc = [[None] * classes_w for _ in range(classes_h)]
    if mw_ref is not None:
        # MXU down: both stages as banded dot_generals over the phase
        # planes' middle axis (see _down_matrices / _down_dot).
        for r in range(len(terms)):
            tw_stage = [_down_dot(
                a_planes[p_h],
                lambda a, p: mw_ref[(r * classes_w + a) * u + p],
                u, classes_w, mxu_prec, mxu_cast) for p_h in range(u)]
            for a_w in range(classes_w):
                cols = _down_dot(
                    [tw_stage[p_h][a_w] for p_h in range(u)],
                    lambda a, p: mh_ref[(r * classes_h + a) * u + p],
                    u, classes_h, mxu_prec, mxu_cast)
                for a_h in range(classes_h):
                    prev = out_acc[a_h][a_w]
                    out_acc[a_h][a_w] = cols[a_h] if prev is None \
                        else prev + cols[a_h]
    elif msw_ref is not None:
        # Phase-shared MXU down (`_down_matrices_shared_*`): per H-plane,
        # concatenate the active W-planes along the contraction axis and
        # run ONE dot covering every (rank, W-class); then per W-class,
        # concatenate the (rank, H-plane) slices and one dot finishes the
        # H stage with the rank sum inside the contraction.
        n_r = len(terms)

        def _dot2(m, x_in):
            if mxu_cast is not None:
                m = m.astype(mxu_cast)
                x_in = x_in.astype(mxu_cast)
            return lax.dot_general(m, x_in, (((1,), (1,)), ((), ())),
                                   precision=mxu_prec,
                                   preferred_element_type=jnp.float32)

        def _cat1(arrs):
            return arrs[0] if len(arrs) == 1 else jnp.concatenate(arrs,
                                                                  axis=1)

        msw = msw_ref[...]
        msh = msh_ref[...]
        dw_of = []  # per p_h: [R·classes_w·tw, Qh, C]
        for p_h in range(u):
            cat = _cat1([a_planes[p_h][p_w] for p_w in active_w])
            dw_of.append(_dot2(msw, cat))
        for a_w in range(classes_w):
            blocks = [dw_of[p_h][(r * classes_w + a_w) * tw:
                                 (r * classes_w + a_w + 1) * tw]
                      for r in range(n_r) for p_h in range(u)]
            outs = _dot2(msh, _cat1(blocks))  # [classes_h·th, tw, C]
            for a_h in range(classes_h):
                out_acc[a_h][a_w] = outs[a_h * th:(a_h + 1) * th]
    else:
        for col_taps, row_taps in terms:
            dw = [_down_pass(a_planes[p_h], row_taps, u, axis=1, count=tw,
                             ref_shape=ref_shape)
                  for p_h in range(u)]
            for a_w in range(classes_w):
                cols = _down_pass([dw[p_h][a_w] for p_h in range(u)],
                                  col_taps, u, axis=0, count=th)
                for a_h in range(classes_h):
                    prev = out_acc[a_h][a_w]
                    out_acc[a_h][a_w] = cols[a_h] if prev is None \
                        else prev + cols[a_h]

    for a_h in range(classes_h):
        for a_w in range(classes_w):
            if out_acc[a_h][a_w] is None:  # degenerate split geometries
                out_acc[a_h][a_w] = jnp.zeros((th, tw, ref_shape[-1]),
                                              jnp.float32)
    rows = [_interleave(out_acc[a_h], axis=1) for a_h in range(classes_h)]
    o_ref[0] = _interleave(rows, axis=0).astype(o_ref.dtype)


# ------------------------------------------------------------- entry point


def _pick_tiles(u: int, tu: int, td: int, c_block: int, esize: int,
                w_align: int = 16,
                budget: Optional[int] = None,
                len_out_h: Optional[int] = None,
                len_out_w: Optional[int] = None) -> Tuple[int, int]:
    """Largest square-ish (TM, TW) whose VMEM footprint fits the budget.

    TW must give a w_align-aligned DMA stride (2·TW/u ≡ 0 mod w_align);
    TM only needs 2·TM ≡ 0 mod u. Tiles are CLAMPED to the actual output
    size (small layers: a 36² canvas forced through a padded 64² tile wastes
    >3× the compute — the round-2 small-layer pathology).
    """
    if budget is None:
        import os
        budget = int(float(os.environ.get("SG3TPU_FLRELU_BUDGET_MB", "9"))
                     * 2 ** 20)
    step = max(u // 2, 1)
    w_step = w_align * u // 2  # smallest TW with aligned stride
    # Smallest tile fully covering the output along each axis.
    cap_m = None if len_out_h is None else -(-len_out_h // step) * step
    cap_w = None if len_out_w is None else -(-len_out_w // w_step) * w_step
    for t in [256, 192, 128, 96, 80, 64, 48, 40, 32, 24, 16, 8]:
        tm = max((t // step) * step, step)
        tw = max((t // w_step) * w_step, w_step)
        if cap_m is not None:
            tm = min(tm, cap_m)
        if cap_w is not None:
            tw = min(tw, cap_w)
        q = (2 * max(tm, tw) + td - 2) // u + 1
        in_tile = q + tu // u + 2
        x_bytes = in_tile * in_tile * c_block * esize
        planes = (u * in_tile * q + u * u * q * q) * c_block * 4
        down = 2 * u * q * max(tm, tw) * c_block * 4
        out = tm * tw * c_block * esize
        # Measured (BASELINE.md round-3): tiles beyond the 9 MB working set
        # run SLOWER despite ~128 MB of physical VMEM — Mosaic scheduling
        # degrades with large resident plane sets — so the budget is a
        # tuning knob, not a capacity limit.
        if x_bytes + planes + down + out <= budget:
            return tm, tw
    return step, w_step


def fused_filtered_lrelu(
    x: jax.Array,
    fu: Optional[np.ndarray],
    fd: Optional[np.ndarray],
    b: Optional[jax.Array],
    up: int,
    down: int,
    padding: Tuple[int, int, int, int],
    gain: float,
    slope: float,
    clamp: Optional[float],
    c_block: int = 128,
    interpret: Optional[bool] = None,
    w_phases: Optional[Tuple[int, ...]] = None,
) -> Optional[jax.Array]:
    """One-kernel filtered lrelu. Returns None if the config is unsupported.

    Supported: down == 2, up ∈ {2, 4}, static numpy filters, fu 1-D
    separable, fd 1-D or SVD-separable 2-D — i.e. every SG3 synthesis layer
    except the filterless ToRGB (which needs no FIR at all).

    ``w_phases`` (internal): restrict the kernel to a subset of W-phases —
    the ×4 'split' route sums two such partials.
    """
    from .fir import _separate_2d

    if down != 2 or up not in (2, 4):
        return None
    if fu is None or fd is None:
        return None
    fu = np.asarray(fu, np.float64)
    fd = np.asarray(fd, np.float64)
    if fu.ndim != 1:
        return None

    if up == 4 and w_phases is None:
        import os

        mode = os.environ.get("SG3TPU_FLRELU_U4", "split")
        if mode == "stuff":
            # Round-2 route: zero-stuff ×2 on the host, run the ×2 kernel —
            # 4× the raw input DMA and taps on stuffed zeros.
            if b is not None:
                x = x + b.reshape(1, 1, 1, -1).astype(x.dtype)
            x = jax.lax.pad(x, jnp.zeros((), x.dtype),
                            [(0, 0, 0), (0, 1, 1), (0, 1, 1), (0, 0, 0)])
            return fused_filtered_lrelu(
                x, fu * 2.0, fd, None, 2, down, padding, gain, slope, clamp,
                c_block=c_block, interpret=interpret)
        if mode == "split":
            # Native 4-phase ×4 as TWO half kernels (W-phases {0,1} and
            # {2,3}) + one add: W-phases never mix before the down stage and
            # the act is per-plane, so partial sums are exact. The FULL
            # 16-plane kernel (mode 'native') wedges this environment's
            # remote Mosaic compile for 45+ min; each half is ×2-kernel
            # sized and compiles normally. Costs one extra read of the x
            # tiles and one output-sized add.
            parts = []
            for sub in ((0, 1), (2, 3)):
                out = fused_filtered_lrelu(
                    x, fu, fd, b, up, down, padding, gain, slope, clamp,
                    c_block=c_block, interpret=interpret, w_phases=sub)
                if out is None:
                    return None
                parts.append(out)
            return parts[0] + parts[1]
        # mode == 'native': fall through — single 16-plane kernel.
    px0, px1, py0, py1 = padding

    # Lane-occupancy fold: merge batch into the channel (lane) axis when
    # that raises 128-lane occupancy — e.g. L12/L13 (C=64) waste half the
    # VPU lanes per vector op at batch≥2; folded (N·C=128) they use all of
    # them. Costs two HBM transposes (~0.3 ms each at 1044²·bf16), repaid
    # many times over on the hot layers. FIR/bias/act are per-channel, so
    # batch entries never mix.
    n0, h0, w0, c0 = x.shape

    def _occ(ch):
        return ch / (-(-ch // c_block) * c_block)

    import os as _os
    fold_on = _os.environ.get("SG3TPU_FLRELU_FOLD", "1") == "1"
    if fold_on and n0 > 1 and _occ(n0 * c0) > _occ(c0) + 1e-9:
        xt = jnp.transpose(x, (1, 2, 0, 3)).reshape(1, h0, w0, n0 * c0)
        bt = None if b is None else jnp.tile(b, n0)
        out = fused_filtered_lrelu(
            xt, fu, fd, bt, up, down, padding, gain, slope, clamp,
            c_block=c_block, interpret=interpret, w_phases=w_phases)
        if out is not None:
            _, oh, ow, _ = out.shape
            out = out.reshape(oh, ow, n0, c0)
            return jnp.transpose(out, (2, 0, 1, 3))

    # Correlation-order taps with gains folded (upfirdn2d composition:
    # up pass gain=up² → ×up per axis; down pass gain=1).
    fu_c = fu[::-1] * up
    if x.dtype == jnp.bfloat16:
        fu_c = _truncate_taps_1d(fu_c)
    if fd.ndim == 1:
        fd_c = fd[::-1]
        terms = [(fd_c, fd_c)]
    else:
        terms = _separate_2d(fd[::-1, ::-1])
        if terms is None:
            return None
        if x.dtype == jnp.bfloat16:
            terms = _truncate_rank_terms(terms)
    td_h = len(terms[0][0])
    td_w = len(terms[0][1])

    n, h, w, c = x.shape
    dtype = x.dtype
    esize = jnp.dtype(dtype).itemsize

    w_align = 16  # bf16 sublane tile; safe for fp32 too
    # Down-pass engine, resolved BEFORE tile planning (the per-geometry
    # table can override the tile budget — L10's measured shared win only
    # exists at 18 MB tiles). Env knob wins over the measured table.
    import os as _os2
    down_mode = _os2.environ.get("SG3TPU_FLRELU_DOWN", "auto")
    budget_mb = None
    if down_mode == "auto":
        down_mode, budget_mb = _auto_down_mode(up, h=h, c=n * c)
    if _os2.environ.get("SG3TPU_FLRELU_BUDGET_MB"):
        budget_mb = None  # explicit env budget wins inside _pick_tiles
    # Output lengths (for tile clamping) from the composition formula.
    lo_h = (h * up + py0 + py1 - (len(fu_c) - 1) - (td_h - 1) + 1) // 2
    lo_w = (w * up + px0 + px1 - (len(fu_c) - 1) - (td_w - 1) + 1) // 2
    tm, tw = _pick_tiles(up, len(fu_c), max(td_h, td_w), c_block, esize,
                         w_align=w_align, len_out_h=lo_h, len_out_w=lo_w,
                         budget=None if budget_mb is None
                         else budget_mb * 2 ** 20)
    plan_h = _AxisPlan(h, tm, fu_c, td_h, up, py0, py1)
    plan_w = _AxisPlan(w, tw, fu_c, td_w, up, px0, px1, align=w_align)

    # Host padding: filter halos + channel round-up to the block size.
    c_pad = -(-c // c_block) * c_block
    xp = jnp.pad(x, ((0, 0),
                     (plan_h.pad_left, plan_h.pad_right),
                     (plan_w.pad_left, plan_w.pad_right),
                     (0, c_pad - c)))
    bias = jnp.zeros((c_pad,), jnp.float32) if b is None else \
        jnp.pad(b.astype(jnp.float32), (0, c_pad - c))
    # 2-D [c_blocks, c_block] so each grid step gets a clean (1, c_block)
    # block — 1-D bias blocks hit XLA↔Mosaic layout-tile mismatches.
    bias = bias.reshape(c_pad // c_block, 1, c_block)

    dims = (n, plan_h.n_tiles, plan_w.n_tiles, c_pad // c_block)
    import os as _os2
    compute_dtype = (jnp.bfloat16
                     if _os2.environ.get("SG3TPU_FLRELU_BF16") == "1"
                     else jnp.float32)
    # Fold the act gain into one down-FIR factor per rank (linear in the
    # activated planes) and pre-divide the clamp bound: the per-plane act
    # drops from 6 vector ops to 4, on the up grid where every point is
    # u² output points' worth of work.
    k_gain, k_clamp = float(gain), clamp
    if k_gain > 0.0 and k_gain != 1.0:
        terms = [(col * k_gain, row) for col, row in terms]
        k_clamp = None if clamp is None else float(clamp) / k_gain
        k_gain = 1.0

    # Down-pass engine (resolved above, before tile planning): 'vpu' (tap
    # FMA chains) or 'mxu' / 'mxu_shared' / '*_bf16' (banded dot_generals —
    # the down matrices ride the systolic array; the banding waste ~Q/taps
    # is repaid by the MXU:VPU peak ratio). 'mxu*' keeps f32 operands at
    # HIGHEST precision for fp32 layers / DEFAULT for bf16 layers;
    # '*_bf16' casts planes+matrices to bf16 (native MXU pass).
    up_mode = _os2.environ.get("SG3TPU_FLRELU_UP", "vpu")
    classes = max(up // 2, 1)
    mxu_kw = {}
    extra = []  # (name, np matrix) in kernel-operand order
    if down_mode in ("mxu", "mxu_bf16"):
        extra.append(("mw", _down_matrices(terms, up, classes, tw // classes,
                                           plan_w.q_count, which=1)))
        extra.append(("mh", _down_matrices(terms, up, classes, tm // classes,
                                           plan_h.q_count, which=0)))
    elif down_mode in ("mxu_shared", "mxu_shared_bf16"):
        aw = tuple(range(up)) if w_phases is None else tuple(w_phases)
        extra.append(("msw", _down_matrices_shared_w(
            terms, up, classes, tw // classes, plan_w.q_count, aw)))
        extra.append(("msh", _down_matrices_shared_h(
            terms, up, classes, tm // classes, plan_h.q_count,
            tuple(range(up)))))
    if up_mode in ("mxu", "mxu_bf16"):
        extra.append(("uw", _up_matrices(plan_w, plan_w.in_tile)))
        extra.append(("uh", _up_matrices(plan_h, plan_h.in_tile)))
    if extra:
        bf16_req = down_mode in ("mxu_bf16", "mxu_shared_bf16") \
            or up_mode == "mxu_bf16"
        mxu_kw = dict(
            mxu_prec=(lax.Precision.HIGHEST if dtype == jnp.float32
                      else lax.Precision.DEFAULT),
            mxu_cast=jnp.bfloat16 if bf16_req else None)
    extra_operands = [jnp.asarray(m) for _, m in extra]
    extra_specs = [
        pl.BlockSpec(m.shape, (lambda nd: lambda k: (0,) * nd)(m.ndim),
                     memory_space=pltpu.VMEM)
        for _, m in extra]
    if extra:
        kernel = functools.partial(
            _flrelu_kernel_extra, extra_names=tuple(n for n, _ in extra),
            plan_h=plan_h, plan_w=plan_w, terms=terms,
            slope=float(slope), gain=k_gain,
            clamp=None if k_clamp is None else float(k_clamp), u=up,
            dims=dims, compute_dtype=compute_dtype, w_phases=w_phases,
            **mxu_kw)
    else:
        kernel = functools.partial(
            _flrelu_kernel, plan_h=plan_h, plan_w=plan_w, terms=terms,
            slope=float(slope), gain=k_gain,
            clamp=None if k_clamp is None else float(k_clamp), u=up,
            dims=dims, compute_dtype=compute_dtype, w_phases=w_phases)

    # 1-D grid so the kernel can prefetch step k+1's input tile while
    # computing step k (manual double buffering; Mosaic already pipelines
    # the output block stores).
    total = int(np.prod(dims))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n, plan_h.out_pad, plan_w.out_pad, c_pad), dtype),
        grid=(total,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, 1, c_block),
                               lambda k: (_decode_step(k, dims)[3], 0, 0),
                               memory_space=pltpu.VMEM)] + extra_specs,
        out_specs=pl.BlockSpec((1, tm, tw, c_block),
                               lambda k: _decode_step(k, dims),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, plan_h.in_tile, plan_w.in_tile, c_block), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(xp, bias, *extra_operands)
    return out[:, :plan_h.len_out, :plan_w.len_out, :c]


# ---------------------------------------------------------------- backward


def _bwd_decode_step(k, dims):
    return _decode_step(k, dims)


def _flrelu_bwd_kernel_mxu(g_ref, x_ref, mw_ref, mh_ref, o_ref, gt, xt, sem,
                           **kw):
    _flrelu_bwd_kernel(g_ref, x_ref, o_ref, gt, xt, sem, mw_ref=mw_ref,
                       mh_ref=mh_ref, **kw)


def _flrelu_bwd_kernel(g_ref, x_ref, o_ref, gt, xt, sem, *, plan_g_h,
                       plan_g_w, plan_m_h, plan_m_w, up_terms, down_taps,
                       point_gain, slope, gain_f, clamp, u_fwd, dims,
                       mw_ref=None, mh_ref=None, mxu_prec=None,
                       mxu_cast=None):
    """One dx tile per grid step: recompute the forward up-grid A from x,
    up-sample dy on the same grid, multiply by act'(A), down-FIR.

    TPU equivalent of the reference's sign-reading backward kernel
    (filtered_lrelu.py:253-264, .cu signRead variants) — instead of a
    stored 2-bit sign tensor, A is recomputed per tile in VMEM (HBM reads:
    x tile instead of sign tile; no forward-pass sign write at all).
    """
    k = pl.program_id(0)
    total = pl.num_programs(0)
    tcg = gt.shape[-1]

    def start_dma(step, slot):
        n, hb, wb, cb = _decode_step(step, dims)
        return (
            pltpu.make_async_copy(
                g_ref.at[n, pl.ds(plan_g_h.tile_start(hb), plan_g_h.in_tile),
                         pl.ds(plan_g_w.tile_start(wb), plan_g_w.in_tile),
                         pl.ds(cb * tcg, tcg)],
                gt.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(
                x_ref.at[n, pl.ds(plan_m_h.tile_start(hb), plan_m_h.in_tile),
                         pl.ds(plan_m_w.tile_start(wb), plan_m_w.in_tile),
                         pl.ds(cb * tcg, tcg)],
                xt.at[slot], sem.at[slot, 1]),
        )

    slot = k % 2

    @pl.when(k == 0)
    def _():
        for c in start_dma(k, slot):
            c.start()

    @pl.when(k + 1 < total)
    def _():
        for c in start_dma(k + 1, (k + 1) % 2):
            c.start()

    for c in start_dma(k, slot):
        c.wait()

    g = gt[slot].astype(jnp.float32)
    x = xt[slot].astype(jnp.float32)

    # dy up-grid planes (u_b = 2): possibly multi-rank (radial fd).
    u_b = 2
    acc_planes = [[None] * u_b for _ in range(u_b)]
    for fu_col, fu_row in up_terms:
        w_planes = _up_pass_taps(g, plan_g_w, fu_row, axis=1,
                                 count=plan_g_w.q_count)
        for p_w in range(u_b):
            h_of_w = _up_pass_taps(w_planes[p_w], plan_g_h, fu_col, axis=0,
                                   count=plan_g_h.q_count)
            for p_h in range(u_b):
                prev = acc_planes[p_h][p_w]
                acc_planes[p_h][p_w] = h_of_w[p_h] if prev is None \
                    else prev + h_of_w[p_h]

    # Forward A planes from x (u_fwd phases), rearranged to the u_b layout.
    a_w = _up_pass(x, plan_m_w, axis=1, count=plan_m_w.q_count)
    a_grid = [[None] * u_fwd for _ in range(u_fwd)]
    for p_w in range(u_fwd):
        h_of_w = _up_pass(a_w[p_w], plan_m_h, axis=0,
                          count=plan_m_h.q_count)
        for p_h in range(u_fwd):
            a_grid[p_h][p_w] = h_of_w[p_h]

    def mask_plane(p_h, p_w):
        """act'(A) on backward plane (p_h, p_w), rows matching plan_g."""
        if u_fwd == 2:
            a = a_grid[p_h][p_w]
            a = a[:plan_g_h.q_count, :plan_g_w.q_count]
        else:  # u_fwd == 4: interleave (p, p+2) along each axis
            quads = [[a_grid[p_h + 2 * sh][p_w + 2 * sw]
                      for sw in range(2)] for sh in range(2)]
            qh = plan_g_h.q_count
            qw = plan_g_w.q_count
            rh = (qh + 1) // 2
            rw = (qw + 1) // 2
            rows = []
            for sh in range(2):
                cols = [quads[sh][sw][:rh, :rw] for sw in range(2)]
                rows.append(_interleave(cols, axis=1))
            a = _interleave(rows, axis=0)[:qh, :qw]
        pre = jnp.where(a >= 0, a, a * np.float32(slope)) * np.float32(gain_f)
        factor = jnp.where(a >= 0, np.float32(1.0), np.float32(slope))
        factor = factor * np.float32(point_gain)
        if clamp is not None:
            factor = jnp.where(jnp.abs(pre) <= np.float32(clamp), factor,
                               np.float32(0.0))
        return factor

    du = [[acc_planes[p_h][p_w] * mask_plane(p_h, p_w)
           for p_w in range(u_b)] for p_h in range(u_b)]

    # Stride-2 down-FIR (rank-1 taps: fu is always 1-D separable).
    th = plan_g_h.tile
    tw = plan_g_w.tile
    if mw_ref is not None:
        tw_stage = [_down_dot(du[p_h], lambda a, p: mw_ref[p], u_b, 1,
                              mxu_prec, mxu_cast)[0] for p_h in range(u_b)]
        cols = _down_dot(tw_stage, lambda a, p: mh_ref[p], u_b, 1,
                         mxu_prec, mxu_cast)
    else:
        dw = [_down_pass(du[p_h], down_taps, u_b, axis=1, count=tw)
              for p_h in range(u_b)]
        cols = _down_pass([dw[p_h][0] for p_h in range(u_b)], down_taps, u_b,
                          axis=0, count=th)
    o_ref[0] = cols[0].astype(o_ref.dtype)


def _up_pass_taps(x, plan: _AxisPlan, taps_1d: np.ndarray, axis: int,
                  count: int):
    """_up_pass with taps overridden per rank (radial backward filters):
    phase taps re-derived from `taps_1d` with the plan's pad/phase grid."""
    planes = []
    for p in range(plan.u):
        s0 = (plan.pad0_ - p) % plan.u
        taps = taps_1d[s0::plan.u]
        c_p = (p + s0 - plan.pad0_) // plan.u
        off = c_p - plan.base_in
        terms = []
        for j, tap in enumerate(np.asarray(taps, np.float64)):
            idx = [slice(None)] * x.ndim
            idx[axis] = slice(off + j, off + j + count)
            terms.append(x[tuple(idx)] * float(tap))
        if not terms:
            shape = list(x.shape)
            shape[axis] = count
            planes.append(jnp.zeros(shape, x.dtype))
        else:
            planes.append(_tree_sum(terms))
    return planes


def fused_filtered_lrelu_bwd(
    dy: jax.Array,
    x: jax.Array,
    fu: np.ndarray,
    fd: np.ndarray,
    b: Optional[jax.Array],
    up: int,
    down: int,
    padding: Tuple[int, int, int, int],
    gain: float,
    slope: float,
    clamp: Optional[float],
    c_block: int = 128,
    interpret: Optional[bool] = None,
) -> Optional[jax.Array]:
    """dx of the fused filtered lrelu, as ONE kernel (reference backward:
    same CUDA kernel with swapped filters + sign read,
    filtered_lrelu.py:253-264). Returns None when unsupported.

    Forward envelope: up ∈ {2, 4}, down == 2, fu 1-D, fd 1-D or
    SVD-separable 2-D. For up == 4 the backward's stride-4 down-pass runs
    as stride-2 + an XLA slice (phase planes stay contiguous).
    """
    from .fir import _separate_2d

    if down != 2 or up not in (2, 4):
        return None
    fu = np.asarray(fu, np.float64)
    fd = np.asarray(fd, np.float64)
    if fu.ndim != 1:
        return None
    px0, px1, py0, py1 = padding
    n, yh, yw, c = dy.shape
    _, xh, xw, _ = x.shape
    dtype = dy.dtype
    esize = jnp.dtype(dtype).itemsize

    # Backward-op padding (reference filtered_lrelu.py:255-260).
    tu_w = tu_h = len(fu)
    td_w, td_h = (len(fd),) * 2 if fd.ndim == 1 else (fd.shape[1], fd.shape[0])
    pp_x0 = (tu_w - 1) + (td_w - 1) - px0
    pp_x1 = xw * up - yw * down + px0 - (up - 1)
    pp_y0 = (tu_h - 1) + (td_h - 1) - py0
    pp_y1 = xh * up - yh * down + py0 - (up - 1)

    # Up(=2) taps from fd, unflipped (flip_filter toggles in the backward),
    # ×2 per axis (up-gain d²); multi-rank for radial fd.
    if fd.ndim == 1:
        up_terms = [(fd * 2.0, fd * 2.0)]
    else:
        terms = _separate_2d(fd)
        if terms is None:
            return None
        if dy.dtype == jnp.bfloat16:
            terms = _truncate_rank_terms(terms)  # match the forward's rank
        up_terms = [(col * 2.0, row * 2.0) for col, row in terms]
    # Down taps from fu, unflipped; the overall gain·u²/d² applies at the
    # mask stage (point_gain). bf16 tap truncation mirrors the forward: the
    # true gradient of a truncated-tap forward transposes the SAME
    # truncated taps.
    down_taps = np.asarray(fu, np.float64)
    if dy.dtype == jnp.bfloat16:
        down_taps = _truncate_taps_1d(down_taps)
    point_gain = gain * (up ** 2) / (down ** 2)

    # For up == 4 the true output stride is 4: compute stride-2, slice after.
    # Output length at stride 2 covers every x row at even indices.
    w_align = 16
    # Tile planning over the dy operand (backward up = 2).
    tu_b = len(up_terms[0][0])
    lo_h2 = (yh * 2 + pp_y0 + pp_y1 - (tu_b - 1) - (tu_h - 1) + 1) // 2
    lo_w2 = (yw * 2 + pp_x0 + pp_x1 - (tu_b - 1) - (tu_w - 1) + 1) // 2
    if lo_h2 <= 0 or lo_w2 <= 0:
        return None
    # Down-pass engine must be known BEFORE tile planning (the MXU dot
    # staging shrinks the viable tile budget — see below). Backward-specific
    # override first (lets an A/B pin the backward engine without disturbing
    # the forward's measured auto choice), then the shared knob.
    import os as _os3

    down_mode = _os3.environ.get(
        "SG3TPU_FLRELU_DOWN_BWD",
        _os3.environ.get("SG3TPU_FLRELU_DOWN", "auto"))
    if down_mode == "auto":
        # Measured round 5 (BASELINE.md backward engine shootout): the
        # banded-MXU down-stage wins on EVERY backward geometry — unlike
        # the forward, the backward's down pass is always 2-phase (u_b=2),
        # so even the ×4-up layers take the win (L10 bwd 173→114 ms b1;
        # hot-layer totals 484→313 ms b1, 1057→612 ms b8). CPU/interpret
        # keeps the VPU chains.
        down_mode = "mxu" if jax.default_backend() == "tpu" else "vpu"

    # u=4 mask planes enlarge the true footprint beyond the model: 30 MB
    # tiles put the L10 backward 2% over the 110 MB scoped-VMEM ceiling
    # (measured: "Scoped allocation 112.19M, limit 110.00M").
    bwd_budget = (24 if up == 4 else 30) * 2 ** 20
    if down_mode in ("mxu", "mxu_bf16") and dtype == jnp.float32 and up == 2:
        # fp32 doubles every VMEM intermediate and the MXU path adds dot
        # staging: the L3 geometry (52², C=1024, fp32, u=2) OOM'd Mosaic's
        # stack at 30 MB ("Ran out of memory in memory space vmem",
        # round-5 shootout) while every bf16 sibling fit. 20 MB keeps the
        # fp32+MXU class inside VMEM; the measured-winning bf16 layers keep
        # their 30 MB tiles.
        bwd_budget = 20 * 2 ** 20
    tm, tw = _pick_tiles(2, tu_b, tu_h, c_block, esize, w_align=w_align,
                         budget=bwd_budget, len_out_h=lo_h2,
                         len_out_w=lo_w2)
    # The mask plans (up = u_fwd) add their own constraints: H stride
    # divisibility (tile even for u=4) and W DMA alignment
    # (2·tw/u ≡ 0 mod 16 → tw multiple of 8·u).
    tm += tm % (up // 2)
    w_quant = w_align * up // 2
    tw = max((tw // w_quant) * w_quant, w_quant)
    plan_g_h = _AxisPlan(yh, tm, up_terms[0][0], tu_h, 2, pp_y0, pp_y1)
    plan_g_w = _AxisPlan(yw, tw, up_terms[0][1], tu_w, 2, pp_x0, pp_x1,
                         align=w_align)
    for plan, p0 in ((plan_g_h, pp_y0), (plan_g_w, pp_x0)):
        plan.pad0_ = p0
    # Mask plans over x: forward up-grid shifted into the backward frame —
    # pad0 = tu − 1 (derivation: y_fwd = y_bwd + pad − (tu − 1) folds into
    # the pad), forward taps with the forward's gain folding.
    fu_mask = fu[::-1] * up
    if dy.dtype == jnp.bfloat16:
        fu_mask = _truncate_taps_1d(fu_mask)  # match the forward's A
    plan_m_h = _AxisPlan(xh, tm, fu_mask, tu_h, up, tu_h - 1,
                         4 * (tu_h + tm))
    plan_m_w = _AxisPlan(xw, tw, fu_mask, tu_w, up, tu_w - 1,
                         4 * (tu_w + tw), align=w_align)
    for plan, p0 in ((plan_m_h, tu_h - 1), (plan_m_w, tu_w - 1)):
        plan.pad0_ = p0
    # The mask plans must cover every tile the dy grid visits (their own
    # n_tiles came from x's length; pad x out to the g-grid's tile count).
    for pm, pg in ((plan_m_h, plan_g_h), (plan_m_w, plan_g_w)):
        pm.n_tiles = pg.n_tiles
        pm.pad_right = max(
            0, (pm.n_tiles - 1) * pm.stride_q + pm.base_in + pm.in_tile
            - pm.length)

    if b is not None:
        x = x + b.reshape(1, 1, 1, -1).astype(x.dtype)

    c_pad = -(-c // c_block) * c_block
    gp = jnp.pad(dy, ((0, 0),
                      (plan_g_h.pad_left, plan_g_h.pad_right),
                      (plan_g_w.pad_left, plan_g_w.pad_right),
                      (0, c_pad - c)))
    xp = jnp.pad(x, ((0, 0),
                     (plan_m_h.pad_left, plan_m_h.pad_right),
                     (plan_m_w.pad_left, plan_m_w.pad_right),
                     (0, c_pad - c)))

    dims = (n, plan_g_h.n_tiles, plan_g_w.n_tiles, c_pad // c_block)

    mxu_kw = {}
    extra_operands = []
    extra_specs = []
    if down_mode in ("mxu", "mxu_bf16"):
        bw_terms = [(down_taps, down_taps)]
        mw_np = _down_matrices(bw_terms, 2, 1, tw, plan_g_w.q_count, which=1)
        mh_np = _down_matrices(bw_terms, 2, 1, tm, plan_g_h.q_count, which=0)
        mxu_kw = dict(
            mxu_prec=(lax.Precision.HIGHEST if dtype == jnp.float32
                      else lax.Precision.DEFAULT),
            mxu_cast=jnp.bfloat16 if down_mode == "mxu_bf16" else None)
        extra_operands = [jnp.asarray(mw_np), jnp.asarray(mh_np)]
        extra_specs = [
            pl.BlockSpec(mw_np.shape, lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(mh_np.shape, lambda k: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    kernel = functools.partial(
        _flrelu_bwd_kernel_mxu if extra_operands else _flrelu_bwd_kernel,
        plan_g_h=plan_g_h, plan_g_w=plan_g_w,
        plan_m_h=plan_m_h, plan_m_w=plan_m_w, up_terms=up_terms,
        down_taps=down_taps, point_gain=float(point_gain),
        slope=float(slope), gain_f=float(gain),
        clamp=None if clamp is None else float(clamp), u_fwd=up, dims=dims,
        **mxu_kw)

    total = int(np.prod(dims))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out2 = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (n, plan_g_h.out_pad, plan_g_w.out_pad, c_pad), dtype),
        grid=(total,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)] + extra_specs,
        out_specs=pl.BlockSpec((1, tm, tw, c_block),
                               lambda k: _decode_step(k, dims),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, plan_g_h.in_tile, plan_g_w.in_tile, c_block),
                       dtype),
            pltpu.VMEM((2, plan_m_h.in_tile, plan_m_w.in_tile, c_block),
                       dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=interpret,
    )(gp, xp, *extra_operands)
    out2 = out2[:, :lo_h2, :lo_w2, :c]
    if up == 4:
        out2 = out2[:, ::2, ::2]
    return out2[:, :xh, :xw]
