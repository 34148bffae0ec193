"""Spatial (H) activation sharding with halo exchange for SG3 synthesis.

SURVEY §5 names 2-D sharding of the 36²→1024² activation pyramid as the
TPU-flavored scale story (reference analogue: the FOV Expander's nine
serial syntheses, /root/reference/utils/fov_expansion.py:13-108). This
module shards every synthesis activation along H over a mesh axis
('space'), exchanging FIR halos between neighboring shards with
``lax.ppermute`` inside ``shard_map`` — activations never materialize
unsharded, so canvases larger than one chip's HBM become possible and
multi-chip synthesis scales without replicating the activation pyramid.

Correctness strategy: every `filtered_lrelu` is a sliding-window op, so a
shard can compute its output rows exactly from its input rows plus a fixed
halo. The halo rows are *biased real* neighbor rows (bias is pre-added
before the exchange so edge shards' zero-halos reproduce the global
zero-padding, which the reference applies after bias —
torch_utils/ops/filtered_lrelu.py:146-149). Alignment of the stride-`down`
output grid across shards is restored by a parity pad `p_top` and a
per-shard dynamic output slice. Exactness vs the unsharded forward is
asserted in tests/test_parallel.py on the CPU mesh.

Only the flagship SG3-R geometry is required: conv_kernel == 1 (no conv
halo needed) — asserted.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.sg3.config import SG3Config, build_synthesis_layout
from ..models.sg3.synthesis import SynthesisInput, SynthesisLayer
from ..ops.filtered_lrelu import filtered_lrelu
from ..ops.modulated_conv import modulated_conv2d
from ..ops.upfirdn2d import _filter_size


class _SpatialPlan:
    """Static per-layer plan for the H-sharded filtered_lrelu."""

    def __init__(self, H: int, up: int, down: int, py0: int, py1: int,
                 tu: int, td: int, shards: int):
        out_global = (H * up + py0 + py1 - (tu - 1) - (td - 1)
                      + (down - 1)) // down
        assert H % shards == 0, (H, shards)
        assert out_global % shards == 0, (out_global, shards)
        self.Hl = H // shards
        self.Ol = out_global // shards
        # Exact input-row needs per shard: output row m covers up-grid sites
        # [down·m, down·m + td + tu − 2]; input row i sits at site u·i + py0.
        def i_lo(s):
            return -(-(down * s * self.Ol - py0) // up)

        def i_hi(s):
            return (down * ((s + 1) * self.Ol - 1)
                    + td + tu - 2 - py0) // up

        self.halo_top = max(0, max(s * self.Hl - i_lo(s)
                                   for s in range(shards)))
        self.halo_bot = max(0, max(i_hi(s) - ((s + 1) * self.Hl - 1)
                                   for s in range(shards)))
        assert max(self.halo_top, self.halo_bot) <= self.Hl, (
            f"halo ({self.halo_top}/{self.halo_bot}) exceeds shard rows "
            f"{self.Hl}; use fewer spatial shards")
        # Output-grid parity pad (u even ⇒ static across shards).
        assert up % 2 == 0 or down == 1
        self.p_top = py0 % down if down > 1 else 0
        # Per-shard output offsets off(s) = s·Ol − D(s)/down with
        # D(s) = up·(s·Hl − halo_top) + py0 − p_top (see module docstring).
        offs = []
        for s in range(shards):
            d_site = up * (s * self.Hl - self.halo_top) + py0 - self.p_top
            assert d_site % down == 0
            offs.append(s * self.Ol - d_site // down)
        if min(offs) < 0:
            # First needed output row starts before the local window (its
            # leading sites are zero-stuffed/pad positions): extend the top
            # zero-pad by whole output strides — parity is preserved.
            shift = -min(offs)
            self.p_top += down * shift
            offs = [o + shift for o in offs]
        self.offs = offs
        # Bottom pad: make every shard's local output long enough.
        ln_xs = self.Hl + self.halo_top + self.halo_bot
        need = max(o + self.Ol for o in offs)
        # out_loc = (ln_xs·up + p_top + p_bot − (tu−1) − (td−1) + (down−1))//down
        self.p_bot = max(
            0, need * down - (ln_xs * up + self.p_top - (tu - 1) - (td - 1)
                              + (down - 1)))
        self.up, self.down, self.tu, self.td = up, down, tu, td


def _exchange_halo(x_local: jax.Array, halo_top: int, halo_bot: int,
                   axis_name: str, shards: int, dim: int = 1) -> jax.Array:
    """Extend `dim` with neighbor halos: [..., L, ...] → [..., halo_top + L
    + halo_bot, ...]; edge halos are zeros (ppermute pairs omit the
    wrap-around, unmatched receivers get 0)."""
    def take(sl):
        idx = [slice(None)] * x_local.ndim
        idx[dim] = sl
        return x_local[tuple(idx)]

    parts = []
    if halo_top > 0:
        down_perm = [(i, i + 1) for i in range(shards - 1)]
        parts.append(lax.ppermute(take(slice(-halo_top, None)), axis_name,
                                  down_perm))
    parts.append(x_local)
    if halo_bot > 0:
        up_perm = [(i + 1, i) for i in range(shards - 1)]
        parts.append(lax.ppermute(take(slice(None, halo_bot)), axis_name,
                                  up_perm))
    return jnp.concatenate(parts, axis=dim) if len(parts) > 1 else x_local


def spatial_filtered_lrelu(
    x_local: jax.Array,
    fu: Optional[np.ndarray],
    fd: Optional[np.ndarray],
    b: Optional[jax.Array],
    up: int,
    down: int,
    padding: Tuple[int, int, int, int],
    gain: float,
    slope: float,
    clamp: Optional[float],
    *,
    axis_name: str,
    shards: int,
    H_global: int,
    axis_name_w: Optional[str] = None,
    shards_w: int = 1,
    W_global: Optional[int] = None,
    impl: str = "auto",
) -> jax.Array:
    """filtered_lrelu over an H-sharded activation (inside shard_map).

    ``x_local`` is this shard's ``[N, H/shards, W, C]`` row block; returns
    the shard's ``[N, out_H/shards, W, C]`` output rows, exact vs the
    unsharded op. With ``axis_name_w`` the activation is additionally
    W-sharded (2-D 'space_h' × 'space_w' grid): halos exchange along H
    first, then along W — the W-neighbor's H-extension covers the same
    global rows (same H-shard index), so the corner halo rides along.
    """
    px0, px1, py0, py1 = padding
    fu_w, fu_h = _filter_size(None if fu is None else jnp.asarray(fu))
    fd_w, fd_h = _filter_size(None if fd is None else jnp.asarray(fd))
    if up == 1 and down == 1 and fu is None and fd is None:
        # Pointwise (ToRGB): no halo needed.
        return filtered_lrelu(x_local, fu=fu, fd=fd, b=b, up=up, down=down,
                              padding=padding, gain=gain, slope=slope,
                              clamp=clamp, impl=impl)

    plan = _SpatialPlan(H_global, up, down, py0, py1, fu_h, fd_h, shards)
    plan_w = None
    if axis_name_w is not None and shards_w > 1:
        plan_w = _SpatialPlan(W_global, up, down, px0, px1, fu_w, fd_w,
                              shards_w)

    # Bias lands on REAL rows only (global op pads after bias): pre-add it,
    # then exchange already-biased halos; edge zero-halos = global zero-pad.
    if b is not None:
        x_local = x_local + b.reshape(1, 1, 1, -1).astype(x_local.dtype)
    xs = _exchange_halo(x_local, plan.halo_top, plan.halo_bot, axis_name,
                        shards, dim=1)
    pad_w = (px0, px1)
    if plan_w is not None:
        xs = _exchange_halo(xs, plan_w.halo_top, plan_w.halo_bot,
                            axis_name_w, shards_w, dim=2)
        pad_w = (plan_w.p_top, plan_w.p_bot)

    y_full = filtered_lrelu(
        xs, fu=fu, fd=fd, b=None, up=up, down=down,
        padding=(pad_w[0], pad_w[1], plan.p_top, plan.p_bot),
        gain=gain, slope=slope, clamp=clamp, impl=impl)

    s_idx = lax.axis_index(axis_name)
    offs = jnp.asarray(plan.offs, jnp.int32)
    out = lax.dynamic_slice_in_dim(y_full, offs[s_idx], plan.Ol, axis=1)
    if plan_w is not None:
        w_idx = lax.axis_index(axis_name_w)
        offs_w = jnp.asarray(plan_w.offs, jnp.int32)
        out = lax.dynamic_slice_in_dim(out, offs_w[w_idx], plan_w.Ol, axis=2)
    return out


def spatial_synthesis(
    cfg: SG3Config,
    variables: dict,
    ws: jax.Array,
    mesh: Mesh,
    axis: str = "space",
    axis_w: Optional[str] = None,
    transform: Optional[jax.Array] = None,
    force_fp32: bool = False,
    impl: str = "auto",
) -> jax.Array:
    """Full SG3 synthesis with every activation H-sharded over `axis`
    (and W-sharded over `axis_w` when given — a 2-D spatial grid).

    ``variables`` is the Generator's variable tree (the 'synthesis' subtree
    is used). ws: [N, num_ws, w_dim] replicated. Returns the stitched
    [N, res, res, C] image (sharded along H[/W] on the mesh).
    """
    layout = build_synthesis_layout(cfg)
    shards = mesh.shape[axis]
    shards_w = mesh.shape[axis_w] if axis_w is not None else 1
    for spec in layout.layers:
        assert spec.conv_kernel == 1, (
            "spatial sharding supports conv_kernel=1 (SG3-R) only")

    def subtree(tree, name):
        return {coll: sub["synthesis"][name]
                for coll, sub in tree.items()
                if isinstance(sub, dict) and name in sub.get("synthesis", {})}

    input_mod = SynthesisInput(layout.input)
    input_vars = subtree(variables, "input")
    layer_mods = [SynthesisLayer(spec) for spec in layout.layers]
    layer_vars = [subtree(variables, spec.name) for spec in layout.layers]

    def conv_part(m: SynthesisLayer, x, w, dtype):
        input_gain = lax.rsqrt(m.magnitude_ema.value)
        styles = m.compute_styles(w)
        x = modulated_conv2d(
            x.astype(dtype), m.weight, styles,
            demodulate=not m.spec.is_torgb,
            padding=m.spec.conv_kernel - 1,
            input_gain=input_gain)
        return x, m.bias

    other_axes = [a for a in mesh.axis_names if a != axis]

    def fn(ws_rep, transform_arg):
        s_idx = lax.axis_index(axis)
        # Fourier input: replicated compute (36² — trivial), local rows kept.
        x = input_mod.apply(input_vars, ws_rep[:, 0],
                            transform=transform_arg)
        h0 = layout.input.size[1]
        w0 = layout.input.size[0]
        assert h0 % shards == 0, (h0, shards)
        hl = h0 // shards
        x = lax.dynamic_slice_in_dim(x, s_idx * hl, hl, axis=1)
        if shards_w > 1:
            assert w0 % shards_w == 0, (w0, shards_w)
            wl = w0 // shards_w
            w_idx = lax.axis_index(axis_w)
            x = lax.dynamic_slice_in_dim(x, w_idx * wl, wl, axis=2)

        for i, (spec, mod, lvars) in enumerate(
                zip(layout.layers, layer_mods, layer_vars)):
            dtype = (jnp.bfloat16 if (spec.use_bf16 and not force_fp32)
                     else jnp.float32)
            x, bias = mod.apply(lvars, x, ws_rep[:, i + 1], dtype,
                                method=conv_part)
            x = spatial_filtered_lrelu(
                x, spec.up_filter, spec.down_filter, bias.astype(x.dtype),
                spec.up_factor, spec.down_factor, spec.padding,
                gain=1.0 if spec.is_torgb else float(np.sqrt(2)),
                slope=1.0 if spec.is_torgb else 0.2,
                clamp=spec.conv_clamp,
                axis_name=axis, shards=shards,
                H_global=spec.in_size[1],
                axis_name_w=axis_w if shards_w > 1 else None,
                shards_w=shards_w, W_global=spec.in_size[0], impl=impl)
        if cfg.output_scale != 1:
            x = x * jnp.asarray(cfg.output_scale, x.dtype)
        return x.astype(jnp.float32)

    out_spec = (P(None, axis) if shards_w <= 1
                else P(None, axis, axis_w))
    fn_sharded = shard_map(
        fn, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=out_spec,
        check_vma=False)
    t_arg = (jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32),
                              (ws.shape[0], 3, 3))
             if transform is None
             else jnp.asarray(transform, jnp.float32))
    return fn_sharded(ws.astype(jnp.float32), t_arg)


class ShardedExpander:
    """FOV expander whose every view synthesizes H-sharded over the mesh.

    Reference: `Expander.generate_expanded_image` runs 9 SERIAL syntheses
    with shifted Fourier transforms and stitches (fov_expansion.py:13-108);
    the in-repo Expander batches them into one call (utils/fov_expansion.py)
    but still replicates the full activation pyramid per device. This
    variant reuses the Expander's transform/stitch logic verbatim while the
    synthesis runs through `spatial_synthesis` — >res² canvases whose
    activations never materialize unsharded."""

    def __init__(self, cfg: SG3Config, variables: dict, mesh: Mesh,
                 axis: str = "space", axis_w: Optional[str] = None):
        from ..utils.fov_expansion import Expander

        self._inner = Expander.__new__(Expander)
        self._inner.model = None
        self._inner.variables = variables
        self._inner.res = cfg.img_resolution
        self._inner._synth = (
            lambda v, ws, t: spatial_synthesis(cfg, v, ws, mesh, axis=axis,
                                               axis_w=axis_w, transform=t))

    def generate_expanded_image(self, ws, landmark_t=None, **pixels):
        if landmark_t is None:
            landmark_t = np.eye(3, dtype=np.float32)
        return self._inner.generate_expanded_image(ws, landmark_t, **pixels)


def spatial_expanded_synthesis(cfg, variables, ws, mesh,
                               pixels_left=0, pixels_right=0,
                               pixels_top=0, pixels_bottom=0,
                               axis: str = "space",
                               axis_w: Optional[str] = None,
                               landmark_t=None) -> jax.Array:
    """One-call helper: >res² FOV canvas, spatially sharded."""
    return ShardedExpander(
        cfg, variables, mesh, axis, axis_w=axis_w).generate_expanded_image(
        ws, landmark_t, pixels_left=pixels_left, pixels_right=pixels_right,
        pixels_top=pixels_top, pixels_bottom=pixels_bottom)
