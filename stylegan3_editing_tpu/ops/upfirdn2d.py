"""Pad → zero-upsample → FIR filter → downsample for NHWC image batches.

TPU-native equivalent of the reference CUDA kernel
(/root/reference/torch_utils/ops/upfirdn2d.{cu,cpp}); semantics match the
reference Python path `_upfirdn2d_ref`
(/root/reference/torch_utils/ops/upfirdn2d.py:168-212), re-derived for NHWC:

1. zero-stuff each pixel by the upsampling factor,
2. pad (negative = crop) w.r.t. the upsampled grid,
3. convolve with the FIR filter (correlation if ``flip_filter``),
4. keep every ``down``-th pixel.

Steps 1–2 fuse into one `lax.pad` (interior + edge padding); steps 3–4 fuse
into one depthwise `lax.conv_general_dilated` with output striding. Separable
filters run as two 1-D passes. XLA's transpose rule gives the analytic
gradient (upfirdn2d with swapped up/down and mirrored padding) for free.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Scaling = Union[int, Sequence[int]]
Padding = Union[int, Sequence[int]]


def parse_scaling(scaling: Scaling) -> tuple[int, int]:
    """Normalize an int or (x, y) pair of scaling factors."""
    if isinstance(scaling, (int, np.integer)):
        scaling = [scaling, scaling]
    sx, sy = (int(s) for s in scaling)
    assert sx >= 1 and sy >= 1
    return sx, sy


def parse_padding(padding: Padding) -> tuple[int, int, int, int]:
    """Normalize an int, (x, y), or (x0, x1, y0, y1) padding spec."""
    if isinstance(padding, (int, np.integer)):
        padding = [padding, padding]
    padding = [int(p) for p in padding]
    if len(padding) == 2:
        px, py = padding
        padding = [px, px, py, py]
    px0, px1, py0, py1 = padding
    return px0, px1, py0, py1


def _filter_size(f) -> tuple[int, int]:
    if f is None:
        return 1, 1
    assert 1 <= f.ndim <= 2
    return int(f.shape[-1]), int(f.shape[0])  # (width, height)


def _depthwise_conv(
    x: jax.Array,
    f: jax.Array,
    strides: tuple[int, int],
    channels: int,
) -> jax.Array:
    """Valid depthwise conv of NHWC ``x`` with a shared 2-D kernel ``f``."""
    w = jnp.tile(f[:, :, None, None], (1, 1, 1, channels))
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=strides,
        padding="VALID",
        dimension_numbers=dn,
        feature_group_count=channels,
        precision=lax.Precision.HIGHEST,
    )


@functools.partial(
    jax.jit,
    static_argnames=("up", "down", "padding", "flip_filter", "gain"),
)
def _upfirdn2d_impl(x, f, *, up, down, padding, flip_filter, gain):
    upx, upy = parse_scaling(up)
    downx, downy = parse_scaling(down)
    px0, px1, py0, py1 = parse_padding(padding)
    n, in_h, in_w, channels = x.shape
    fw, fh = _filter_size(f)

    # The upsampled-and-padded buffer must cover the filter footprint.
    up_w = in_w * upx + px0 + px1
    up_h = in_h * upy + py0 + py1
    assert up_w >= fw and up_h >= fh, (
        f"upsampled buffer {up_h}x{up_w} smaller than filter {fh}x{fw}"
    )

    # Fused zero-stuffing + pad/crop. Interior padding inserts (up-1) zeros
    # between samples; the extra (up-1) on the high edge reproduces the
    # trailing zeros of "insert N-1 zeros after each pixel".
    pad_cfg = [
        (0, 0, 0),
        (py0, py1 + upy - 1, upy - 1),
        (px0, px1 + upx - 1, upx - 1),
        (0, 0, 0),
    ]
    x = lax.pad(x, jnp.zeros((), x.dtype), pad_cfg)

    if f is None:
        f = jnp.ones((1, 1), dtype=jnp.float32)
    f = f * (gain ** (f.ndim / 2))
    if not flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))
    f = f.astype(x.dtype)

    if f.ndim == 2:
        x = _depthwise_conv(x, f, (downy, downx), channels)
    else:
        # Separable: 1-D pass along width, then along height (order-free).
        x = _depthwise_conv(x, f[None, :], (1, downx), channels)
        x = _depthwise_conv(x, f[:, None], (downy, 1), channels)
    return x


def upfirdn2d(
    x: jax.Array,
    f: Optional[Union[np.ndarray, jax.Array]],
    up: Scaling = 1,
    down: Scaling = 1,
    padding: Padding = 0,
    flip_filter: bool = False,
    gain: float = 1,
    impl: str = "auto",
) -> jax.Array:
    """Pad, upsample, FIR-filter, and downsample a batch of NHWC images.

    Args:
        x: ``[N, H, W, C]`` input (any float dtype).
        f: float32 FIR filter — ``[fh, fw]`` (non-separable), ``[taps]``
           (separable), or ``None`` (identity).
        up / down: integer resampling factors, scalar or per-axis ``(x, y)``.
        padding: pixels w.r.t. the upsampled image; scalar, ``(x, y)``, or
            ``(x0, x1, y0, y1)``. Negative values crop.
        flip_filter: False = convolution, True = correlation.
        gain: overall magnitude scale.
        impl: 'auto' (XLA depthwise conv — measured fastest end-to-end for
            the non-fused call sites, see BASELINE.md), 'shift' (polyphase
            shift-and-add: exact but ~taps× HBM read amplification), or
            'conv'.
    """
    assert x.ndim == 4, "expected NHWC input"
    if impl == "auto":
        import os
        impl = os.environ.get("SG3TPU_FIR_IMPL", "auto")
    assert impl in ("auto", "shift", "conv")
    up_t = tuple(parse_scaling(up))
    down_t = tuple(parse_scaling(down))
    pad_t = tuple(parse_padding(padding))

    if impl == "shift" and f is not None:
        from .fir import fir_resample_2d, fir_resample_traced_1d

        if isinstance(f, np.ndarray):
            out = fir_resample_2d(x, f, up_t, down_t, pad_t, flip_filter,
                                  float(gain))
            if out is not None:
                return out
        elif f.ndim == 1:
            return fir_resample_traced_1d(x, f, up_t, down_t, pad_t,
                                          flip_filter, float(gain))
        raise ValueError("filter not expressible by the shift fast path")

    # The round-1/2 'mxu' (block-banded matmul) and 'pallas'/'pallas_hot'
    # (separate VMEM FIR kernel) experiments were deleted in round 3: both
    # measured SLOWER than this conv path end-to-end once the fused
    # one-kernel filtered_lrelu became the default (full measurement tables
    # preserved in BASELINE.md rounds 1-2; code in git history).
    if f is not None:
        f = jnp.asarray(f, dtype=jnp.float32)
        assert f.ndim in (1, 2)
    return _upfirdn2d_impl(
        x, f, up=up_t, down=down_t, padding=pad_t,
        flip_filter=flip_filter, gain=float(gain),
    )


def filter2d(x, f, padding: Padding = 0, flip_filter: bool = False, gain: float = 1):
    """FIR-filter NHWC images; output is same-size by default."""
    px0, px1, py0, py1 = parse_padding(padding)
    fw, fh = _filter_size(f)
    p = [
        px0 + fw // 2,
        px1 + (fw - 1) // 2,
        py0 + fh // 2,
        py1 + (fh - 1) // 2,
    ]
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)


def upsample2d(x, f, up: Scaling = 2, padding: Padding = 0,
               flip_filter: bool = False, gain: float = 1):
    """Upsample NHWC images by ``up`` with FIR interpolation."""
    upx, upy = parse_scaling(up)
    px0, px1, py0, py1 = parse_padding(padding)
    fw, fh = _filter_size(f)
    p = [
        px0 + (fw + upx - 1) // 2,
        px1 + (fw - upx) // 2,
        py0 + (fh + upy - 1) // 2,
        py1 + (fh - upy) // 2,
    ]
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter,
                     gain=gain * upx * upy)


def downsample2d(x, f, down: Scaling = 2, padding: Padding = 0,
                 flip_filter: bool = False, gain: float = 1):
    """Downsample NHWC images by ``down`` with FIR anti-aliasing."""
    downx, downy = parse_scaling(down)
    px0, px1, py0, py1 = parse_padding(padding)
    fw, fh = _filter_size(f)
    p = [
        px0 + (fw - downx + 1) // 2,
        px1 + (fw - downx) // 2,
        py0 + (fh - downy + 1) // 2,
        py1 + (fh - downy) // 2,
    ]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)
