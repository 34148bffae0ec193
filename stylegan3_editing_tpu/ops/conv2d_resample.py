"""2-D convolution with fused up/downsampling (NHWC).

Semantics parity: /root/reference/torch_utils/ops/conv2d_resample.py:47-143
(padding applied once w.r.t. the upsampled grid, the same fast-path
selection), re-expressed TPU-first: `lax.conv_general_dilated` carries the
stride/transpose cases natively (no conv_transpose2d wrapper needed — XLA
derives arbitrary-order gradients of convs), and the FIR passes go through
`ops.upfirdn2d` (XLA depthwise conv / Pallas fast paths).

Weights are HWIO ``[kh, kw, in_channels // groups, out_channels]`` (flax
convention; the reference is OIHW).
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .upfirdn2d import _filter_size, parse_padding, upfirdn2d


def _conv2d(x, w, stride=1, padding=0, groups=1, flip_weight=True):
    """Grouped NHWC conv; flip_weight=True is correlation (torch conv2d)."""
    kh, kw = w.shape[0], w.shape[1]
    if not flip_weight and (kh > 1 or kw > 1):
        w = w[::-1, ::-1]
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    return lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv_transpose2d(x, w, stride=1, padding=0, groups=1, flip_weight=True):
    """Transpose conv matching torch `conv_transpose2d` semantics.

    torch conv_transpose2d with weight [in, out//g, kh, kw] and padding p
    equals an input-dilated correlation with the spatially-flipped kernel
    and padding (k-1-p) on each side.
    """
    kh, kw = w.shape[0], w.shape[1]
    # torch conv_transpose flips the kernel relative to correlation;
    # flip_weight=True here means "correlation convention for the result".
    if flip_weight:
        w = w[::-1, ::-1]
    if isinstance(padding, (list, tuple)):
        py, px = padding
    else:
        py = px = padding
    pad = [(kh - 1 - py, kh - 1 - py), (kw - 1 - px, kw - 1 - px)]
    return lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1, 1),
        padding=pad,
        lhs_dilation=(stride, stride),
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv2d_resample(
    x: jax.Array,
    w: jax.Array,
    f: Optional[Union[np.ndarray, jax.Array]] = None,
    up: int = 1,
    down: int = 1,
    padding=0,
    groups: int = 1,
    flip_weight: bool = True,
    flip_filter: bool = False,
) -> jax.Array:
    """Conv with optional FIR-filtered up/downsampling, padding applied once
    w.r.t. the upsampled image (reference conv2d_resample.py:47).

    Args:
        x: ``[N, H, W, C]``.
        w: ``[kh, kw, in_channels // groups, out_channels]`` (HWIO).
        f: setup_filter-prepared FIR (1-D separable or 2-D), or None.
        up / down: integer resampling factors.
        padding: w.r.t. the upsampled image; int / (x, y) / (x0, x1, y0, y1).
        groups: feature groups.
        flip_weight: False = convolution, True = correlation (default).
        flip_filter: False = convolution, True = correlation.
    """
    assert x.ndim == 4 and w.ndim == 4
    assert isinstance(up, int) and up >= 1
    assert isinstance(down, int) and down >= 1
    kh, kw = int(w.shape[0]), int(w.shape[1])
    in_per_group, out_channels = int(w.shape[2]), int(w.shape[3])
    fw, fh = _filter_size(None if f is None else jnp.asarray(f))
    px0, px1, py0, py1 = parse_padding(padding)

    # Adjust padding for up/downsampling (reference :85-95).
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    # 1×1 conv + downsampling only → downsample first (reference :98-101).
    if kw == 1 and kh == 1 and down > 1 and up == 1:
        x = upfirdn2d(x, f, down=down, padding=[px0, px1, py0, py1],
                      flip_filter=flip_filter)
        return _conv2d(x, w, groups=groups, flip_weight=flip_weight)

    # 1×1 conv + upsampling only → convolve first (reference :104-107).
    if kw == 1 and kh == 1 and up > 1 and down == 1:
        x = _conv2d(x, w, groups=groups, flip_weight=flip_weight)
        return upfirdn2d(x, f, up=up, padding=[px0, px1, py0, py1],
                         gain=up ** 2, flip_filter=flip_filter)

    # Downsampling only → strided conv (reference :110-113).
    if down > 1 and up == 1:
        x = upfirdn2d(x, f, padding=[px0, px1, py0, py1],
                      flip_filter=flip_filter)
        return _conv2d(x, w, stride=down, groups=groups,
                       flip_weight=flip_weight)

    # Upsampling (with optional downsampling) → transpose strided conv
    # (reference :116-133). The torch path transposes OIHW → IOHW for
    # conv_transpose2d's [in, out, kh, kw] layout; in HWIO that transpose is
    # a pure relabeling — the contraction stays over the I axis — so the
    # kernel passes through unchanged.
    if up > 1:
        wt = w
        px0 -= kw - 1
        px1 -= kw - up
        py0 -= kh - 1
        py1 -= kh - up
        pxt = max(min(-px0, -px1), 0)
        pyt = max(min(-py0, -py1), 0)
        x = _conv_transpose2d(x, wt, stride=up, padding=[pyt, pxt],
                              groups=groups, flip_weight=not flip_weight)
        x = upfirdn2d(x, f, padding=[px0 + pxt, px1 + pxt,
                                     py0 + pyt, py1 + pyt],
                      gain=up ** 2, flip_filter=flip_filter)
        if down > 1:
            x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
        return x

    # Plain conv when padding is symmetric and non-negative (reference :136).
    if up == 1 and down == 1 and px0 == px1 and py0 == py1 \
            and px0 >= 0 and py0 >= 0:
        return _conv2d(x, w, padding=[(py0, py0), (px0, px0)], groups=groups,
                       flip_weight=flip_weight)

    # Generic fallback (reference :140-143).
    x = upfirdn2d(x, f if up > 1 else None, up=up,
                  padding=[px0, px1, py0, py1], gain=up ** 2,
                  flip_filter=flip_filter)
    x = _conv2d(x, w, groups=groups, flip_weight=flip_weight)
    if down > 1:
        x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
    return x
