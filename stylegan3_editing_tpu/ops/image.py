"""Image-space helpers: layout converters, resizes, adaptive pooling.

`adaptive_avg_pool2d` reproduces torch's AdaptiveAvgPool2d windowing exactly
(used by the ID loss path, /root/reference/criteria/id_loss.py:14-23) via
integral images — static shapes, fully vectorized.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def nchw_to_nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x):
    return jnp.transpose(x, (0, 3, 1, 2))


def _pool_bounds(in_size: int, out_size: int) -> Tuple[np.ndarray, np.ndarray]:
    i = np.arange(out_size)
    starts = (i * in_size) // out_size
    ends = -((-(i + 1) * in_size) // out_size)  # ceil
    return starts, ends


def adaptive_avg_pool2d(x: jax.Array, output_size) -> jax.Array:
    """Exact torch-style adaptive average pooling over NHWC images."""
    oh, ow = (output_size, output_size) if isinstance(output_size, int) else output_size
    n, h, w, c = x.shape
    if (h, w) == (oh, ow):
        return x

    x64 = x.astype(jnp.float32)
    # Integral image with a leading zero row/col: S[i, j] = sum(x[:i, :j]).
    s = jnp.cumsum(jnp.cumsum(x64, axis=1), axis=2)
    s = jnp.pad(s, ((0, 0), (1, 0), (1, 0), (0, 0)))

    ys, ye = _pool_bounds(h, oh)
    xs, xe = _pool_bounds(w, ow)
    ys, ye, xs, xe = (jnp.asarray(v) for v in (ys, ye, xs, xe))

    # window sum = S[ye, xe] - S[ys, xe] - S[ye, xs] + S[ys, xs]
    a = s[:, ye][:, :, xe]
    b = s[:, ys][:, :, xe]
    cc = s[:, ye][:, :, xs]
    d = s[:, ys][:, :, xs]
    counts = ((ye - ys)[:, None] * (xe - xs)[None, :]).astype(jnp.float32)
    out = (a - b - cc + d) / counts[None, :, :, None]
    return out.astype(x.dtype)


def resize_nearest(x: jax.Array, size) -> jax.Array:
    """Nearest-neighbor resize of NHWC images (torch F.interpolate default)."""
    oh, ow = (size, size) if isinstance(size, int) else size
    n, h, w, c = x.shape
    # torch 'nearest': src = floor(dst * scale), scale = in/out.
    rows = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    return x[:, rows][:, :, cols]


def resize_bilinear(x: jax.Array, size, antialias: bool = False) -> jax.Array:
    """Bilinear resize (align_corners=False) of NHWC images."""
    oh, ow = (size, size) if isinstance(size, int) else size
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, oh, ow, c), method="linear",
                            antialias=antialias)


def grid_sample(x: jax.Array, grid: jax.Array) -> jax.Array:
    """Bilinear grid sampling over NHWC images (align_corners=False).

    grid: [N, Hg, Wg, 2] normalized coords in [-1, 1] (x, y order). Zero
    padding outside. Arbitrary-order differentiable (pure jnp) — the role of
    the reference's grid_sample_gradfix for the ADA augment pipe.
    """
    n, h, w, c = x.shape
    gx = (grid[..., 0] + 1) * (w / 2) - 0.5
    gy = (grid[..., 1] + 1) * (h / 2) - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def gather(yi, xi):
        valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = jax.vmap(lambda img, yy, xx: img[yy, xx])(x, yi_c, xi_c)
        return vals * valid[..., None].astype(x.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None].astype(x.dtype)
    wy = wy[..., None].astype(x.dtype)
    return ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
            + (v10 * (1 - wx) + v11 * wx) * wy)


def avg_pool2d(x: jax.Array, window: int, stride=None) -> jax.Array:
    """Plain average pooling (VALID) over NHWC."""
    stride = stride or window
    out = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        (1, window, window, 1), (1, stride, stride, 1), "VALID")
    return out / (window * window)


def max_pool2d(x: jax.Array, window: int, stride: int, padding: int = 0,
               ceil_mode: bool = False) -> jax.Array:
    """Max pooling over NHWC (torch MaxPool2d semantics, explicit padding).

    ceil_mode pads bottom/right with -inf so the last partial window counts
    (torch MaxPool2d(ceil_mode=True)); windows always start within the
    input+left-pad region for window > stride//... — torch drops windows
    starting entirely in right padding, which cannot happen when the extra
    pad is < stride (true here: extra < stride by construction).
    """
    # init must be a concrete scalar so XLA pattern-matches reduce-window-max
    # (a traced init breaks reverse-mode autodiff).
    if jnp.issubdtype(x.dtype, jnp.floating):
        neg = -np.inf
    else:
        neg = np.iinfo(np.dtype(x.dtype)).min

    def extra(size: int) -> int:
        if not ceil_mode:
            return 0
        span = size + 2 * padding - window
        out = -(-span // stride) + 1  # ceil division
        if (out - 1) * stride >= size + padding:  # torch's dropped-window rule
            out -= 1
        return max(0, (out - 1) * stride + window - (size + 2 * padding))

    pads = ((0, 0),
            (padding, padding + extra(x.shape[1])),
            (padding, padding + extra(x.shape[2])),
            (0, 0))
    return jax.lax.reduce_window(
        x, neg, jax.lax.max,
        (1, window, window, 1), (1, stride, stride, 1),
        [(lo, hi) for lo, hi in pads])
