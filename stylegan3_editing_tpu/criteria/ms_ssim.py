"""Multi-scale SSIM (pure jnp, NHWC).

Semantics parity: reference criteria/ms_ssim.py (jorge-pessoa variant):
11-tap σ=1.5 gaussian window, VALID padding, 5 scales with the classic
weights, contrast-sensitivity product formulation, optional relu/simple
normalization, and the same dynamic L inference ([0,1] vs [-1,1] input).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.image import avg_pool2d

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2)
               / (2 * sigma ** 2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def _windowed_mean(x: jax.Array, window: jax.Array) -> jax.Array:
    c = x.shape[-1]
    w = jnp.tile(window[:, :, None, None], (1, 1, 1, c)).astype(x.dtype)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x, w, (1, 1), "VALID",
                                    dimension_numbers=dn,
                                    feature_group_count=c)


def ssim(
    img1: jax.Array,
    img2: jax.Array,
    window_size: int = 11,
    size_average: bool = True,
    full: bool = False,
    val_range: Optional[float] = None,
):
    """SSIM over NHWC images. ``val_range=None`` infers L from img1's range."""
    if val_range is None:
        # Static-shape-friendly dynamic range inference (matches reference
        # thresholds: >128 → 255 else 1; min < -0.5 → -1 else 0).
        max_val = jnp.where(jnp.max(img1) > 128, 255.0, 1.0)
        min_val = jnp.where(jnp.min(img1) < -0.5, -1.0, 0.0)
        level = max_val - min_val
    else:
        level = jnp.asarray(float(val_range), img1.dtype)

    h, w = img1.shape[1], img1.shape[2]
    real_size = min(window_size, h, w)
    window = jnp.asarray(_gaussian_window(real_size, 1.5))

    mu1 = _windowed_mean(img1, window)
    mu2 = _windowed_mean(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _windowed_mean(img1 * img1, window) - mu1_sq
    sigma2_sq = _windowed_mean(img2 * img2, window) - mu2_sq
    sigma12 = _windowed_mean(img1 * img2, window) - mu1_mu2

    c1 = (0.01 * level) ** 2
    c2 = (0.03 * level) ** 2
    v1 = 2.0 * sigma12 + c2
    v2 = sigma1_sq + sigma2_sq + c2
    cs_map = v1 / v2
    ssim_map = ((2 * mu1_mu2 + c1) * v1) / ((mu1_sq + mu2_sq + c1) * v2)

    if size_average:
        ret, cs = jnp.mean(ssim_map), jnp.mean(cs_map)
    else:
        ret = jnp.mean(ssim_map, axis=(1, 2, 3))
        cs = jnp.mean(cs_map, axis=(1, 2, 3))
    if full:
        return ret, cs
    return ret


def msssim(
    img1: jax.Array,
    img2: jax.Array,
    window_size: int = 11,
    size_average: bool = True,
    val_range: Optional[float] = None,
    normalize=None,
) -> jax.Array:
    """Multi-scale SSIM over NHWC images (5 scales)."""
    weights = jnp.asarray(_MSSSIM_WEIGHTS)
    ssims, mcs = [], []
    for _ in range(len(_MSSSIM_WEIGHTS)):
        sim, cs = ssim(img1, img2, window_size=window_size,
                       size_average=size_average, full=True,
                       val_range=val_range)
        if normalize == "relu":
            sim, cs = jax.nn.relu(sim), jax.nn.relu(cs)
        ssims.append(sim)
        mcs.append(cs)
        img1 = avg_pool2d(img1, 2)
        img2 = avg_pool2d(img2, 2)

    ssims = jnp.stack(ssims)
    mcs = jnp.stack(mcs)
    if normalize in ("simple", True):
        ssims = (ssims + 1) / 2
        mcs = (mcs + 1) / 2

    pow1 = mcs ** weights.reshape((-1,) + (1,) * (mcs.ndim - 1))
    pow2 = ssims ** weights.reshape((-1,) + (1,) * (ssims.ndim - 1))
    return jnp.prod(pow1[:-1], axis=0) * pow2[-1]
