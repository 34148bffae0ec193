"""FFT spectrum analysis of generated images.

Parity: reference models/styleganxl/torch_utils/utils_spectrum.py:5-155
(`roll_quadrants`, `batch_fft`, `azimuthal_average`, spectrum statistics) —
the aliasing diagnostic: alias-free synthesis should show no spurious
high-frequency energy concentrations. Pure jnp; the azimuthal binning is a
segment-sum (XLA-friendly, no host loops).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def roll_quadrants(data: jax.Array, backwards: bool = False) -> jax.Array:
    """Center the DC component of a [N, H, W] Fourier transform."""
    assert data.ndim == 3, "expected [N, H, W]"
    shifts = [s // 2 for s in data.shape[1:]]
    if backwards:
        shifts = [-s for s in shifts]
    return jnp.roll(data, shifts, axis=(1, 2))


def batch_fft(data: jax.Array, normalize: bool = False) -> jax.Array:
    """2-D FFT over a batch of [N, H, W] images."""
    assert data.ndim == 3, "expected [N, H, W]"
    return jnp.fft.fftn(data, axes=(1, 2),
                        norm="ortho" if normalize else "backward")


def azimuthal_average(power: jax.Array,
                      center: Optional[Tuple[float, float]] = None
                      ) -> jax.Array:
    """Radially averaged profile of centered [N, H, W] power spectra →
    [N, n_radii]."""
    assert power.ndim == 3
    n, h, w = power.shape
    cy = (h - 1) / 2 if center is None else center[0]
    cx = (w - 1) / 2 if center is None else center[1]
    yy = jnp.arange(h)[:, None] - cy
    xx = jnp.arange(w)[None, :] - cx
    r = jnp.sqrt(yy * yy + xx * xx)
    r_idx = jnp.rint(r).astype(jnp.int32).reshape(-1)
    n_bins = int(np.rint(np.hypot(max(cy, h - 1 - cy),
                                  max(cx, w - 1 - cx)))) + 1
    counts = jax.ops.segment_sum(jnp.ones_like(r_idx, jnp.float32), r_idx,
                                 num_segments=n_bins)
    flat = power.reshape(n, -1)
    sums = jax.vmap(lambda p: jax.ops.segment_sum(
        p, r_idx, num_segments=n_bins))(flat)
    return sums / jnp.maximum(counts, 1.0)


def power_spectrum(images: jax.Array, normalize: bool = True) -> jax.Array:
    """[N, H, W, C] or [N, H, W] images → centered [N, H, W] power."""
    if images.ndim == 4:
        images = jnp.mean(images, axis=-1)  # luminance-ish
    freq = batch_fft(images, normalize=normalize)
    return roll_quadrants(jnp.abs(freq) ** 2)


def spectrum_stats(images: jax.Array) -> dict:
    """Mean/std azimuthal power profile over a batch (the reference's
    spectrum statistics used in aliasing comparisons)."""
    prof = azimuthal_average(power_spectrum(images))
    return {"mean": jnp.mean(prof, axis=0), "std": jnp.std(prof, axis=0)}
