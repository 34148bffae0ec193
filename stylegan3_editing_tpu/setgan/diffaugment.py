"""DiffAugment (color / translation / cutout) in jnp with explicit RNG.

Parity: the DiffAugment policies used by the projected discriminator
(/root/reference/models/styleganxl/training/diffaug.py, applied in
models/setgan/discriminator.py:205-236 with policy
'color,translation,cutout'). Standard differentiable augmentation
(Zhao et al. 2020), re-implemented for NHWC with jax.random keys.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def rand_brightness(key, x):
    b = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype) - 0.5
    return x + b


def rand_saturation(key, x):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    s = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype) * 2
    return (x - mean) * s + mean


def rand_contrast(key, x):
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    c = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype) + 0.5
    return (x - mean) * c + mean


def rand_translation(key, x, ratio: float = 0.125):
    n, h, w, c = x.shape
    sh, sw = int(h * ratio + 0.5), int(w * ratio + 0.5)
    kx, ky = jax.random.split(key)
    tx = jax.random.randint(kx, (n,), -sh, sh + 1)
    ty = jax.random.randint(ky, (n,), -sw, sw + 1)
    pad = jnp.pad(x, ((0, 0), (sh, sh), (sw, sw), (0, 0)))

    rows = jnp.arange(h)[None, :] + (sh + tx)[:, None]  # [n, h]
    cols = jnp.arange(w)[None, :] + (sw + ty)[:, None]  # [n, w]
    gathered = jax.vmap(lambda img, r, cc: img[r][:, cc])(pad, rows, cols)
    return gathered


def rand_cutout(key, x, ratio: float = 0.5):
    n, h, w, c = x.shape
    ch, cw = int(h * ratio + 0.5), int(w * ratio + 0.5)
    kx, ky = jax.random.split(key)
    cy = jax.random.randint(kx, (n, 1, 1), 0, h + (1 - ch % 2))
    cx = jax.random.randint(ky, (n, 1, 1), 0, w + (1 - cw % 2))
    yy = jnp.arange(h)[None, :, None]
    xx = jnp.arange(w)[None, None, :]
    inside = ((yy >= cy - ch // 2) & (yy < cy + (ch + 1) // 2)
              & (xx >= cx - cw // 2) & (xx < cx + (cw + 1) // 2))
    mask = 1.0 - inside.astype(x.dtype)
    return x * mask[:, :, :, None]


_POLICIES = {
    "color": (rand_brightness, rand_saturation, rand_contrast),
    "translation": (rand_translation,),
    "cutout": (rand_cutout,),
}


def diff_augment(key: jax.Array, x: jax.Array,
                 policy: str = "color,translation,cutout") -> jax.Array:
    """Differentiable augmentation of NHWC images in [-1, 1]."""
    for name in policy.split(","):
        for fn in _POLICIES[name.strip()]:
            key, sub = jax.random.split(key)
            x = fn(sub, x)
    return x
