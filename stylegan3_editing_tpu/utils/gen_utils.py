"""Latent-space interpolation and sampling helpers.

Parity: reference models/styleganxl/torch_utils/gen_utils.py —
`get_w_from_seed` (:107-136), `lerp`/`slerp` and interpolation video
helpers (:175-230). TPU-first: interpolation paths synthesize the whole
trajectory as ONE batched call instead of frame-at-a-time loops.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def get_w_from_seed(model, variables, seed: int, batch: int = 1,
                    truncation_psi: float = 1.0) -> jax.Array:
    """Seeded z → W+ latents through the mapping network."""
    z = jax.random.normal(jax.random.PRNGKey(seed), (batch, model.cfg.z_dim))
    return model.apply(variables, z, truncation_psi=truncation_psi,
                       method=model.map)


def lerp(a, b, t):
    """Linear interpolation; t may be scalar or [T] (broadcast to a path)."""
    a, b = jnp.asarray(a), jnp.asarray(b)
    t = jnp.asarray(t)
    while t.ndim < a.ndim + 1:
        t = t[..., None]
    return a[None] * (1 - t) + b[None] * t


def slerp(a, b, t, eps: float = 1e-7):
    """Spherical interpolation along the great circle through a and b
    (gen_utils.py:185-200). Falls back to lerp for near-parallel inputs."""
    a, b = jnp.asarray(a), jnp.asarray(b)
    t = jnp.asarray(t)
    while t.ndim < a.ndim + 1:
        t = t[..., None]
    an = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + eps)
    bn = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + eps)
    dot = jnp.clip(jnp.sum(an * bn, axis=-1, keepdims=True), -1 + eps, 1 - eps)
    omega = jnp.arccos(dot)
    so = jnp.sin(omega)
    safe = jnp.abs(so) > eps
    w_a = jnp.where(safe, jnp.sin((1 - t) * omega) / so, 1 - t)
    w_b = jnp.where(safe, jnp.sin(t * omega) / so, t)
    return a[None] * w_a + b[None] * w_b


def interpolation_path(ws_keyframes: jax.Array, frames_per_segment: int,
                       mode: str = "lerp") -> jax.Array:
    """[K, ...] keyframes → [(K-1)·F, ...] path (open, endpoint-exclusive
    per segment; the final keyframe is appended)."""
    assert mode in ("lerp", "slerp")
    fn = lerp if mode == "lerp" else slerp
    t = jnp.arange(frames_per_segment) / frames_per_segment
    segs = [fn(ws_keyframes[i], ws_keyframes[i + 1], t)
            for i in range(ws_keyframes.shape[0] - 1)]
    return jnp.concatenate(segs + [ws_keyframes[-1:]], axis=0)


def interpolation_video(model, variables, seeds, out_path: str,
                        frames_per_segment: int = 30, fps: int = 30,
                        truncation_psi: float = 0.7, mode: str = "slerp",
                        batch: int = 8,
                        transform: Optional[jax.Array] = None) -> int:
    """Render a seed-to-seed interpolation video; returns frame count.

    The whole trajectory synthesizes in batched chunks (one compiled graph
    reused across chunks) — not the reference's frame-at-a-time loop.
    """
    from .common import generate_mp4, tensor2im

    ws = jnp.concatenate(
        [get_w_from_seed(model, variables, s,
                         truncation_psi=truncation_psi) for s in seeds])
    path = interpolation_path(ws, frames_per_segment, mode=mode)

    synth = jax.jit(lambda v, w: model.apply(
        v, w, transform=transform, method=model.synthesize))
    frames = []
    pad = (-len(path)) % batch
    padded = jnp.concatenate([path, jnp.repeat(path[-1:], pad, axis=0)]) \
        if pad else path
    for i in range(0, len(padded), batch):
        imgs = synth(variables, padded[i:i + batch])
        frames.extend(tensor2im(img) for img in np.asarray(imgs))
    frames = frames[:len(path)]
    generate_mp4(out_path, frames, {"fps": fps})
    return len(frames)
