"""StyleCLIP global directions in StyleSpace.

Parity: reference editing/styleclip_global_directions/ —
`StyleCLIPGlobalDirection` (global_direction.py:20-60: text Δi from prompt
templates, delta_s = delta_i_c @ delta_i, β-threshold, max-normalize, scale
per-channel by S std), `s_statistics` preprocessing (preprocess/
s_statistics.py:40-96: 100k z → W2S → per-channel mean/std + mean input
transform) and `create_delta_i_c` (preprocess/create_delta_i_c.py:47-113:
±5σ per-channel perturbations → CLIP image-feature deltas).

TPU-first: s-statistics runs as batched jitted mapping+W2S sweeps; the
delta_i_c channel sweep batches CHANNELS onto the batch axis (the reference
loops one channel at a time through the generator).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.backbones.clip import CLIP, clip_preprocess_from_synth

# Standard CLIP prompt-ensemble templates (OpenAI's public ImageNet set is
# the reference's templates.txt; pass the full file via `templates`).
DEFAULT_TEMPLATES = (
    "a photo of a {}.",
    "a photo of the {}.",
    "a close-up photo of a {}.",
    "a cropped photo of a {}.",
    "a good photo of a {}.",
    "a bad photo of a {}.",
    "a bright photo of a {}.",
    "a dark photo of a {}.",
    "a photo of one {}.",
    "a photo of a nice {}.",
    "a photo of a weird {}.",
    "a blurry photo of a {}.",
    "a pixelated photo of a {}.",
    "a jpeg corrupted photo of a {}.",
    "a black and white photo of a {}.",
    "a photo of a cool {}.",
    "a photo of a small {}.",
    "a photo of a big {}.",
)


def load_templates(path: Optional[str] = None) -> Sequence[str]:
    if path and Path(path).exists():
        return [l.strip() for l in open(path) if l.strip()]
    return DEFAULT_TEMPLATES


def features_channels_to_s(channels: jax.Array, std: Dict[str, jax.Array],
                           example_s: Dict[str, jax.Array]
                           ) -> Dict[str, jax.Array]:
    """Flat channel vector → per-layer StyleSpace dict, scaled by S std."""
    result = {}
    start = 0
    for key, ref in example_s.items():
        n = ref.shape[-1]
        result[key] = (channels[start:start + n] * std[key])[None]
        start += n
    return result


class StyleCLIPGlobalDirection:
    """Text-driven StyleSpace edits via the precomputed delta_i_c matrix."""

    def __init__(self, delta_i_c: np.ndarray, s_std: Dict[str, np.ndarray],
                 templates: Sequence[str], s_avg: Dict[str, np.ndarray],
                 clip_model: CLIP, clip_variables: dict, tokenizer):
        self.delta_i_c = jnp.asarray(delta_i_c, jnp.float32)
        self.s_std = {k: jnp.asarray(v) for k, v in s_std.items()}
        self.s_avg = {k: jnp.asarray(v) for k, v in s_avg.items()}
        self.templates = list(templates)
        self.clip = clip_model
        self.clip_variables = clip_variables
        self.tokenizer = tokenizer
        self._encode_text = jax.jit(
            lambda v, toks: clip_model.apply(v, toks,
                                             method=clip_model.encode_text))

    def _averaged_text_features(self, prompts: Sequence[str]) -> jax.Array:
        feats = []
        for prompt in prompts:
            texts = [t.format(prompt) for t in self.templates]
            toks = jnp.asarray(self.tokenizer.tokenize(texts))
            emb = self._encode_text(self.clip_variables, toks)
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
            mean = jnp.mean(emb, axis=0)
            feats.append(mean / jnp.linalg.norm(mean))
        return jnp.stack(feats)

    def get_delta_i(self, prompts: Sequence[str]) -> jax.Array:
        f = self._averaged_text_features(prompts)
        delta_t = f[0] - f[1]
        return delta_t / jnp.linalg.norm(delta_t)

    def get_delta_s(self, neutral_text: str, target_text: str, beta: float
                    ) -> Dict[str, jax.Array]:
        delta_i = self.get_delta_i([target_text, neutral_text])
        r_c = self.delta_i_c @ delta_i
        delta_s = jnp.where(jnp.abs(r_c) < beta, 0.0, r_c)
        max_val = jnp.max(jnp.abs(delta_s))
        delta_s = jnp.where(max_val > 0, delta_s / max_val, delta_s)
        return features_channels_to_s(delta_s, self.s_std, self.s_avg)


def apply_delta_s(all_s: Dict[str, jax.Array], delta_s: Dict[str, jax.Array],
                  alpha: float) -> Dict[str, jax.Array]:
    """all_s + α·Δs, leaving the 'input' transform untouched (edit.py:150)."""
    out = dict(all_s)
    for key, d in delta_s.items():
        if key == "input":
            continue
        out[key] = all_s[key] + alpha * d
    return out


# ------------------------------------------------------------- preprocess

def compute_s_statistics(
    model, variables, num_images: int = 100_000, batch: int = 1024,
    truncation_psi: float = 0.5, truncation_cutoff: int = 8, seed: int = 0,
) -> Tuple[dict, Dict[str, np.ndarray], Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Sample z → W2S; return (mean transform, s_mean, s_std, s_samples_1k).

    TPU job: jitted map+W2S over large batches (the reference runs one 100k
    pass on GPU, s_statistics.py:45-48).
    """
    rnd = np.random.RandomState(seed)
    cfg = model.cfg if hasattr(model, "cfg") else model.decoder_cfg

    @jax.jit
    def batch_s(v, z):
        ws = model.apply(v, z, truncation_psi=truncation_psi,
                         truncation_cutoff=truncation_cutoff, method=model.map)
        return model.apply(v, ws, method=model.w2s)

    moments = None
    first_1k: Dict[str, list] = {}
    collected = 0
    for start in range(0, num_images, batch):
        n = min(batch, num_images - start)
        z = jnp.asarray(rnd.randn(n, cfg.z_dim), jnp.float32)
        all_s = jax.device_get(batch_s(variables, z))
        if moments is None:
            moments = {k: [np.zeros(v.shape[-1]), np.zeros(v.shape[-1]), 0]
                       for k, v in all_s.items()}
        for k, v in all_s.items():
            moments[k][0] += v.sum(axis=0)
            moments[k][1] += np.square(v).sum(axis=0)
            moments[k][2] += v.shape[0]
            if collected < 1000:
                first_1k.setdefault(k, []).append(v[:1000 - collected])
        collected += n

    s_mean = {k: (m[0] / m[2]).astype(np.float32) for k, m in moments.items()}
    s_std = {
        k: np.sqrt(np.maximum(m[1] / m[2] - np.square(s_mean[k]), 0) + 1e-12
                   ).astype(np.float32)
        for k, m in moments.items()
    }
    s_1k = {k: np.concatenate(v)[:1000] for k, v in first_1k.items()}

    t = s_1k["input"]
    transform = {"theta": float(np.arccos(np.clip(t[:, 0], -1, 1)).mean()),
                 "x": float(t[:, 2].mean()), "y": float(t[:, 3].mean())}
    return transform, s_mean, s_std, s_1k


def compute_delta_i_c(
    model, variables, clip_model: CLIP, clip_variables: dict,
    s_samples: Dict[str, np.ndarray], s_mean: Dict[str, np.ndarray],
    s_std: Dict[str, np.ndarray], num_samples: int = 1,
    manipulation_strength: float = 5.0, channels_per_batch: int = 8,
) -> np.ndarray:
    """±strength·σ per-channel S perturbations → normalized CLIP deltas.

    Channels batch onto the batch axis: each generator call renders
    `channels_per_batch × 2 × num_samples` images (the reference renders one
    image per call, create_delta_i_c.py:99-107).
    """
    layer_names = [k for k in s_samples.keys()]

    @jax.jit
    def render_features(v, cv, all_s_batched):
        imgs = model.apply(v, None, all_s=all_s_batched, method=model.synthesize)
        x = clip_preprocess_from_synth(imgs, clip_model.image_resolution)
        return clip_model.apply(cv, x, method=clip_model.encode_image)

    base = {k: jnp.asarray(v[:num_samples], jnp.float32)
            for k, v in s_samples.items()}
    deltas = []
    for layer in layer_names:
        n_channels = base[layer].shape[-1]
        for c0 in range(0, n_channels, channels_per_batch):
            cs = list(range(c0, min(c0 + channels_per_batch, n_channels)))
            reps = len(cs) * 2 * num_samples
            batched = {k: jnp.tile(v, (reps // num_samples, 1))
                       for k, v in base.items()}
            col = []
            for ci in cs:
                for direction in (-manipulation_strength, manipulation_strength):
                    col.append((ci, direction))
            layer_vals = batched[layer]
            for row, (ci, direction) in enumerate(col):
                val = s_mean[layer][ci] + direction * s_std[layer][ci]
                sl = slice(row * num_samples, (row + 1) * num_samples)
                layer_vals = layer_vals.at[sl, ci].set(val)
            batched[layer] = layer_vals
            feats = np.asarray(jax.device_get(
                render_features(variables, clip_variables, batched)))
            feats = feats.reshape(len(cs), 2, num_samples, -1)
            f = feats / np.linalg.norm(feats, axis=-1, keepdims=True)
            d = f[:, 1] - f[:, 0]
            d = d / np.linalg.norm(d, axis=-1, keepdims=True)
            d = d.mean(axis=1)
            d = d / np.linalg.norm(d, axis=-1, keepdims=True)
            deltas.append(d)
    return np.concatenate(deltas, axis=0).astype(np.float32)
