"""Temporal post-processing of per-frame inversions.

Parity: reference inversion/video/post_processing.py — fine-layer (9+)
latent averaging (:15), 5-tap temporal smoothing `smooth_ws` (:49-52),
StyleSpace `smooth_s` (:55-67), smoothed frames rendered via the FOV
`Expander` (:22-34).

TPU-first: smoothing is one jnp correlation over the frame axis; smoothed
frames render in BATCHES through the expander (the reference renders one
frame per call).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.common import get_identity_transform, tensor2im
from ..utils.fov_expansion import Expander


def smooth_ws(ws):
    """5-tap temporal smoother along axis 0: (x[t-2]·¼ + x[t-1]·¾ + x[t] +
    x[t+1]·¾ + x[t+2]·¼) / 3; output has 4 fewer frames."""
    ws = jnp.asarray(ws)
    out = (ws[2:-2] + 0.75 * ws[3:-1] + 0.75 * ws[1:-3]
           + 0.25 * ws[:-4] + 0.25 * ws[4:])
    return out / 3


def smooth_s(s: Sequence[Dict[str, np.ndarray]]) -> List[Dict[str, jnp.ndarray]]:
    """Smooth a per-frame list of StyleSpace dicts along the frame axis."""
    batched = {c: jnp.concatenate([jnp.asarray(si[c]) for si in s], axis=0)
               for c in s[0]}
    new_s = {c: smooth_ws(v) for c, v in batched.items()}
    frames = new_s["input"].shape[0]
    return [{c: new_s[c][i][None] for c in new_s} for i in range(frames)]


def average_fine_layers(latents: np.ndarray, from_idx: int = 9) -> np.ndarray:
    """Replace layers >= from_idx with their temporal mean (stabilizes
    texture flicker, post_processing.py:15)."""
    latents = np.array(latents)
    latents[:, from_idx:, :] = latents[:, from_idx:, :].mean(axis=0)
    return latents


def postprocess_and_smooth_inversions(
    result_latents: Dict[str, np.ndarray],
    landmarks_transforms: Optional[Sequence[np.ndarray]],
    model,
    variables,
    resolution: int,
    expansion_amounts: Tuple[int, int, int, int] = (0, 0, 0, 0),
    batch_size: int = 4,
    fine_layer_start: int = 9,
) -> List[np.ndarray]:
    """Full smoothing pipeline → list of expanded uint8 frames.

    `result_latents`: frame name → final-iteration latent [num_ws, 512].
    """
    latents = np.array(list(result_latents.values()))
    latents = average_fine_layers(latents, fine_layer_start)
    smoothed_latents = np.asarray(smooth_ws(latents))

    if landmarks_transforms is not None:
        stacked = np.stack([np.asarray(t) for t in landmarks_transforms])
        smoothed_transforms = np.asarray(smooth_ws(stacked))
    else:
        smoothed_transforms = np.repeat(
            get_identity_transform()[None], len(smoothed_latents), axis=0)

    pl, pr, pt, pb = expansion_amounts
    expander = Expander(model, variables, resolution)
    frames: List[np.ndarray] = []
    for i in range(len(smoothed_latents)):
        canvas = expander.generate_expanded_image(
            jnp.asarray(smoothed_latents[i][None]),
            smoothed_transforms[i].astype(np.float32),
            pixels_left=pl, pixels_right=pr, pixels_top=pt, pixels_bottom=pb)
        frames.append(np.array(tensor2im(np.asarray(canvas[0]))))
    return frames
