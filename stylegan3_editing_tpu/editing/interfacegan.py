"""InterFaceGAN editing: linear latent-space boundary walks.

Parity: reference editing/interfacegan/ — `FaceEditor`
(face_editor.py:12-60: latents + f·direction, optional user transform),
`train_boundary` linear-SVM fit (helpers/manipulator.py:10-102), and the
pseudo-alignment trick for unaligned generators (w[:, 0] = w_avg,
generate_latents_and_attribute_scores.py:71-73).

TPU-first: a whole factor range renders as ONE batched synthesis
([factors × batch] along the batch axis) instead of the reference's
per-factor loop.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.common import generate_random_transform

DEFAULT_DIRECTIONS = ("age", "smile", "pose", "Male")


class FaceEditor:
    """Latent walks along attribute boundaries, batched over factors."""

    def __init__(self, model, variables,
                 directions: Optional[Dict[str, np.ndarray]] = None,
                 boundaries_dir: Optional[Union[str, Path]] = None):
        """`model`/`variables`: an sg3 Generator (or anything exposing
        `synthesize(ws, transform)`); directions: name → [1, 512] (or
        [num_ws, 512]) unit boundary normals (InterFaceGAN npy files)."""
        self.model = model
        self.variables = variables
        if directions is None:
            assert boundaries_dir is not None
            directions = {}
            for name in DEFAULT_DIRECTIONS:
                p = Path(boundaries_dir) / f"{name}_boundary.npy"
                if p.exists():
                    directions[name] = np.load(p)
        self.directions = {k: jnp.asarray(v, jnp.float32)
                           for k, v in directions.items()}
        self._synth = jax.jit(
            lambda v, ws, t: model.apply(v, ws, transform=t,
                                         method=model.synthesize))

    def edit(
        self,
        latents: jax.Array,
        direction: str,
        factor: float = 1.0,
        factor_range: Optional[Tuple[int, int]] = None,
        user_transforms: Optional[np.ndarray] = None,
        apply_user_transformations: bool = False,
    ):
        """latents: [N, num_ws, 512]. Returns (images, edit_latents).

        With `factor_range=(a, b)`: images is a list over factors of NHWC
        batches, edit_latents a list of [N, num_ws, 512].
        """
        d = self.directions[direction]
        n = latents.shape[0]
        if apply_user_transformations and user_transforms is None:
            user_transforms = generate_random_transform()
        t = (jnp.asarray(user_transforms, jnp.float32)
             if (apply_user_transformations and user_transforms is not None)
             else jnp.eye(3))
        if t.ndim == 2:
            t = jnp.broadcast_to(t[None], (n, 3, 3))

        if factor_range is None:
            edit_latents = latents + factor * d
            images = self._synth(self.variables, edit_latents, t)
            return images, edit_latents

        factors = list(range(*factor_range))
        all_latents = jnp.concatenate(
            [latents + f * d for f in factors], axis=0)
        all_t = jnp.tile(t, (len(factors), 1, 1))
        all_images = self._synth(self.variables, all_latents, all_t)
        images = [all_images[i * n:(i + 1) * n] for i in range(len(factors))]
        edit_latents = [all_latents[i * n:(i + 1) * n]
                        for i in range(len(factors))]
        return images, edit_latents


def train_boundary(
    latent_codes: np.ndarray,
    scores: np.ndarray,
    chosen_num_or_ratio: float = 0.02,
    split_ratio: float = 0.7,
    invalid_value: Optional[float] = None,
    seed: int = 0,
) -> np.ndarray:
    """Fit a unit-norm linear-SVM boundary separating attribute extremes.

    latent_codes: [num, dim]; scores: [num, 1]. Takes the top/bottom
    `chosen_num` samples by score as positives/negatives, fits a linear SVM
    on a split, reports held-out accuracy, returns the normalized normal
    [1, dim]. (CPU-side sklearn — boundary training is offline tooling.)
    """
    from sklearn import svm

    assert latent_codes.ndim == 2
    assert scores.shape == (latent_codes.shape[0], 1)
    rng = np.random.RandomState(seed)

    if invalid_value is not None:
        keep = scores[:, 0] != invalid_value
        latent_codes, scores = latent_codes[keep], scores[keep]

    order = np.argsort(scores[:, 0])[::-1]
    codes = latent_codes[order]
    num = codes.shape[0]
    chosen = (int(num * chosen_num_or_ratio) if chosen_num_or_ratio <= 1
              else int(chosen_num_or_ratio))
    chosen = max(min(chosen, num // 2), 1)
    train_num = int(chosen * split_ratio)

    pos_idx = rng.permutation(chosen)
    neg_idx = rng.permutation(chosen)
    pos, neg = codes[:chosen], codes[-chosen:]
    train_x = np.concatenate([pos[pos_idx[:train_num]],
                              neg[neg_idx[:train_num]]])
    train_y = np.concatenate([np.ones(train_num), np.zeros(train_num)])
    val_x = np.concatenate([pos[pos_idx[train_num:]],
                            neg[neg_idx[train_num:]]])
    val_y = np.concatenate([np.ones(chosen - train_num),
                            np.zeros(chosen - train_num)])

    clf = svm.SVC(kernel="linear").fit(train_x, train_y)
    if len(val_x):
        acc = float(np.mean(clf.predict(val_x) == val_y))
        print(f"boundary validation accuracy: {acc:.4f}")

    normal = clf.coef_.reshape(1, -1).astype(np.float32)
    return normal / np.linalg.norm(normal)


def pseudo_align_latents(ws: jax.Array, w_avg: jax.Array) -> jax.Array:
    """Neutralize the learned input transform of an unaligned G by forcing
    w0 = w_avg (generate_latents_and_attribute_scores.py:71-73)."""
    return ws.at[:, 0].set(jnp.broadcast_to(w_avg, ws[:, 0].shape))
