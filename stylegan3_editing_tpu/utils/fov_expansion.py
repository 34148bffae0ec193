"""Field-of-view expansion via shifted Fourier-feature transforms.

Parity: reference utils/fov_expansion.py `Expander` — synthesize the frame
plus 4 edge- and 4 corner-shifted variants, stitch into a
(res+Δ)² canvas.

TPU-first re-design: the reference loops 9 sequential synthesis calls per
frame (fov_expansion.py:20-27); here all present transforms run as ONE
batched synthesis (stacked along batch), then the stitch is a pure jnp
paste — one compile, one launch.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .common import make_transform

_SLOTS = ("center", "left", "top", "right", "bottom",
          "top_left", "top_right", "bottom_right", "bottom_left")


class Expander:
    """Wraps a jitted `synthesize(ws, transform) -> NHWC` callable."""

    def __init__(self, model, variables, resolution: int):
        self.model = model
        self.variables = variables
        self.res = resolution
        self._synth = jax.jit(
            lambda v, ws, t: model.apply(v, ws, transform=t,
                                         method=model.synthesize))

    def _transforms(self, pr: int, pl: int, pt: int, pb: int
                    ) -> Dict[str, Optional[np.ndarray]]:
        res = self.res
        t = {
            "center": make_transform((0, 0), 0),
            "left": make_transform((pl / res, 0), 0) if pl else None,
            "right": make_transform((-pr / res, 0), 0) if pr else None,
            "top": make_transform((0, pt / res), 0) if pt else None,
            "bottom": make_transform((0, -pb / res), 0) if pb else None,
            "top_left": make_transform((pl / res, pt / res), 0) if pl and pt else None,
            "top_right": make_transform((-pr / res, pt / res), 0) if pr and pt else None,
            "bottom_right": make_transform((-pr / res, -pb / res), 0) if pr and pb else None,
            "bottom_left": make_transform((pl / res, -pb / res), 0) if pl and pb else None,
        }
        return {k: (np.linalg.inv(v) if v is not None else None)
                for k, v in t.items()}

    def generate_expanded_image(self, ws, landmark_t: np.ndarray,
                                pixels_right: int = 0, pixels_left: int = 0,
                                pixels_top: int = 0, pixels_bottom: int = 0
                                ) -> jax.Array:
        """ws: [N, num_ws, w_dim]; landmark_t: [3, 3]. Returns NHWC canvas."""
        assert landmark_t is not None
        res = self.res
        pr, pl, pt, pb = pixels_right, pixels_left, pixels_top, pixels_bottom
        transforms = self._transforms(pr, pl, pt, pb)
        active = [k for k in _SLOTS if transforms[k] is not None]

        n = ws.shape[0]
        # One batched synthesis over (active transforms × batch).
        stacked_t = jnp.asarray(np.stack(
            [landmark_t @ transforms[k] for k in active]), jnp.float32)
        ws_rep = jnp.tile(ws, (len(active), 1, 1))
        t_rep = jnp.repeat(stacked_t, n, axis=0)
        imgs = self._synth(self.variables, ws_rep, t_rep)
        views = {k: imgs[i * n:(i + 1) * n] for i, k in enumerate(active)}

        canvas = jnp.zeros((n, pt + res + pb, pl + res + pr, imgs.shape[-1]),
                           imgs.dtype)
        canvas = canvas.at[:, pt:pt + res, pl:pl + res].set(views["center"])
        if pl:
            canvas = canvas.at[:, pt:pt + res, :pl].set(views["left"][:, :, :pl])
        if pt:
            canvas = canvas.at[:, :pt, pl:pl + res].set(views["top"][:, :pt, :])
        if pr:
            canvas = canvas.at[:, pt:pt + res, pl + res:].set(
                views["right"][:, :, res - pr:])
        if pb:
            canvas = canvas.at[:, pt + res:, pl:pl + res].set(
                views["bottom"][:, res - pb:, :])
        if pt and pl:
            canvas = canvas.at[:, :pt, :pl].set(views["top_left"][:, :pt, :pl])
        if pt and pr:
            canvas = canvas.at[:, :pt, pl + res:].set(
                views["top_right"][:, :pt, res - pr:])
        if pb and pr:
            canvas = canvas.at[:, pt + res:, pl + res:].set(
                views["bottom_right"][:, res - pb:, res - pr:])
        if pb and pl:
            canvas = canvas.at[:, pt + res:, :pl].set(
                views["bottom_left"][:, res - pb:, :pl])
        return canvas
