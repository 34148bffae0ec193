"""Video editing: per-frame InterFaceGAN / StyleCLIP edits + smoothed renders.

Parity: reference inversion/video/video_editor.py — `InterFaceGANVideoEditor`
(:55) edits every frame at both range endpoints, `StyleCLIPVideoEditor`
(:112) applies a text-driven StyleSpace delta per frame; both smooth edited
latents/transforms and render through the FOV expander, then write mp4s
(:41-52).

TPU-first: per-frame edits run as batched synthesis over all frames.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..editing.interfacegan import FaceEditor
from ..editing.styleclip_global import StyleCLIPGlobalDirection, apply_delta_s
from ..utils.common import generate_mp4, get_identity_transform, tensor2im
from ..utils.fov_expansion import Expander
from .post_processing import average_fine_layers, smooth_ws


class VideoEditor:
    def __init__(self, model, variables, resolution: int,
                 output_path, expansion_amounts=(0, 0, 0, 0)):
        self.model = model
        self.variables = variables
        self.resolution = resolution
        self.output_path = Path(output_path)
        self.expansion_amounts = expansion_amounts
        self.expander = Expander(model, variables, resolution)

    def get_smoothed_edited_images(self, edit_latents: np.ndarray,
                                   smoothed_transforms: np.ndarray
                                   ) -> List[np.ndarray]:
        smoothed = np.asarray(smooth_ws(edit_latents))
        pl, pr, pt, pb = self.expansion_amounts
        frames = []
        for latent, trans in zip(smoothed, smoothed_transforms):
            if trans is None:
                trans = get_identity_transform()
            canvas = self.expander.generate_expanded_image(
                jnp.asarray(latent[None]), np.asarray(trans, np.float32),
                pixels_left=pl, pixels_right=pr, pixels_top=pt, pixels_bottom=pb)
            frames.append(np.array(tensor2im(np.asarray(canvas[0]))))
        return frames

    def generate_edited_video(self, input_images: Sequence,
                              result_images_smoothed: List[np.ndarray],
                              edited_images_smoothed: List[np.ndarray],
                              fps: float, save_name: str) -> None:
        kwargs = {"fps": fps}
        generate_mp4(self.output_path / save_name, edited_images_smoothed, kwargs)
        coupled = []
        for im, smooth_im, edit_im in zip(list(input_images)[2:-2],
                                          result_images_smoothed,
                                          edited_images_smoothed):
            h = smooth_im.shape[0]
            im_r = np.array(im.resize((h, h))) if hasattr(im, "resize") else im
            coupled.append(np.concatenate([im_r, smooth_im, edit_im], axis=1))
        generate_mp4(self.output_path / f"{save_name}_coupled", coupled, kwargs)


class InterFaceGANVideoEditor(VideoEditor):
    def __init__(self, model, variables, resolution, output_path,
                 directions: Dict[str, np.ndarray], expansion_amounts=(0, 0, 0, 0)):
        super().__init__(model, variables, resolution, output_path,
                         expansion_amounts)
        self.latent_editor = FaceEditor(model, variables, directions=directions)

    def edit(self, edit_direction: str, start: float, end: float,
             result_latents: np.ndarray,
             landmarks_transforms: Optional[np.ndarray] = None):
        """Edit all frames at both range endpoints (batched over frames)."""
        latents = jnp.asarray(result_latents)  # [T, num_ws, 512]
        t = (jnp.asarray(np.stack(landmarks_transforms), jnp.float32)
             if landmarks_transforms is not None else None)
        outs = {}
        for tag, factor in (("start", start), ("end", end)):
            images, edit_latents = self.latent_editor.edit(
                latents, edit_direction, factor=factor,
                user_transforms=t, apply_user_transformations=t is not None)
            outs[tag] = (images, np.asarray(edit_latents))
        latents_dir = self.output_path / "latents"
        latents_dir.mkdir(parents=True, exist_ok=True)
        np.save(latents_dir / f"latents_{edit_direction}_start.npy", outs["start"][1])
        np.save(latents_dir / f"latents_{edit_direction}_end.npy", outs["end"][1])
        return (outs["start"][0], outs["end"][0],
                outs["start"][1], outs["end"][1])

    def postprocess_and_smooth_edits(self, edit_latents: np.ndarray,
                                     smoothed_transforms: np.ndarray):
        edit_latents = average_fine_layers(np.asarray(edit_latents))
        return self.get_smoothed_edited_images(edit_latents, smoothed_transforms)


class StyleCLIPVideoEditor(VideoEditor):
    def __init__(self, model, variables, resolution, output_path,
                 direction_calculator: StyleCLIPGlobalDirection,
                 expansion_amounts=(0, 0, 0, 0)):
        super().__init__(model, variables, resolution, output_path,
                         expansion_amounts)
        self.gd = direction_calculator
        import jax
        self._synth_s = jax.jit(
            lambda v, all_s, t: model.apply(v, None, all_s=all_s, transform=t,
                                            method=model.synthesize))
        import jax as _jax
        self._w2s = _jax.jit(lambda v, ws: model.apply(v, ws, method=model.w2s))

    def edit(self, target_text: str, alpha: float, beta: float,
             result_latents: np.ndarray, neutral_text: str = "face",
             landmarks_transforms: Optional[np.ndarray] = None):
        """Text-driven StyleSpace edit of all frames (batched)."""
        delta_s = self.gd.get_delta_s(neutral_text, target_text, beta)
        ws = jnp.asarray(result_latents)
        all_s = self._w2s(self.variables, ws)
        edited_s = apply_delta_s(all_s, delta_s, alpha)
        t = (jnp.asarray(np.stack(landmarks_transforms), jnp.float32)
             if landmarks_transforms is not None
             else jnp.broadcast_to(jnp.eye(3), (ws.shape[0], 3, 3)))
        images = self._synth_s(self.variables, edited_s, t)
        return images, edited_s
