"""ReStyle pSp/e4e: encoder + alias-free decoder with iterative refinement.

Parity: reference psp3.py / e4e3.py (models/setgan/encoder/) — residual codes
vs `latent_avg` on the first iteration and vs the previous latent afterwards
(psp3.py:50-60), 256² face pooling, and the aligned/unaligned dual decode
(psp3.py:62-76).

TPU-first re-design: the reference decodes TWICE per iteration (writes
identity then landmark transform into a mutated buffer). Here both decodes
run as ONE batched synthesis over stacked transforms — same FLOPs, half the
kernel launches, and no mutable module state.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.image import adaptive_avg_pool2d
from ..sg3.config import SG3Config
from ..sg3.generator import Generator
from .backbones import (
    INFERENCE_STAGE,
    BackboneEncoder,
    ProgressiveBackboneEncoder,
    ResNetBackboneEncoder,
    ResNetProgressiveBackboneEncoder,
)

ENCODER_TYPES = {
    "BackboneEncoder": BackboneEncoder,
    "ResNetBackboneEncoder": ResNetBackboneEncoder,
    "ProgressiveBackboneEncoder": ProgressiveBackboneEncoder,
    "ResNetProgressiveBackboneEncoder": ResNetProgressiveBackboneEncoder,
}
_PROGRESSIVE = {"ProgressiveBackboneEncoder", "ResNetProgressiveBackboneEncoder"}


class RestyleNet(nn.Module):
    """Unified ReStyle pSp / e4e model (encoder choice = pSp vs e4e)."""

    decoder_cfg: SG3Config
    encoder_type: str = "BackboneEncoder"
    n_styles: int = 16
    input_nc: int = 6  # ReStyle: image ⊕ previous reconstruction

    def setup(self):
        enc_cls = ENCODER_TYPES[self.encoder_type]
        self.encoder = enc_cls(n_styles=self.n_styles)
        self.decoder = Generator(self.decoder_cfg)

    @property
    def is_progressive(self) -> bool:
        return self.encoder_type in _PROGRESSIVE

    def encode(self, x, latent=None, latent_avg=None, train: bool = False,
               stage: int = INFERENCE_STAGE):
        """x: NHWC (6-channel after the first iteration) → codes [N, n_styles, 512]."""
        if self.is_progressive:
            codes = self.encoder(x, train=train, stage=stage)
        else:
            codes = self.encoder(x, train=train)
        if x.shape[-1] == self.input_nc and latent is not None:
            codes = codes + latent
        else:
            assert latent_avg is not None, "first iteration needs latent_avg"
            avg = jnp.asarray(latent_avg)
            if avg.ndim == 1:
                avg = avg[None, None, :]
            elif avg.ndim == 2:
                avg = avg[None]
            codes = codes + avg
        return codes

    def decode(self, codes, landmarks_transform=None, resize: bool = True,
               force_fp32: bool = True):
        """codes → (aligned, unaligned-or-None). One batched synthesis."""
        n = codes.shape[0]
        identity = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
        if landmarks_transform is None:
            images = self.decoder.synthesize(codes, transform=identity,
                                             force_fp32=force_fp32)
            unaligned = None
        else:
            lt = jnp.asarray(landmarks_transform, jnp.float32)
            if lt.ndim == 2:
                lt = jnp.broadcast_to(lt[None], (n, 3, 3))
            both = self.decoder.synthesize(
                jnp.concatenate([codes, codes], axis=0),
                transform=jnp.concatenate([identity, lt], axis=0),
                force_fp32=force_fp32)
            images, unaligned = both[:n], both[n:]
        if resize:
            images = adaptive_avg_pool2d(images, 256)
            if unaligned is not None:
                unaligned = adaptive_avg_pool2d(unaligned, 256)
        return images, unaligned

    def __call__(
        self,
        x,
        latent=None,
        latent_avg=None,
        resize: bool = True,
        input_code: bool = False,
        landmarks_transform=None,
        return_aligned_and_unaligned: bool = False,
        force_fp32: bool = True,
        train: bool = False,
        stage: int = INFERENCE_STAGE,
    ):
        """Returns (images, codes) or (aligned, unaligned, codes)."""
        if self.is_initializing():
            # Materialize the decoder's mapping params/EMA (w_avg) even
            # though inversion only uses synthesis — checkpoints carry the
            # full generator and latent_avg reads decoder ema.
            self.decoder.map(jnp.zeros((1, self.decoder_cfg.z_dim)))
        codes = x if input_code else self.encode(
            x, latent=latent, latent_avg=latent_avg, train=train, stage=stage)
        images, unaligned = self.decode(
            codes, landmarks_transform=landmarks_transform, resize=resize,
            force_fp32=force_fp32)
        if landmarks_transform is not None and return_aligned_and_unaligned:
            return images, unaligned, codes
        return images, codes


def get_average_image(model: RestyleNet, variables) -> Tuple[jax.Array, jax.Array]:
    """(avg_image [256,256,C], latent_avg) from the decoder's w_avg EMA.

    Parity: utils/inference_utils.py:59-64 + coach avg-image setup.
    """
    w_avg = variables["ema"]["decoder"]["mapping"]["w_avg"]
    codes = jnp.broadcast_to(w_avg[None, None, :],
                             (1, model.n_styles, w_avg.shape[-1]))
    img, _ = model.apply(variables, codes, input_code=True,
                         method=model.__call__)
    return img[0], w_avg


def run_restyle_iterations(
    model: RestyleNet,
    variables,
    x: jax.Array,
    avg_image: jax.Array,
    latent_avg: jax.Array,
    n_iters: int = 3,
    landmarks_transform=None,
    resize: bool = True,
    force_fp32: bool = True,
):
    """Iterative ReStyle inversion (inference).

    Parity: utils/inference_utils.py:67-111 `run_on_batch`. Returns lists of
    per-iteration (aligned, unaligned, codes). Unrolled python loop — each
    iteration feeds the previous reconstruction as input channels 4-6.

    `force_fp32=True` matches the reference protocol (psp3.py/e4e3.py decode
    with force_fp32=True); False runs the decoder's bf16 layers — NVIDIA's
    own SG3 inference default (gen_images-style, force_fp32=False) — which
    halves 1024² decode HBM traffic and is the knob that fits frame batches
    > 2 on a 16 GB chip (MIGRATION.md video notes).
    """
    n = x.shape[0]
    y_hat = jnp.broadcast_to(avg_image[None], (n,) + avg_image.shape)
    latent = None
    results = []
    for _ in range(n_iters):
        x_input = jnp.concatenate([x, y_hat], axis=-1)
        if landmarks_transform is not None:
            aligned, unaligned, codes = model.apply(
                variables, x_input, latent=latent, latent_avg=latent_avg,
                landmarks_transform=landmarks_transform,
                return_aligned_and_unaligned=True, resize=resize,
                force_fp32=force_fp32)
        else:
            aligned, codes = model.apply(
                variables, x_input, latent=latent, latent_avg=latent_avg,
                resize=resize, force_fp32=force_fp32)
            unaligned = None
        results.append((aligned, unaligned, codes))
        latent = codes
        y_hat = aligned
    return results
