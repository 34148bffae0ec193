"""Attribute / age / pose scorers for InterFaceGAN boundary training.

Parity: reference editing/interfacegan/helpers/ — DEX-VGG age estimator
(age_estimator.py:13-120: VGG16 + 101-way head, expected-age readout),
HopeNet pose estimator (pose_estimator.py:21-221: ResNet-50 trunk + 3×66-bin
angle heads, expectation over bins), and the AnyCostGAN-style 40-attribute
classifier head used by generate_latents_and_attribute_scores.py. All take
converted torch weights; random init is only useful for plumbing tests.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.backbones.resnet import ResNet50Features
from ..models.backbones.vgg import VGG16Features
from ..ops.image import resize_bilinear

CELEBA_ATTRIBUTES = (
    "5_o_Clock_Shadow", "Arched_Eyebrows", "Attractive", "Bags_Under_Eyes",
    "Bald", "Bangs", "Big_Lips", "Big_Nose", "Black_Hair", "Blond_Hair",
    "Blurry", "Brown_Hair", "Bushy_Eyebrows", "Chubby", "Double_Chin",
    "Eyeglasses", "Goatee", "Gray_Hair", "Heavy_Makeup", "High_Cheekbones",
    "Male", "Mouth_Slightly_Open", "Mustache", "Narrow_Eyes", "No_Beard",
    "Oval_Face", "Pale_Skin", "Pointy_Nose", "Receding_Hairline",
    "Rosy_Cheeks", "Sideburns", "Smiling", "Straight_Hair", "Wavy_Hair",
    "Wearing_Earrings", "Wearing_Hat", "Wearing_Lipstick",
    "Wearing_Necklace", "Wearing_Necktie", "Young",
)


class AgeEstimator(nn.Module):
    """DEX: VGG16 features → 101-way age distribution → expected age."""

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images: NHWC in [-1, 1] → expected ages [N]."""
        x = resize_bilinear(images, 224)
        feats = VGG16Features(name="vgg")(x)[-1]  # [N, 14, 14, 512]
        # VGG classifier head (fc6/fc7 + 101-way age logits).
        n = feats.shape[0]
        # torch flattens CHW; match for converter compatibility.
        h = jnp.transpose(feats[:, :7, :7, :], (0, 3, 1, 2)).reshape(n, -1)
        h = nn.relu(nn.Dense(4096, name="fc6")(h))
        h = nn.relu(nn.Dense(4096, name="fc7")(h))
        logits = nn.Dense(101, name="age_head")(h)
        probs = jax.nn.softmax(logits, axis=-1)
        ages = jnp.arange(101, dtype=jnp.float32)
        return probs @ ages


class PoseEstimator(nn.Module):
    """HopeNet: ResNet-50 trunk + yaw/pitch/roll bin heads → degrees."""

    num_bins: int = 66

    @nn.compact
    def __call__(self, images: jax.Array) -> Dict[str, jax.Array]:
        x = resize_bilinear(images, 224)
        feats = ResNet50Features(name="trunk")(x)  # [N, 2048]
        idx = jnp.arange(self.num_bins, dtype=jnp.float32)
        out = {}
        for name in ("yaw", "pitch", "roll"):
            logits = nn.Dense(self.num_bins, name=f"fc_{name}")(feats)
            probs = jax.nn.softmax(logits, axis=-1)
            out[name] = jnp.sum(probs * idx, axis=-1) * 3 - 99
        return out


class AttributeClassifier(nn.Module):
    """40-attribute CelebA classifier (AnyCostGAN-style head on ResNet-50)."""

    num_attributes: int = 40

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """→ logits [N, num_attributes] (sigmoid for probabilities)."""
        x = resize_bilinear(images, 224)
        feats = ResNet50Features(name="trunk")(x)
        return nn.Dense(self.num_attributes, name="head")(feats)


def score_latents(
    generator_apply,  # (ws, transform) -> NHWC images in [-1, 1]
    scorer_apply,  # images -> scores [N] (pick one attribute/age/pose)
    ws: jax.Array,
    batch_size: int = 8,
) -> np.ndarray:
    """Batch-score latents for boundary training
    (generate_latents_and_attribute_scores.py flow, batched on TPU)."""
    scores = []
    for start in range(0, ws.shape[0], batch_size):
        chunk = ws[start:start + batch_size]
        imgs = generator_apply(chunk, None)
        scores.append(np.asarray(scorer_apply(imgs)))
    return np.concatenate(scores)[:, None]
