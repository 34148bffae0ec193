"""StyleCLIP latent mapper: per-level MLPs mapping W+ to an edit direction.

Parity: reference editing/styleclip_mapper/ — `Mapper` (4 equalized-LR
lrelu FCs on pixelnormed w, latent_mappers.py:9-31), `LevelsMapper`
(coarse :5 / medium 5:8 / fine 8:, :46-80), `StyleCLIPMapper`
(styleclip_mapper.py:15: w_hat = w + 0.1·mapper(w) → decode), and the mapper
coach (training/coach.py:70-100: CLIP + ID + latent-L2 losses).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..criteria.clip_loss import CLIPLoss
from ..criteria.id_loss import IDLoss
from ..models.sg3 import SG3Config
from ..models.sg3.generator import Generator
from ..models.sg3.layers import FullyConnected
from ..training.ranger import ranger


def pixel_norm(x: jax.Array) -> jax.Array:
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True)
                             + 1e-8)


class Mapper(nn.Module):
    latent_dim: int = 512

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = pixel_norm(x)
        for i in range(4):
            x = FullyConnected(self.latent_dim, activation="lrelu",
                               lr_multiplier=0.01, name=f"fc{i}")(x)
        return x


class LevelsMapper(nn.Module):
    """Coarse/medium/fine mappers over the W+ style axis."""

    no_coarse_mapper: bool = False
    no_medium_mapper: bool = False
    no_fine_mapper: bool = False
    latent_dim: int = 512

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        coarse, medium, fine = x[:, :5], x[:, 5:8], x[:, 8:]
        coarse = (jnp.zeros_like(coarse) if self.no_coarse_mapper
                  else Mapper(self.latent_dim, name="course_mapping")(coarse))
        medium = (jnp.zeros_like(medium) if self.no_medium_mapper
                  else Mapper(self.latent_dim, name="medium_mapping")(medium))
        fine = (jnp.zeros_like(fine) if self.no_fine_mapper
                else Mapper(self.latent_dim, name="fine_mapping")(fine))
        return jnp.concatenate([coarse, medium, fine], axis=1)


class StyleCLIPMapperNet(nn.Module):
    """mapper + frozen alias-free decoder."""

    decoder_cfg: SG3Config
    mapper_type: str = "LevelsMapper"

    def setup(self):
        self.mapper = (LevelsMapper() if self.mapper_type == "LevelsMapper"
                       else Mapper())
        self.decoder = Generator(self.decoder_cfg)

    def map_latents(self, w: jax.Array) -> jax.Array:
        return w + 0.1 * self.mapper(w)

    def __call__(self, w: jax.Array, force_fp32: bool = True):
        w_hat = self.map_latents(w)
        img = self.decoder.synthesize(w_hat, force_fp32=force_fp32)
        return img, w_hat


@dataclasses.dataclass
class MapperTrainOptions:
    """Parity: editing/styleclip_mapper/options/train_options.py."""

    exp_dir: str = "./experiments/mapper"
    description: str = "a face with a smile"
    mapper_type: str = "LevelsMapper"
    stylegan_size: int = 1024
    latents_train_path: Optional[str] = None
    latents_test_path: Optional[str] = None
    train_dataset_size: int = 5000
    batch_size: int = 2
    learning_rate: float = 0.5
    optim_name: str = "ranger"
    id_lambda: float = 0.1
    clip_lambda: float = 1.0
    latent_l2_lambda: float = 0.8
    max_steps: int = 50000
    val_interval: int = 2000
    save_interval: int = 2000
    board_interval: int = 50
    seed: int = 0


class MapperCoach:
    """Trains a StyleCLIP mapper toward a text description."""

    def __init__(self, opts: MapperTrainOptions, decoder_cfg: SG3Config,
                 decoder_variables: Optional[dict] = None,
                 clip_variables: Optional[dict] = None,
                 id_variables: Optional[dict] = None,
                 text_tokens: Optional[np.ndarray] = None):
        self.opts = opts
        self.net = StyleCLIPMapperNet(decoder_cfg, opts.mapper_type)
        w0 = jnp.zeros((1, decoder_cfg.num_ws, decoder_cfg.w_dim))
        self.variables = jax.jit(self.net.init)(jax.random.PRNGKey(opts.seed), w0)
        if decoder_variables is not None:
            for col in ("params", "buffers", "ema"):
                if col in decoder_variables:
                    self.variables[col] = dict(self.variables.get(col, {}))
                    self.variables[col]["decoder"] = decoder_variables[col]

        self.clip_loss = CLIPLoss(stylegan_size=decoder_cfg.img_resolution)
        img0 = jnp.zeros((1, decoder_cfg.img_resolution,
                          decoder_cfg.img_resolution, 3))
        tok0 = jnp.zeros((1, 77), jnp.int32)
        self.clip_variables = clip_variables or self.clip_loss.init(
            jax.random.PRNGKey(1), img0, tok0)
        self.id_loss = IDLoss()
        x0 = jnp.zeros((1, 256, 256, 3))
        self.id_variables = id_variables or self.id_loss.init(
            jax.random.PRNGKey(2), x0, x0, x0)
        assert text_tokens is not None, "tokenize the description first"
        self.text_tokens = jnp.asarray(text_tokens)

        self.tx = (ranger(opts.learning_rate) if opts.optim_name == "ranger"
                   else optax.adam(opts.learning_rate))
        self.opt_state = self.tx.init(self.variables["params"]["mapper"])
        self.global_step = 0
        self._step = jax.jit(self._step_impl)

    def _forward(self, variables, w, force_fp32=True):
        return self.net.apply(variables, w, force_fp32=force_fp32)

    def _loss(self, mapper_params, w):
        variables = dict(self.variables)
        variables["params"] = {**self.variables["params"],
                               "mapper": mapper_params}
        x, w_hat = self.net.apply(variables, w)
        metrics = {}
        loss = jnp.zeros((), jnp.float32)
        if self.opts.clip_lambda > 0:
            loss_clip = jnp.mean(self.clip_loss.apply(
                self.clip_variables, x, self.text_tokens))
            metrics["loss_clip"] = loss_clip
            loss += loss_clip * self.opts.clip_lambda
        if self.opts.id_lambda > 0:
            with_decoder = dict(self.variables)
            x_orig = self.net.apply(with_decoder, w,
                                    method=lambda m, w: m.decoder.synthesize(
                                        w, force_fp32=True))
            from ..ops.image import adaptive_avg_pool2d
            loss_id, _, _ = self.id_loss.apply(
                self.id_variables, adaptive_avg_pool2d(x, 256),
                adaptive_avg_pool2d(x_orig, 256),
                adaptive_avg_pool2d(x_orig, 256))
            metrics["loss_id"] = loss_id
            loss += loss_id * self.opts.id_lambda
        if self.opts.latent_l2_lambda > 0:
            loss_l2 = jnp.mean(jnp.square(w_hat - w))
            metrics["loss_l2_latent"] = loss_l2
            loss += loss_l2 * self.opts.latent_l2_lambda
        metrics["loss"] = loss
        return loss, metrics

    def _step_impl(self, mapper_params, opt_state, w):
        (_, metrics), grads = jax.value_and_grad(self._loss, has_aux=True)(
            mapper_params, w)
        updates, opt_state = self.tx.update(grads, opt_state, mapper_params)
        return optax.apply_updates(mapper_params, updates), opt_state, metrics

    def train_step(self, w_batch) -> Dict[str, float]:
        mp = self.variables["params"]["mapper"]
        mp, self.opt_state, metrics = self._step(mp, self.opt_state,
                                                 jnp.asarray(w_batch))
        self.variables["params"] = {**self.variables["params"], "mapper": mp}
        self.global_step += 1
        return {k: float(v) for k, v in metrics.items()}
