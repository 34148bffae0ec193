"""SetGAN generator: reference-set conditioned synthesis.

Parity: reference models/setgan/setgan.py — `StyleAttention` (per-style-index
set-transformer decoders attending noise styles to reference-set styles +
concat-project, :22-56) and `SetGAN` (encoder → mean-center vs w_avg →
StyleAttention(codes, mapped noise) → decode, forward :179-246), plus the
set↔image reshapes of setgan/utils.py:85-98.

The decoder is the TPU alias-free generator (the reference wraps its
StyleGAN-XL variant; the style-attention contract — [batch, set, n_styles,
w_dim] in/out — is decoder-agnostic). Set sizes are static maxima with
boolean masks; `latent_avg` is an explicit argument (functional state).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.encoders.backbones import ProgressiveBackboneEncoder
from ..models.sg3.config import SG3Config
from ..models.sg3.generator import Generator
from .set_transformer import SetTransformerDecoder


def make_stem(stem: str, cfg: SG3Config):
    """Decoder stem registry (reference train_setgan.py:324 stem choices):
    'sg3' (alias-free, default), 'sg2' (NVIDIA-convention StyleGAN2 XL aux
    net), 'fastgan' (projected-GAN lightweight stem). Returns (module,
    num_ws); every stem exposes `map`/`synthesize`."""
    if stem == "sg3":
        return Generator(cfg), cfg.num_ws
    if stem == "sg2":
        from ..models.sg2_stem import SG2Config, SG2Generator

        sg2_cfg = SG2Config(
            z_dim=cfg.z_dim, w_dim=cfg.w_dim,
            img_resolution=cfg.img_resolution,
            img_channels=cfg.img_channels,
            channel_base=cfg.channel_base, channel_max=cfg.channel_max,
            use_bf16=cfg.use_bf16, conv_clamp=cfg.conv_clamp)
        return SG2Generator(sg2_cfg), sg2_cfg.num_ws
    if stem == "fastgan":
        from ..models.fastgan import FastGANConfig, FastGANGenerator

        assert cfg.w_dim == cfg.z_dim, \
            "fastgan stem has no mapping net: w_dim must equal z_dim"
        fg_cfg = FastGANConfig(z_dim=cfg.z_dim,
                               img_resolution=cfg.img_resolution,
                               img_channels=cfg.img_channels)
        return FastGANGenerator(fg_cfg), fg_cfg.num_ws
    raise ValueError(f"unknown stem {stem!r}")


def to_images(x: jax.Array) -> jax.Array:
    """[B, S, ...] → [B·S, ...]."""
    return x.reshape((-1,) + x.shape[2:])


def to_set(x: jax.Array, batch: int) -> jax.Array:
    """[B·S, ...] → [B, S, ...]."""
    return x.reshape((batch, -1) + x.shape[1:])


def to_imgset(fn, x: jax.Array):
    """Apply an image-batch fn over a set tensor, preserving set shape."""
    batch = x.shape[0]
    return to_set(fn(to_images(x)), batch)


class StyleConcat(nn.Module):
    """Equalized 2D→D projection whose weight starts as [N(0, 0.2) | I]
    (attention output half random, passthrough half identity —
    reference init, setgan.py:40-43)."""

    latent: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        def init(key):
            a = 0.2 * jax.random.normal(key, (self.latent, self.latent))
            return jnp.concatenate([a, jnp.eye(self.latent)], axis=1)

        w = self.param("weight", init)
        b = self.param("bias", lambda key: jnp.zeros((self.latent,)))
        gain = 1 / np.sqrt(x.shape[-1])
        return x @ (w * gain).T + b


class StyleAttention(nn.Module):
    """Noise styles attend to reference-set styles, per style index."""

    n_styles: int
    latent: int = 512
    n_heads: int = 4
    attn_layers: int = 2
    use_set_decoder: bool = True
    use_temperature: bool = False
    disable_style_concat: bool = False

    @nn.compact
    def __call__(self, codes: jax.Array, style_latents: jax.Array,
                 ref_mask: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        """codes: [B, R, n_styles, D]; style_latents: [B, C, n_styles, D];
        ref_mask: [B, R] (True = valid reference). → [B, C, n_styles, D]."""
        mask = None
        if ref_mask is not None:
            mask = jnp.broadcast_to(
                ref_mask[:, None, :],
                (codes.shape[0], style_latents.shape[1], codes.shape[1]))
        outs = []
        for i in range(self.n_styles):
            attn = SetTransformerDecoder(
                self.latent, self.latent, self.latent * 2, self.n_heads,
                self.attn_layers, ln=True, activation="lrelu",
                self_attn=self.use_set_decoder, dropout=0.0,
                use_temperature=self.use_temperature, name=f"attn_{i}")
            out_i = attn(style_latents[:, :, i], codes[:, :, i], mask=mask,
                         train=train)
            if not self.disable_style_concat:
                cat = jnp.concatenate([out_i, style_latents[:, :, i]], axis=-1)
                out_i = StyleConcat(self.latent, name=f"style_concat_{i}")(cat)
            else:
                out_i = out_i + style_latents[:, :, i]
            outs.append(out_i)
        return jnp.stack(outs, axis=2)


class SetGAN(nn.Module):
    """Encoder + StyleAttention + alias-free decoder over sets."""

    decoder_cfg: SG3Config
    stem: str = "sg3"
    n_heads: int = 4
    attn_layers: int = 2
    mean_center: bool = True
    use_set_decoder: bool = True
    use_temperature: bool = False
    disable_style_concat: bool = False
    # ReStyle iterative reference encoding (reference --restyle_mode
    # encoder, models/setgan/restyle.py:7-41 + setgan.py:100-101): the
    # encoder consumes [reference, previous reconstruction] (6 channels)
    # and refines codes over `restyle_iters` residual steps starting from
    # the average latent/image.
    restyle_mode: str = "none"  # 'none' | 'encoder'
    restyle_iters: int = 3
    # Encoder family (reference --encoder_type, restyle_*_encoders.py).
    encoder_type: str = "ProgressiveBackboneEncoder"
    # IR(-SE) trunk depth for the IRSE encoder families (reference fixes 50;
    # 8 = the CI/dryrun minimal trunk, models/backbones/irse.get_blocks).
    encoder_num_layers: int = 50
    # Rematerialize the reference-set encoder: its B·R×256² IR-SE trunk
    # activations ([B·R,256,256,64] fp32 stem planes ×3, 2.3× layout
    # padding) are the measured HBM floor that keeps the canonical
    # batch 4/chip from fitting 16 GB (round-5g memory breakdown) — with
    # remat they live only inside the encoder's backward segment, after
    # the decoder/D stacks are freed. Costs one extra encoder forward.
    remat_encoder: bool = False

    def setup(self):
        from ..models.encoders.restyle import ENCODER_TYPES

        self.decoder, self._num_ws = make_stem(self.stem, self.decoder_cfg)
        enc_kwargs = {}
        if "ResNet" not in self.encoder_type:
            enc_kwargs["num_layers"] = self.encoder_num_layers
        self.encoder = ENCODER_TYPES[self.encoder_type](
            n_styles=self._num_ws, style_dim=self.decoder_cfg.w_dim,
            **enc_kwargs)
        self.style_attn = StyleAttention(
            n_styles=self._num_ws,
            latent=self.decoder_cfg.w_dim,
            n_heads=self.n_heads,
            attn_layers=self.attn_layers,
            use_set_decoder=self.use_set_decoder,
            use_temperature=self.use_temperature,
            disable_style_concat=self.disable_style_concat)

    @property
    def n_styles(self) -> int:
        return self._num_ws

    def _encode(self, imgs: jax.Array, train: bool) -> jax.Array:
        """Encoder call, optionally rematerialized (`remat_encoder`).

        Construct-then-remat-the-CALL — the same flax lifted-transform rule
        as FeatureProjector (setgan/discriminator.py): `train` stays a
        closed-over trace-time constant, the module rides as an argument.
        """
        if self.remat_encoder:
            return nn.remat(lambda m, xx: m(xx, train=train))(
                self.encoder, imgs)
        return self.encoder(imgs, train=train)

    def __call__(
        self,
        x: jax.Array,
        z: jax.Array,
        latent_avg: Optional[jax.Array] = None,
        ref_mask: Optional[jax.Array] = None,
        input_code: bool = False,
        return_latents: bool = False,
        update_emas: bool = False,
        train: bool = False,
        force_fp32: bool = False,
    ):
        """x: reference sets [B, R, H, W, 3]; z: noise [B, C, z_dim] (or
        pre-mapped [B, C, n_styles, w_dim] when input_code). Returns images
        [B, C, res, res, 3] (+ latents [B, C, n_styles, w_dim])."""
        if self.is_initializing():
            self.decoder.map(jnp.zeros((1, self.decoder_cfg.z_dim)))
        bs = x.shape[0]
        if self.mean_center:
            assert latent_avg is not None, "mean_center requires latent_avg"
            latent_avg = jnp.asarray(latent_avg)

        imgs = to_images(x)  # [B·R, H, W, 3]
        if self.restyle_mode == "encoder":
            # Restyle wrapper semantics (reference restyle.py:19-41): start
            # from (latent_avg, avg_image), iterate encoder([x, y]) as
            # residual code updates, decoding between iterations.
            from ..ops.image import resize_bilinear

            assert latent_avg is not None, "restyle needs latent_avg"
            n, enc_res = imgs.shape[0], imgs.shape[1]
            avg_codes = jnp.broadcast_to(
                latent_avg[None, None, :],
                (1, self._num_ws, latent_avg.shape[-1]))
            avg_image = self.decoder.synthesize(avg_codes,
                                                force_fp32=force_fp32)
            y = resize_bilinear(avg_image, enc_res)
            y = jnp.broadcast_to(y, imgs.shape)
            codes = jnp.broadcast_to(
                avg_codes, (n,) + avg_codes.shape[1:])
            for i in range(self.restyle_iters):
                delta = self._encode(
                    jnp.concatenate([imgs, y.astype(imgs.dtype)], axis=-1),
                    train=train)
                codes = codes + delta
                if i < self.restyle_iters - 1:
                    y = resize_bilinear(
                        self.decoder.synthesize(codes,
                                                force_fp32=force_fp32),
                        enc_res)
        else:
            codes = self._encode(imgs, train=train)  # [B·R, n_styles, D]
        if self.mean_center:
            codes = codes - latent_avg[None, None, :]
        codes = to_set(codes, bs)  # [B, R, n_styles, D]

        if input_code:
            style_latents = z
        else:
            style_latents = self.decoder.map(
                z.reshape(-1, z.shape[-1]), update_emas=update_emas)
            if self.mean_center:
                style_latents = style_latents - latent_avg[None, None, :]
            style_latents = to_set(style_latents, bs)  # [B, C, n_styles, D]

        transformed = self.style_attn(codes, style_latents, ref_mask=ref_mask,
                                      train=train)
        if self.mean_center:
            transformed = transformed + latent_avg[None, None, None, :]

        decoder_inputs = transformed.reshape((-1,) + transformed.shape[2:])
        images = self.decoder.synthesize(decoder_inputs,
                                         force_fp32=force_fp32)
        images = to_set(images, bs)
        if return_latents:
            return images, transformed
        return images
