"""FastGAN generator — the lightweight projected-GAN stem.

Parity target: /root/reference/models/styleganxl/training/
networks_fastgan.py (181 LoC) + pg_modules/blocks.py: z → 4×4 init
(transpose-conv + norm + GLU) → nearest-upsample UpBlocks (conv 3×3,
noise, norm, GLU — the 'big' variant runs the chain twice) with
skip-layer-excitation (SEBlock) links from low-res to high-res features →
3×3 to-RGB. `DummyMapping` lifts z to the [N, 1, z_dim] StyleGAN ws API.

TPU-first: NHWC; GroupNorm replaces BatchNorm (no running stats to thread
through jit; the reference's own blocks.py offers the same switch); the
reference wraps convs in spectral_norm — approximated here with equalized
weight gains (1/sqrt(fan_in)), the same Lipschitz-control role without
power-iteration state. Noise injection is a fresh draw from an explicit rng.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_NFC_MULTI = {2: 16, 4: 16, 8: 8, 16: 4, 32: 2, 64: 2, 128: 1,
              256: 0.5, 512: 0.25, 1024: 0.125}


@dataclasses.dataclass(frozen=True)
class FastGANConfig:
    z_dim: int = 256
    img_resolution: int = 256
    img_channels: int = 3
    ngf: int = 128
    lite: bool = False

    def nfc(self, res: int) -> int:
        return int(_NFC_MULTI[res] * self.ngf)

    @property
    def num_ws(self) -> int:
        return 1

    @property
    def w_dim(self) -> int:
        return self.z_dim


def _glu(x):
    c = x.shape[-1] // 2
    return x[..., :c] * jax.nn.sigmoid(x[..., c:])


class _Conv(nn.Module):
    features: int
    kernel: int = 3
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1] * self.kernel ** 2
        w = self.param("weight", nn.initializers.normal(1.0),
                       (self.kernel, self.kernel, x.shape[-1], self.features))
        y = jax.lax.conv_general_dilated(
            x, (w / np.sqrt(fan_in)).astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class InitLayer(nn.Module):
    """z → [4, 4, C] via transpose conv + GroupNorm + GLU."""

    channels: int

    @nn.compact
    def __call__(self, z):
        w = self.param("weight", nn.initializers.normal(1.0),
                       (4, 4, z.shape[-1], self.channels * 2))
        x = jnp.einsum("nz,hwzc->nhwc", z / np.sqrt(z.shape[-1]), w)
        x = nn.GroupNorm(num_groups=self.channels)(x)
        return _glu(x)


class UpBlock(nn.Module):
    """Nearest ×2 upsample + conv/noise/norm/GLU (twice unless lite)."""

    channels: int
    lite: bool

    @nn.compact
    def __call__(self, x, rng):
        n, h, w_, _ = x.shape
        x = jax.image.resize(x, (n, h * 2, w_ * 2, x.shape[-1]), "nearest")

        def half(x, idx):
            x = _Conv(self.channels * 2, name=f"conv{idx}")(x)
            if not self.lite:
                strength = self.param(f"noise_strength{idx}",
                                      nn.initializers.zeros, ())
                noise = jax.random.normal(jax.random.fold_in(rng, idx),
                                          x.shape[:3] + (1,), x.dtype)
                x = x + noise * strength.astype(x.dtype)
            x = nn.GroupNorm(num_groups=self.channels,
                             name=f"norm{idx}")(x)
            return _glu(x)

        x = half(x, 0)
        if not self.lite:
            x = half(x, 1)
        return x


class SEBlock(nn.Module):
    """Skip-layer excitation: small features gate big features."""

    channels: int

    @nn.compact
    def __call__(self, small, big):
        s = nn.avg_pool(small, (small.shape[1] // 4, small.shape[2] // 4),
                        strides=(small.shape[1] // 4, small.shape[2] // 4))
        s = _Conv(self.channels, kernel=4, name="conv4")(s)  # 4x4 → 1x1
        s = s[:, :1, :1, :]
        s = s * jax.nn.sigmoid(s)  # swish
        s = _Conv(self.channels, kernel=1, use_bias=True, name="conv1")(s)
        return big * jax.nn.sigmoid(s)


class FastGANGenerator(nn.Module):
    """FastGAN synthesis with the stem API (`map`/`synthesize`/`num_ws`)."""

    cfg: FastGANConfig

    @property
    def num_ws(self) -> int:
        return 1

    def map(self, z: jax.Array, truncation_psi: float = 1.0,
            update_emas: bool = False) -> jax.Array:
        # DummyMapping (networks_fastgan.py:13-18): lift to ws API.
        return z[:, None, :]

    @nn.compact
    def synthesize(self, ws: jax.Array, rng: Optional[jax.Array] = None,
                   force_fp32: bool = False) -> jax.Array:
        cfg = self.cfg
        if rng is None:
            rng = jax.random.PRNGKey(0)
        z = ws[:, 0]
        # second-moment normalization (networks_fastgan.py:9-10)
        z = z * jax.lax.rsqrt(jnp.mean(jnp.square(z), axis=-1,
                                       keepdims=True) + 1e-8)
        feats = {}
        x = InitLayer(cfg.nfc(2), name="init")(z)
        feats[4] = x
        res = 8
        while res <= cfg.img_resolution:
            x = UpBlock(cfg.nfc(res), cfg.lite, name=f"feat_{res}")(
                x, jax.random.fold_in(rng, res))
            if res in (64, 128, 256, 512) and res // 16 in feats:
                x = SEBlock(cfg.nfc(res), name=f"se_{res}")(
                    feats[res // 16], x)
            feats[res] = x
            res *= 2
        img = _Conv(cfg.img_channels, use_bias=True, name="to_big")(x)
        return img.astype(jnp.float32)

    def __call__(self, z: jax.Array,
                 rng: Optional[jax.Array] = None) -> jax.Array:
        return self.synthesize(self.map(z), rng=rng)
