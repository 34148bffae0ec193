"""StyleGAN2 generator/discriminator (rosinality variant), flax NHWC.

Parity: reference models/stylegan2/model.py — `PixelNorm` (:11),
`EqualConv2d` (:91), `EqualLinear` (:129, ≡ sg3.layers.FullyConnected),
`ModulatedConv2d` with blur resampling (:178), `NoiseInjection` (:277),
`StyledConv` (:304), `ToRGB` (:341), skip-architecture `Generator` and
residual `Discriminator` with minibatch stddev. The rosinality CUDA kernels
(upfirdn2d_kernel.cu, fused_bias_act_kernel.cu) map to this repo's
ops (`upfirdn2d`, `bias_act`).

This family backs the StyleCLIP mapper's EqualLinear and provides the SG2
model zoo row of SURVEY.md §2d.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.bias_act import bias_act
from ..ops.filter_design import setup_filter
from ..ops.modulated_conv import modulated_conv2d
from ..ops.upfirdn2d import downsample2d, upfirdn2d, upsample2d
from .sg3.layers import FullyConnected

# rosinality EqualLinear(activation='fused_lrelu') ≡ FullyConnected lrelu.
EqualLinear = FullyConnected

_BLUR_KERNEL = (1, 3, 3, 1)


def pixel_norm(x: jax.Array) -> jax.Array:
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True)
                             + 1e-8)


class EqualConv2d(nn.Module):
    out_channels: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        w = self.param("weight", nn.initializers.normal(1.0),
                       (self.kernel, self.kernel, in_c, self.out_channels))
        scale = 1 / math.sqrt(in_c * self.kernel ** 2)
        y = jax.lax.conv_general_dilated(
            x, (w * scale).astype(x.dtype), (self.stride, self.stride),
            [(self.padding, self.padding)] * 2,
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, w.shape, ("NHWC", "HWIO", "NHWC")))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            y = y + b.astype(y.dtype)
        return y


class NoiseInjection(nn.Module):
    @nn.compact
    def __call__(self, x, noise: Optional[jax.Array] = None,
                 rng: Optional[jax.Array] = None):
        weight = self.param("weight", nn.initializers.zeros, ())
        if noise is None:
            if rng is None:
                return x  # 'const'/'none' mode
            noise = jax.random.normal(rng, x.shape[:3] + (1,), x.dtype)
        return x + weight.astype(x.dtype) * noise


class StyledConv(nn.Module):
    """ModulatedConv2d (+ optional blur-upsample) + noise + fused lrelu."""

    out_channels: int
    kernel: int = 3
    upsample: bool = False
    demodulate: bool = True

    @nn.compact
    def __call__(self, x, style_w, noise=None, rng=None):
        in_c = x.shape[-1]
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (self.kernel, self.kernel, in_c, self.out_channels))
        scale = 1 / math.sqrt(in_c * self.kernel ** 2)
        style = FullyConnected(in_c, bias_init=1.0, name="modulation")(style_w)
        if self.upsample:
            # rosinality up-conv = conv_transpose2d(stride 2) + Blur(pad 1,1)
            # — as a correlation that is the 2×-dilated conv with the
            # SPATIALLY FLIPPED kernel (pad k−1) followed by the 4-tap blur
            # with up² gain (same arithmetic verified exact for the NVIDIA
            # convention in tests/test_reference_parity.py).
            y = modulated_conv2d(x, (weight * scale)[::-1, ::-1], style,
                                 demodulate=self.demodulate,
                                 padding=self.kernel - 1, up=2)
            blur = setup_filter(_BLUR_KERNEL, gain=1)
            y = upfirdn2d(y, blur, padding=(1, 1, 1, 1), gain=4)
        else:
            y = modulated_conv2d(x, weight * scale, style,
                                 demodulate=self.demodulate,
                                 padding=self.kernel // 2)
        y = NoiseInjection(name="noise")(y, noise=noise, rng=rng)
        return bias_act(y, self.param("activate_bias", nn.initializers.zeros,
                                      (self.out_channels,)),
                        act="lrelu")


class ToRGB(nn.Module):
    upsample_skip: bool = True

    @nn.compact
    def __call__(self, x, style_w, skip=None):
        in_c = x.shape[-1]
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (1, 1, in_c, 3))
        style = FullyConnected(in_c, bias_init=1.0, name="modulation")(style_w)
        y = modulated_conv2d(x, weight / math.sqrt(in_c), style,
                             demodulate=False)
        y = y + self.param("bias", nn.initializers.zeros, (3,)).astype(y.dtype)
        if skip is not None:
            if self.upsample_skip:
                skip = upsample2d(skip, setup_filter(_BLUR_KERNEL), up=2)
            y = y + skip
        return y


class SG2Generator(nn.Module):
    """Skip-architecture StyleGAN2 generator. z → NHWC image.

    Full rosinality forward surface (reference models/stylegan2/model.py
    Generator.forward :419-500): multi-z STYLE MIXING with `inject_index`,
    `input_is_latent`, truncation lerp, `return_latents`, and a NOISE
    REGISTRY — per-layer 'noises' buffers (noise_0..noise_{2L-2}) used when
    ``noise_mode='const'`` so converted checkpoints reproduce reference
    outputs deterministically; ``rng`` draws fresh noise instead
    (randomize_noise=True)."""

    size: int = 256
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    lr_mlp: float = 0.01

    def channels(self):
        cm = self.channel_multiplier
        return {4: 512, 8: 512, 16: 512, 32: 512, 64: 256 * cm, 128: 128 * cm,
                256: 64 * cm, 512: 32 * cm, 1024: 16 * cm}

    @property
    def n_latent(self) -> int:
        return int(math.log(self.size, 2)) * 2 - 2

    def _style_fcs(self):
        return [FullyConnected(self.style_dim, activation="lrelu",
                               lr_multiplier=self.lr_mlp,
                               name=f"style_{i}")
                for i in range(self.n_mlp)]

    @staticmethod
    def _map_through(fcs, z: jax.Array) -> jax.Array:
        w = pixel_norm(z.astype(jnp.float32))
        for fc in fcs:
            w = fc(w)
        return w

    @nn.compact
    def mapping(self, z: jax.Array) -> jax.Array:
        """z → w (the rosinality `style` MLP; standalone entry point)."""
        return self._map_through(self._style_fcs(), z)

    @nn.compact
    def __call__(self, z=None,
                 styles: Optional[jax.Array] = None,
                 rng: Optional[jax.Array] = None,
                 noise_mode: str = "random",
                 truncation: float = 1.0,
                 truncation_latent: Optional[jax.Array] = None,
                 input_is_latent: bool = False,
                 inject_index: Optional[int] = None,
                 return_latents: bool = False):
        """`z`: a single [N, D] latent or a list of them (style mixing,
        reference model.py:435-466); `styles`: ready [N, n_latent, D] W+
        (bypasses mapping). noise_mode: 'random' (needs rng) | 'const'
        (registry buffers) | 'none'."""
        ch = self.channels()
        log_size = int(math.log(self.size, 2))

        if styles is None:
            assert z is not None
            zs = list(z) if isinstance(z, (list, tuple)) else [z]
            fcs = self._style_fcs()  # one set of submodules, reused per z
            ws = [jnp.asarray(s, jnp.float32) if input_is_latent
                  else self._map_through(fcs, s) for s in zs]
            if truncation != 1.0 and truncation_latent is not None:
                ws = [truncation_latent + truncation * (w - truncation_latent)
                      for w in ws]
            if len(ws) == 1:
                styles = jnp.repeat(ws[0][:, None, :], self.n_latent, axis=1)
            else:
                assert len(ws) == 2, "style mixing uses two latents"
                if inject_index is None:
                    inject_index = self.n_latent // 2
                styles = jnp.concatenate(
                    [jnp.repeat(ws[0][:, None, :], inject_index, axis=1),
                     jnp.repeat(ws[1][:, None, :],
                                self.n_latent - inject_index, axis=1)],
                    axis=1)

        n = styles.shape[0]
        const = self.param("input", nn.initializers.normal(1.0),
                           (1, 4, 4, ch[4]))
        x = jnp.broadcast_to(const, (n,) + const.shape[1:])

        # Noise registry: one buffer per conv (reference make_noise,
        # model.py:404-413); 'random' draws fresh, 'none' disables.
        num_convs = 2 * (log_size - 2) + 1

        def layer_noise(i, shape_hw):
            if noise_mode == "none" or (noise_mode == "random" and
                                        rng is None):
                return None, None  # rosinality noise=None w/o randomize
            if noise_mode == "const":
                buf = self.variable(
                    "noises", f"noise_{i}",
                    lambda: jnp.zeros((1,) + shape_hw + (1,), jnp.float32))
                return buf.value, None
            return None, jax.random.fold_in(rng, i)

        res0 = 4
        nz, nrng = layer_noise(0, (res0, res0))
        x = StyledConv(ch[4], name="conv1")(x, styles[:, 0], noise=nz,
                                            rng=nrng)
        skip = ToRGB(name="to_rgb1")(x, styles[:, 1])

        idx = 1
        noise_i = 1
        for res_log in range(3, log_size + 1):
            res = 2 ** res_log
            nz, nrng = layer_noise(noise_i, (res, res))
            x = StyledConv(ch[res], upsample=True,
                           name=f"conv_up_{res}")(x, styles[:, idx],
                                                  noise=nz, rng=nrng)
            nz, nrng = layer_noise(noise_i + 1, (res, res))
            x = StyledConv(ch[res], name=f"conv_{res}")(x, styles[:, idx + 1],
                                                        noise=nz, rng=nrng)
            skip = ToRGB(name=f"to_rgb_{res}")(x, styles[:, idx + 2], skip)
            idx += 2
            noise_i += 2
        if return_latents:
            return skip, styles
        return skip


class _DiscBlock(nn.Module):
    """Residual D block, rosinality ResBlock semantics (model.py:570-600):
    conv1 (3×3) + lrelu, then blur→stride-2 conv fused via
    `conv2d_resample(down=2)` (the reference's ConvLayer-downsample =
    Blur(pad 2,2) + stride-2 EqualConv2d — identical padding arithmetic,
    ops/conv2d_resample.py), 1×1 skip the same way, (y + skip)/√2."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        from ..ops.conv2d_resample import conv2d_resample

        in_c = x.shape[-1]
        blur = setup_filter(_BLUR_KERNEL)
        y = EqualConv2d(in_c, 3, padding=1, name="conv1")(x)
        y = bias_act(y, act="lrelu")
        w2 = self.param("conv2_weight", nn.initializers.normal(1.0),
                        (3, 3, in_c, self.out_channels))
        b2 = self.param("conv2_bias", nn.initializers.zeros,
                        (self.out_channels,))
        y = conv2d_resample(y, w2 / math.sqrt(in_c * 9), f=blur, down=2,
                            padding=1)
        y = bias_act(y, b2, act="lrelu")
        ws = self.param("skip_weight", nn.initializers.normal(1.0),
                        (1, 1, in_c, self.out_channels))
        skip = conv2d_resample(x, ws / math.sqrt(in_c), f=blur, down=2,
                               padding=0)
        return (y + skip) / math.sqrt(2)


class SG2Discriminator(nn.Module):
    size: int = 256
    channel_multiplier: int = 2

    @nn.compact
    def __call__(self, img: jax.Array) -> jax.Array:
        cm = self.channel_multiplier
        ch = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256 * cm, 128: 128 * cm,
              256: 64 * cm, 512: 32 * cm, 1024: 16 * cm}
        log_size = int(math.log(self.size, 2))
        x = EqualConv2d(ch[self.size], 1, name="from_rgb")(img)
        x = bias_act(x, act="lrelu")
        for res_log in range(log_size, 2, -1):
            x = _DiscBlock(ch[2 ** (res_log - 1)],
                           name=f"block_{2 ** res_log}")(x)
        # Minibatch stddev.
        n, h, w, c = x.shape
        group = min(4, n)
        y = x[: (n // group) * group].reshape(group, -1, h, w, c)
        stddev = jnp.sqrt(jnp.var(y, axis=0) + 1e-8)
        stddev = jnp.mean(stddev, axis=(1, 2, 3), keepdims=True)
        stddev = jnp.tile(stddev, (group, h, w, 1))
        x = jnp.concatenate([x, stddev[:n]], axis=-1)
        x = EqualConv2d(ch[4], 3, padding=1, name="final_conv")(x)
        x = bias_act(x, act="lrelu")
        x = x.reshape(n, -1)
        x = FullyConnected(ch[4], activation="lrelu", name="final_linear1")(x)
        return FullyConnected(1, name="final_linear2")(x)
