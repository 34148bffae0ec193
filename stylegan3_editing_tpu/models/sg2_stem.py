"""NVIDIA-convention StyleGAN2 generator — the XL aux stem.

Parity target: /root/reference/models/styleganxl/training/
networks_stylegan2.py (852 LoC): 8-layer mapping with w_avg EMA, synthesis
blocks b4..bN (conv0 up ×2, conv1, skip-architecture ToRGB with an
upsampled RGB skip), per-layer noise injection, [1,3,3,1] resample filter —
selectable as a SetGAN stem next to the alias-free SG3 decoder
(train_setgan.py:324).

TPU-first: NHWC, one batch-shared modulated conv (ops/modulated_conv.py)
instead of grouped per-sample convs; up-convs run as input-dilated convs +
FIR blur (the conv2d_resample composition); noise is a fresh normal draw
per call from an explicit rng (functional, no buffers); bf16 for the
`num_fp16_res` top resolutions.

Weight naming mirrors the torch state dict (synthesis.b{r}.conv0.*, …) so
`convert_sg2_state` composes with the TF1 legacy remap
(models/sg3/persistence.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.modulated_conv import modulated_conv2d
from ..ops.upfirdn2d import upfirdn2d, upsample2d
from .sg3.layers import FullyConnected, MappingNetwork

_BLUR = np.array([1.0, 3.0, 3.0, 1.0])
_BLUR = _BLUR / _BLUR.sum()


@dataclasses.dataclass(frozen=True)
class SG2Config:
    z_dim: int = 512
    w_dim: int = 512
    img_resolution: int = 256
    img_channels: int = 3
    channel_base: int = 32768
    channel_max: int = 512
    mapping_layers: int = 8
    mapping_lr_multiplier: float = 0.01
    w_avg_beta: float = 0.998
    num_fp16_res: int = 4
    use_bf16: bool = True
    conv_clamp: Optional[float] = 256.0

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @property
    def block_resolutions(self):
        return [2 ** i for i in range(2, int(np.log2(self.img_resolution)) + 1)]

    @property
    def num_ws(self) -> int:
        # 1 conv at b4 + 2 per later block, plus one extra: each block's
        # ToRGB consumes the NEXT block's first w (the last block's ToRGB
        # gets a final extra w) — reference networks_stylegan2.py w-broadcast
        # layout (SynthesisNetwork.forward narrows num_conv+num_torgb per
        # block but advances w_idx by num_conv only).
        return 2 * len(self.block_resolutions)


def _lrelu(x, gain=np.sqrt(2)):
    return jnp.where(x >= 0, x, 0.2 * x) * np.float32(gain)


class SG2Layer(nn.Module):
    """Modulated 3×3 conv + noise + bias + lrelu (SynthesisLayer)."""

    out_channels: int
    w_dim: int
    up: bool = False
    clamp: Optional[float] = 256.0

    @nn.compact
    def __call__(self, x, w, rng):
        in_ch = x.shape[-1]
        styles = FullyConnected(in_ch, bias_init=1.0, name="affine")(w)
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (3, 3, in_ch, self.out_channels))
        if self.up:
            # Reference up-conv = conv2d_resample(up=2, padding=k//2,
            # flip_weight=False) → transpose-conv: correlate the 2×-dilated
            # input with the SPATIALLY FLIPPED kernel (pad k−1), then the
            # [1,3,3,1] blur with pad (1,1) and up² gain
            # (networks_stylegan2.py SynthesisLayer + conv2d_resample up
            # path); verified exact in tests/test_reference_parity.py.
            x = modulated_conv2d(x, weight[::-1, ::-1], styles, padding=2,
                                 up=2)
            x = upfirdn2d(x, _BLUR, padding=(1, 1, 1, 1), gain=4)
        else:
            x = modulated_conv2d(x, weight, styles, padding=1)
        noise_strength = self.param("noise_strength", nn.initializers.zeros, ())
        noise = jax.random.normal(rng, x.shape[:3] + (1,), x.dtype)
        x = x + noise * noise_strength.astype(x.dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        x = _lrelu(x + bias.astype(x.dtype))
        if self.clamp is not None:
            x = jnp.clip(x, -self.clamp, self.clamp)
        return x


class SG2ToRGB(nn.Module):
    out_channels: int = 3

    @nn.compact
    def __call__(self, x, w):
        in_ch = x.shape[-1]
        styles = FullyConnected(in_ch, bias_init=1.0, name="affine")(w)
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (1, 1, in_ch, self.out_channels))
        x = modulated_conv2d(x, weight, styles / np.sqrt(in_ch),
                             demodulate=False)
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return x + bias.astype(x.dtype)


class SG2Block(nn.Module):
    """One resolution block: [conv0 up] + conv1 + ToRGB skip accumulate."""

    cfg: SG2Config
    res: int

    @nn.compact
    def __call__(self, x, img, ws, rng, w_idx, dtype):
        cfg = self.cfg
        out_ch = cfg.channels(self.res)
        if self.res == 4:
            const = self.param("const", nn.initializers.normal(1.0),
                               (4, 4, out_ch))
            x = jnp.broadcast_to(const[None], (ws.shape[0],) + const.shape)
            x = x.astype(dtype)
            x = SG2Layer(out_ch, cfg.w_dim, clamp=cfg.conv_clamp,
                         name="conv1")(x, ws[:, w_idx],
                                       jax.random.fold_in(rng, self.res))
            w_idx += 1
        else:
            x = x.astype(dtype)
            x = SG2Layer(out_ch, cfg.w_dim, up=True, clamp=cfg.conv_clamp,
                         name="conv0")(x, ws[:, w_idx],
                                       jax.random.fold_in(rng, self.res))
            x = SG2Layer(out_ch, cfg.w_dim, clamp=cfg.conv_clamp,
                         name="conv1")(x, ws[:, w_idx + 1],
                                       jax.random.fold_in(rng, self.res * 2 + 1))
            w_idx += 2
        # ToRGB consumes the NEXT w (ws[:, w_idx], already advanced past
        # this block's convs) — matches the reference's per-block
        # narrow(num_conv + num_torgb) overlap.
        y = SG2ToRGB(cfg.img_channels, name="torgb")(x, ws[:, w_idx])
        img = y if img is None else upsample2d(
            img, _BLUR, up=2) + y.astype(img.dtype)
        return x, img, w_idx


class SG2Generator(nn.Module):
    """Mapping + synthesis; same stem API as the SG3 Generator
    (`map` / `synthesize` / `num_ws`)."""

    cfg: SG2Config

    def setup(self):
        cfg = self.cfg
        self.mapping = MappingNetwork(
            z_dim=cfg.z_dim, c_dim=0, w_dim=cfg.w_dim, num_ws=cfg.num_ws,
            num_layers=cfg.mapping_layers,
            lr_multiplier=cfg.mapping_lr_multiplier,
            w_avg_beta=cfg.w_avg_beta)
        self.blocks = [SG2Block(cfg, res, name=f"b{res}")
                       for res in cfg.block_resolutions]

    @property
    def num_ws(self) -> int:
        return self.cfg.num_ws

    def map(self, z: jax.Array, truncation_psi: float = 1.0,
            update_emas: bool = False) -> jax.Array:
        return self.mapping(z, truncation_psi=truncation_psi,
                            update_emas=update_emas)

    def synthesize(self, ws: jax.Array, rng: Optional[jax.Array] = None,
                   force_fp32: bool = False) -> jax.Array:
        cfg = self.cfg
        if rng is None:
            rng = jax.random.PRNGKey(0)
        resolutions = cfg.block_resolutions
        fp16_start = (len(resolutions) - cfg.num_fp16_res
                      if cfg.use_bf16 and not force_fp32 else len(resolutions))
        x, img, w_idx = None, None, 0
        for i, res in enumerate(resolutions):
            dtype = jnp.bfloat16 if i >= fp16_start else jnp.float32
            x, img, w_idx = self.blocks[i](x, img, ws, rng, w_idx,
                                           dtype)
        return img.astype(jnp.float32)

    def __call__(self, z: jax.Array, truncation_psi: float = 1.0,
                 update_emas: bool = False,
                 rng: Optional[jax.Array] = None) -> jax.Array:
        ws = self.map(z, truncation_psi=truncation_psi,
                      update_emas=update_emas)
        return self.synthesize(ws, rng=rng)


def convert_sg2_state(state: Dict[str, np.ndarray], cfg: SG2Config) -> dict:
    """torch-style `networks_stylegan2` state dict (incl. TF1-converted,
    persistence.convert_tf_generator_state output) → flax variables."""
    params: dict = {}
    ema: dict = {}

    def assign(path, v):
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(v)

    for name, v in state.items():
        parts = name.split(".")
        v = np.asarray(v)
        if name == "mapping.w_avg":
            ema["mapping"] = {"w_avg": jnp.asarray(v)}
        elif parts[0] == "mapping" and parts[1].startswith("fc"):
            assign(("mapping", parts[1], parts[2]), v)
        elif parts[0] == "synthesis" and parts[1].startswith("b"):
            block, mod = parts[1], parts[2]
            if mod == "const":
                assign((block, "const"), v.transpose(1, 2, 0))  # CHW→HWC
            elif parts[-1] in ("resample_filter", "noise_const"):
                # static blur taps / const-noise buffers: not parameters
                # here (taps recomputed; noise is functional).
                pass
            elif parts[-1] == "weight" and parts[-2] in ("conv0", "conv1",
                                                         "torgb", "skip"):
                assign((block, parts[-2], "weight"),
                       v.transpose(2, 3, 1, 0))  # OIHW→HWIO
            elif len(parts) >= 5 and parts[3] == "affine":
                assign((block, parts[2], "affine", parts[4]), v)
            elif parts[-1] in ("bias", "noise_strength"):
                assign((block, parts[2], parts[-1]), v)
    return {"params": params, "ema": ema}
