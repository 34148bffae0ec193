"""Alias-free synthesis network (flax.linen, NHWC, bf16 policy).

Parity targets: `SynthesisInput`
(/root/reference/models/stylegan3/networks_stylegan3.py:168-249),
`SynthesisLayer` (:259-368), `SynthesisNetwork` (:405-525) including the
fork's StyleSpace additions (precomputed transform `t`, precomputed per-layer
`styles`, and `W2S`).

TPU-first re-design decisions:
- The user transform is an explicit **argument** (identity by default), not a
  mutated buffer — this functionalizes the reference's
  `synthesis.input.transform` writes and makes the aligned/unaligned dual
  decode a single batched call with two transforms.
- EMAs (`magnitude_ema`) live in the 'ema' collection, updated functionally.
- fp16 → bfloat16: the reference's per-layer fp16 policy maps to bf16 on TPU
  (wider exponent range; `conv_clamp` retained for parity).
- Activations stay NHWC throughout (TPU conv-friendly layout).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.filtered_lrelu import filtered_lrelu
from ...ops.modulated_conv import modulated_conv2d
from .config import (
    InputSpec,
    LayerSpec,
    SG3Config,
    SynthesisLayout,
    build_synthesis_layout,
)
from .layers import FullyConnected

_SQRT2 = float(np.sqrt(2))


def transform_from_t(t: jax.Array, user_transform: Optional[jax.Array],
                     batch: int) -> jax.Array:
    """Compose the learned (rotation, translation) with a user transform.

    ``t = (r_c, r_s, t_x, t_y)`` (already unit-normalized in its first two
    components). Returns ``[N, 3, 3]`` inverse transforms w.r.t. the image.
    """
    r_c, r_s, t_x, t_y = t[:, 0], t[:, 1], t[:, 2], t[:, 3]
    zeros = jnp.zeros_like(r_c)
    ones = jnp.ones_like(r_c)
    # Inverse rotation then inverse translation (row-major [N, 3, 3]).
    m_r = jnp.stack([
        jnp.stack([r_c, -r_s, zeros], axis=-1),
        jnp.stack([r_s, r_c, zeros], axis=-1),
        jnp.stack([zeros, zeros, ones], axis=-1),
    ], axis=-2)
    m_t = jnp.stack([
        jnp.stack([ones, zeros, -t_x], axis=-1),
        jnp.stack([zeros, ones, -t_y], axis=-1),
        jnp.stack([zeros, zeros, ones], axis=-1),
    ], axis=-2)
    out = m_r @ m_t
    if user_transform is not None:
        u = jnp.asarray(user_transform, jnp.float32)
        if u.ndim == 2:
            u = u[None]
        out = out @ u
    return jnp.broadcast_to(out, (batch, 3, 3))


class SynthesisInput(nn.Module):
    """Fourier-feature input stage.

    Random disc frequencies/phases are 'buffers' variables (initialized from
    the spec, overwritten by checkpoint loads). The learned affine maps w to
    a (rotation, translation) applied to the frequencies; the optional user
    ``transform`` ([3, 3] or [N, 3, 3]) composes on top. Output: NHWC.
    """

    spec: InputSpec

    def setup(self):
        s = self.spec
        self.weight = self.param(
            "weight",
            lambda key: jax.random.normal(key, (s.channels, s.channels), jnp.float32),
        )
        self.affine = FullyConnected(4, weight_init=0.0, bias_init=(1, 0, 0, 0))
        self.freqs = self.variable("buffers", "freqs", lambda: jnp.asarray(s.freqs))
        self.phases = self.variable("buffers", "phases", lambda: jnp.asarray(s.phases))

    def compute_t(self, w: jax.Array) -> jax.Array:
        """w → unit-normalized (r_c, r_s, t_x, t_y); the 'input' StyleSpace entry."""
        t = self.affine(w.astype(jnp.float32))
        return t / jnp.linalg.norm(t[:, :2], axis=1, keepdims=True)

    def __call__(
        self,
        w: Optional[jax.Array],
        transform: Optional[jax.Array] = None,
        t: Optional[jax.Array] = None,
    ) -> jax.Array:
        s = self.spec
        if t is None:
            assert w is not None
            t = self.compute_t(w)
            batch = w.shape[0]
        else:
            batch = t.shape[0]

        transforms = transform_from_t(t, transform, batch)

        freqs = self.freqs.value[None]  # [1, C, 2]
        phases = self.phases.value[None]  # [1, C]
        phases = phases + jnp.einsum("bck,bk->bc",
                                     jnp.broadcast_to(freqs, (batch, s.channels, 2)),
                                     transforms[:, :2, 2])
        freqs = jnp.einsum("bck,bkl->bcl",
                           jnp.broadcast_to(freqs, (batch, s.channels, 2)),
                           transforms[:, :2, :2])

        # Dampen frequencies pushed out of band by the user transform.
        amplitudes = jnp.clip(
            1 - (jnp.linalg.norm(freqs, axis=2) - s.bandwidth)
            / (s.sampling_rate / 2 - s.bandwidth),
            0, 1)

        # Pixel-center sampling grid (torch affine_grid, align_corners=False).
        width, height = s.size
        gx = ((2 * jnp.arange(width, dtype=jnp.float32) + 1) / width - 1) \
            * (0.5 * width / s.sampling_rate)
        gy = ((2 * jnp.arange(height, dtype=jnp.float32) + 1) / height - 1) \
            * (0.5 * height / s.sampling_rate)

        # Fourier features: sin(2π (g·f + φ)) · amplitude, NHWC.
        x = (gx[None, None, :, None] * freqs[:, None, None, :, 0]
             + gy[None, :, None, None] * freqs[:, None, None, :, 1]
             + phases[:, None, None, :])
        x = jnp.sin(x * (2 * np.pi))
        x = x * amplitudes[:, None, None, :]

        # Learned channel mapping ([out, in] layout, equalized gain).
        x = x @ (self.weight / np.sqrt(s.channels)).T
        assert x.shape == (batch, height, width, s.channels)
        return x


class SynthesisLayer(nn.Module):
    """One alias-free layer: affine → modulated conv → filtered lrelu.

    `styles` may be passed directly (StyleSpace path); `update_emas` tracks
    the input-magnitude EMA used as conv input gain.
    """

    spec: LayerSpec

    def setup(self):
        s = self.spec
        self.affine = FullyConnected(s.in_channels, bias_init=1.0)
        self.weight = self.param(
            "weight",
            lambda key: jax.random.normal(
                key, (s.conv_kernel, s.conv_kernel, s.in_channels, s.out_channels),
                jnp.float32),
        )
        self.bias = self.param(
            "bias", lambda key: jnp.zeros((s.out_channels,), jnp.float32))
        self.magnitude_ema = self.variable(
            "ema", "magnitude_ema", lambda: jnp.ones((), jnp.float32))
        if s.up_filter is not None:
            self.up_filter = self.variable(
                "buffers", "up_filter", lambda: jnp.asarray(s.up_filter))
        if s.down_filter is not None:
            self.down_filter = self.variable(
                "buffers", "down_filter", lambda: jnp.asarray(s.down_filter))

    def compute_styles(self, w: jax.Array) -> jax.Array:
        """w → per-layer styles; the layer's StyleSpace entry."""
        s = self.spec
        styles = self.affine(w.astype(jnp.float32))
        if s.is_torgb:
            styles = styles * (1 / np.sqrt(s.in_channels * s.conv_kernel ** 2))
        return styles

    def __call__(
        self,
        x: jax.Array,
        w: Optional[jax.Array] = None,
        styles: Optional[jax.Array] = None,
        force_fp32: bool = False,
        update_emas: bool = False,
    ) -> jax.Array:
        s = self.spec
        assert x.shape[1:] == (s.in_size[1], s.in_size[0], s.in_channels), (
            f"{s.name}: got {x.shape}")

        if update_emas and not self.is_initializing():
            mag = jax.lax.stop_gradient(
                jnp.mean(jnp.square(x.astype(jnp.float32))))
            self.magnitude_ema.value = mag + s.magnitude_ema_beta * (
                self.magnitude_ema.value - mag)
        input_gain = jax.lax.rsqrt(self.magnitude_ema.value)

        if styles is None:
            assert w is not None and w.shape == (x.shape[0], s.w_dim)
            styles = self.compute_styles(w)

        dtype = jnp.bfloat16 if (s.use_bf16 and not force_fp32) else jnp.float32
        x = modulated_conv2d(
            x.astype(dtype), self.weight, styles,
            demodulate=not s.is_torgb,
            padding=s.conv_kernel - 1,
            input_gain=input_gain,
        )

        # Use the static (numpy) spec filters: they are deterministic from
        # the config (and equal to any converted checkpoint's buffers), and
        # static taps unlock the polyphase shift-and-add fast path incl.
        # exact SVD separation of the radial filters. The buffer variables
        # stay registered for checkpoint round-trips.
        up_f = s.up_filter
        down_f = s.down_filter

        x = filtered_lrelu(
            x, fu=up_f, fd=down_f, b=self.bias.astype(x.dtype),
            up=s.up_factor, down=s.down_factor, padding=s.padding,
            gain=1.0 if s.is_torgb else _SQRT2,
            slope=1.0 if s.is_torgb else 0.2,
            clamp=s.conv_clamp,
            impl="auto",
        )
        assert x.shape[1:] == (s.out_size[1], s.out_size[0], s.out_channels)
        assert x.dtype == dtype
        return x


class SynthesisNetwork(nn.Module):
    """Stack of Fourier input + N+1 alias-free layers. NHWC in/out.

    ``all_s`` takes the StyleSpace dict produced by `w2s`
    ({'input': t, layer_name: styles}) and bypasses every affine.
    """

    cfg: SG3Config

    def setup(self):
        import os

        layout = build_synthesis_layout(self.cfg)
        self.input = SynthesisInput(layout.input)
        env = os.environ.get("SG3TPU_REMAT")
        remat_on = self.cfg.remat if env is None else env == "1"
        # Per-layer rematerialization: each layer's activations are
        # recomputed in the backward pass instead of stored, shrinking the
        # 1024² grad graph to compilable size (SURVEY §7 "hard parts").
        layer_cls = (nn.remat(SynthesisLayer, static_argnums=(4, 5))
                     if remat_on else SynthesisLayer)
        for spec in layout.layers:
            setattr(self, spec.name, layer_cls(spec))

    @property
    def layout(self) -> SynthesisLayout:
        return build_synthesis_layout(self.cfg)

    @property
    def num_ws(self) -> int:
        return self.layout.num_ws

    def __call__(
        self,
        ws: Optional[jax.Array],
        transform: Optional[jax.Array] = None,
        all_s: Optional[Dict[str, jax.Array]] = None,
        force_fp32: bool = False,
        update_emas: bool = False,
    ) -> jax.Array:
        layout = self.layout
        if all_s is None:
            assert ws is not None and ws.shape[1:] == (layout.num_ws, self.cfg.w_dim)
            ws = ws.astype(jnp.float32)
            x = self.input(ws[:, 0], transform=transform)
            for i, spec in enumerate(layout.layers):
                layer: SynthesisLayer = getattr(self, spec.name)
                # positional args: nn.remat static_argnums needs them
                x = layer(x, ws[:, i + 1], None, force_fp32, update_emas)
        else:
            x = self.input(None, transform=transform, t=all_s["input"])
            for spec in layout.layers:
                layer = getattr(self, spec.name)
                x = layer(x, None, all_s[spec.name], force_fp32,
                          update_emas)

        if self.cfg.output_scale != 1:
            x = x * jnp.asarray(self.cfg.output_scale, x.dtype)
        assert x.shape[1:] == (self.cfg.img_resolution, self.cfg.img_resolution,
                               self.cfg.img_channels)
        return x.astype(jnp.float32)

    def w2s(self, ws: jax.Array) -> Dict[str, jax.Array]:
        """Project W+ latents to StyleSpace (shares the forward affines).

        Parity: fork's `SynthesisNetwork.W2S` (networks_stylegan3.py:503-525).
        """
        layout = self.layout
        ws = ws.astype(jnp.float32)
        all_s: Dict[str, jax.Array] = {"input": self.input.compute_t(ws[:, 0])}
        for i, spec in enumerate(layout.layers):
            layer: SynthesisLayer = getattr(self, spec.name)
            all_s[spec.name] = layer.compute_styles(ws[:, i + 1])
        return all_s
