"""Set transformer blocks (flax, mask-aware).

Parity: reference models/setgan/set.py — `MHA` (optionally
temperature-scaled, :11-44), `SetAttentionBlock` (:46), `SetEncoderBlock` /
`SetDecoderBlock` (:75/:83), `SetTransformerEncoder/Decoder` (:126/:141),
`MultiSetAttentionBlock` / `MultiSetTransformerEncoder` (:169/:233), `PMA`
pooling (:258).

TPU-first: variable set sizes (the reference randomizes 7–12 reference /
1–4 candidate images per step) are handled by padding to static maxima and
passing boolean masks — no recompilation per size (SURVEY.md §7.9).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def masked_softmax(logits: jax.Array, mask: Optional[jax.Array],
                   axis: int = -1) -> jax.Array:
    if mask is None:
        return jax.nn.softmax(logits, axis=axis)
    neg = jnp.asarray(-1e9, logits.dtype)
    logits = jnp.where(mask, logits, neg)
    probs = jax.nn.softmax(logits, axis=axis)
    # Rows with no valid key → zero attention (not NaN).
    any_valid = jnp.any(mask, axis=axis, keepdims=True)
    return jnp.where(any_valid, probs, 0.0)


class MHA(nn.Module):
    """Multi-head attention over sets: Q [N,Tq,Dq] attends K [N,Tk,Dk]."""

    dim_v: int
    num_heads: int
    use_bias: bool = True
    use_temperature: bool = False

    @nn.compact
    def __call__(self, q: jax.Array, k: jax.Array,
                 mask: Optional[jax.Array] = None,
                 return_weights: bool = False):
        dv, h = self.dim_v, self.num_heads
        hd = dv // h
        q_ = nn.Dense(dv, use_bias=self.use_bias, name="w_q")(q)
        k_ = nn.Dense(dv, use_bias=self.use_bias, name="w_k")(k)
        v_ = nn.Dense(dv, use_bias=self.use_bias, name="w_v")(k)

        def split(a):
            return a.reshape(a.shape[0], a.shape[1], h, hd).transpose(0, 2, 1, 3)

        q_, k_, v_ = split(q_), split(k_), split(v_)
        # Reference scales by sqrt(latent_size), NOT sqrt(head_dim) (set.py:34).
        logits = jnp.einsum("nhqd,nhkd->nhqk", q_, k_) / np.sqrt(dv)
        if self.use_temperature:
            temp = self.param("temperature", lambda key: jnp.ones((), jnp.float32))
            logits = logits * temp
        m = None
        if mask is not None:
            # mask: [N, Tq, Tk] or [N, 1, Tk] → broadcast over heads.
            m = mask[:, None, :, :] if mask.ndim == 3 else mask
        attn = masked_softmax(logits, m, axis=-1)
        out = jnp.einsum("nhqk,nhkd->nhqd", attn, v_)
        out = out.transpose(0, 2, 1, 3).reshape(q.shape[0], q.shape[1], dv)
        out = nn.Dense(dv, use_bias=self.use_bias, name="w_o")(out)
        if return_weights:
            return out, attn
        return out


class SetAttentionBlock(nn.Module):
    """Pre-residual attention + MLP with optional LayerNorms."""

    latent_size: int
    hidden_size: int
    num_heads: int
    ln: bool = True
    dropout: float = 0.1
    activation: str = "relu"

    @nn.compact
    def __call__(self, q, k, mask=None, train: bool = False):
        act = nn.relu if self.activation == "relu" else (
            lambda x: nn.leaky_relu(x, 0.01))
        a = MHA(self.latent_size, self.num_heads, name="attn")(q, k, mask=mask)
        a = nn.Dropout(self.dropout, deterministic=not train)(a)
        x = q + a
        if self.ln:
            x = nn.LayerNorm(epsilon=1e-5, name="ln0")(x)
        f = nn.Dense(self.hidden_size, name="fc1")(x)
        f = act(f)
        f = nn.Dense(self.latent_size, name="fc2")(f)
        f = nn.Dropout(self.dropout, deterministic=not train)(f)
        x = x + f
        if self.ln:
            x = nn.LayerNorm(epsilon=1e-5, name="ln1")(x)
        return x


class SetEncoderBlock(nn.Module):
    latent_size: int
    hidden_size: int
    num_heads: int
    ln: bool = False
    dropout: float = 0.1
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        return SetAttentionBlock(self.latent_size, self.hidden_size,
                                 self.num_heads, self.ln, self.dropout,
                                 self.activation, name="attn")(
            x, x, mask=mask, train=train)


class SetDecoderBlock(nn.Module):
    latent_size: int
    hidden_size: int
    num_heads: int
    ln: bool = False
    dropout: float = 0.1
    activation: str = "relu"
    self_attn: bool = True
    use_temperature: bool = False

    @nn.compact
    def __call__(self, q, k, mask=None, self_mask=None, train: bool = False):
        act = nn.relu if self.activation == "relu" else (
            lambda x: nn.leaky_relu(x, 0.01))
        x = q
        if self.self_attn:
            a1 = MHA(self.latent_size, self.num_heads,
                     use_temperature=self.use_temperature, name="attn1")(
                q, q, mask=self_mask)
            a1 = nn.Dropout(self.dropout, deterministic=not train)(a1)
            x = q + a1
            if self.ln:
                x = nn.LayerNorm(epsilon=1e-5, name="ln0")(x)
        a2 = MHA(self.latent_size, self.num_heads,
                 use_temperature=self.use_temperature, name="attn2")(
            x, k, mask=mask)
        a2 = nn.Dropout(self.dropout, deterministic=not train)(a2)
        x = x + a2
        if self.ln:
            x = nn.LayerNorm(epsilon=1e-5, name="ln1")(x)
        f = nn.Dense(self.hidden_size, name="fc1")(x)
        f = act(f)
        f = nn.Dense(self.latent_size, name="fc2")(f)
        f = nn.Dropout(self.dropout, deterministic=not train)(f)
        x = x + f
        if self.ln:
            x = nn.LayerNorm(epsilon=1e-5, name="ln2")(x)
        return x


class SetTransformerEncoder(nn.Module):
    input_size: int
    latent_size: int
    hidden_size: int
    num_heads: int
    num_blocks: int
    ln: bool = False
    dropout: float = 0.1
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        if self.input_size != self.latent_size:
            x = nn.Dense(self.latent_size, name="proj")(x)
        for i in range(self.num_blocks):
            x = SetEncoderBlock(self.latent_size, self.hidden_size,
                                self.num_heads, self.ln, self.dropout,
                                self.activation, name=f"block_{i}")(
                x, mask=mask, train=train)
        return x


class SetTransformerDecoder(nn.Module):
    input_size: int
    latent_size: int
    hidden_size: int
    num_heads: int
    num_blocks: int
    ln: bool = False
    dropout: float = 0.1
    activation: str = "relu"
    self_attn: bool = True
    use_temperature: bool = False

    @nn.compact
    def __call__(self, q, encoder_outputs, mask=None, train: bool = False):
        if self.input_size != self.latent_size:
            q = nn.Dense(self.latent_size, name="proj")(q)
        for i in range(self.num_blocks):
            q = SetDecoderBlock(self.latent_size, self.hidden_size,
                                self.num_heads, self.ln, self.dropout,
                                self.activation, self.self_attn,
                                self.use_temperature, name=f"block_{i}")(
                q, encoder_outputs, mask=mask, train=train)
        return q


class MultiSetAttentionBlock(nn.Module):
    """Joint self/cross attention over two sets with concat-merge."""

    latent_size: int
    hidden_size: int
    num_heads: int
    weight_sharing: str = "none"  # 'none' | 'cross' | 'sym'
    ln: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, y, masks=None, train: bool = False):
        def block(name):
            return SetAttentionBlock(self.latent_size, self.hidden_size,
                                     self.num_heads, ln=self.ln,
                                     dropout=self.dropout, name=name)

        if self.weight_sharing == "none":
            mab_xx, mab_yy = block("MAB_XX"), block("MAB_YY")
            mab_xy, mab_yx = block("MAB_XY"), block("MAB_YX")
        elif self.weight_sharing == "cross":
            mab_xx, mab_yy = block("MAB_XX"), block("MAB_YY")
            mab_xy = mab_yx = block("MAB_cross")
        elif self.weight_sharing == "sym":
            mab_xx = mab_yy = block("MAB_self")
            mab_xy = mab_yx = block("MAB_cross")
        else:
            raise NotImplementedError(self.weight_sharing)

        m_xx, m_xy, m_yx, m_yy = masks if masks is not None else (None,) * 4
        xx = mab_xx(x, x, mask=m_xx, train=train)
        xy = mab_xy(x, y, mask=m_xy, train=train)
        yx = mab_yx(y, x, mask=m_yx, train=train)
        yy = mab_yy(y, y, mask=m_yy, train=train)
        x_m = nn.Dense(self.latent_size, name="fc_X")(
            jnp.concatenate([xx, xy], axis=-1))
        y_m = nn.Dense(self.latent_size, name="fc_Y")(
            jnp.concatenate([yy, yx], axis=-1))
        x_m = nn.Dropout(self.dropout, deterministic=not train)(x_m)
        y_m = nn.Dropout(self.dropout, deterministic=not train)(y_m)
        x_out, y_out = x + x_m, y + y_m
        if self.ln:
            x_out = nn.LayerNorm(epsilon=1e-5, name="ln_x")(x_out)
            y_out = nn.LayerNorm(epsilon=1e-5, name="ln_y")(y_out)
        return x_out, y_out


class MultiSetTransformerEncoder(nn.Module):
    x_size: int
    y_size: int
    latent_size: int
    hidden_size: int
    num_heads: int
    num_blocks: int
    weight_sharing: str = "none"
    ln: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, y, masks=None, train: bool = False):
        if self.x_size != self.latent_size:
            x = nn.Dense(self.latent_size, name="proj_x")(x)
        if self.y_size != self.latent_size:
            y = nn.Dense(self.latent_size, name="proj_y")(y)
        for i in range(self.num_blocks):
            x, y = MultiSetAttentionBlock(
                self.latent_size, self.hidden_size, self.num_heads,
                self.weight_sharing, self.ln, self.dropout,
                name=f"block_{i}")(x, y, masks=masks, train=train)
        return x, y


class PMA(nn.Module):
    """Pooling by multihead attention: learned seeds attend the set."""

    latent_size: int
    hidden_size: int
    num_heads: int
    num_seeds: int = 1
    ln: bool = False

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        seeds = self.param(
            "S", nn.initializers.xavier_uniform(),
            (1, self.num_seeds, self.latent_size))
        s = jnp.broadcast_to(seeds, (x.shape[0],) + seeds.shape[1:])
        return SetAttentionBlock(self.latent_size, self.hidden_size,
                                 self.num_heads, ln=self.ln, name="mab")(
            s, x, mask=mask, train=train)
