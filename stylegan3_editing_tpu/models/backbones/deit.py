"""DeiT-base-distilled-patch16-224 feature extractor (flax NHWC).

Parity: timm `deit_base_distilled_patch16_224` sliced DPT-style by the
reference (/root/reference/models/styleganxl/feature_networks/vit.py:183-294,
pretrained_builder.py:149-169): token activations are taken AFTER blocks
2, 5, 8, 11 (pre-final-norm), the cls+dist tokens dropped (readout 'ignore',
start_index=2), reshaped to the 14×14 patch grid, then per-stage heads
produce 4 maps: /4 96ch (1×1 conv + 4× transposed conv), /8 192ch (1×1 +
2×), /16 384ch (1×1), /32 768ch (1×1 + strided 3×3). The heads are randomly
initialized and frozen in projected-GAN — only the ViT trunk has pretrained
weights; `convert_deit` maps a timm state dict onto it.
"""

from __future__ import annotations

from typing import Dict, List, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .common import dense_w, put

_DIM = 768
_HEADS = 12
_DEPTH = 12
_HOOKS = (2, 5, 8, 11)
_STAGE_CH = (96, 192, 384, 768)


class Block(nn.Module):
    """Pre-LN transformer block (timm ViT: fused qkv, GELU MLP)."""

    heads: int = _HEADS

    @nn.compact
    def __call__(self, x):
        n, t, d = x.shape
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(3 * d, name="qkv")(h).reshape(
            n, t, 3, self.heads, d // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("nqhd,nkhd->nhqk", q, k) / np.sqrt(d // self.heads)
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, t, d)
        x = x + nn.Dense(d, name="proj")(o)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(4 * d, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(d, name="fc2")(h)
        return x + h


class DeiTFeatures(nn.Module):
    """224² NHWC input → 4 feature maps (/4 96, /8 192, /16 384, /32 768).

    Input is expected pre-normalized (IMAGENET stats, reference
    projector.py:16-20). Token grid must be 14×14 (224² / 16).
    `dim`/`heads`/`stage_ch` select the family: base (768/12) default,
    small = 384/6 with stage channels (48, 96, 192, 384)
    (reference _make_vit, pretrained_builder.py:138-157).
    """

    dim: int = _DIM
    heads: int = _HEADS
    stage_ch: tuple = _STAGE_CH
    # 2 = distilled DeiT (cls+dist, start_index=2); 1 = plain ViT (cls only,
    # start_index=1 — reference _make_vit, pretrained_builder.py:167).
    prefix_tokens: int = 2

    @nn.compact
    def __call__(self, x) -> List[jax.Array]:
        n, hh, ww, _ = x.shape
        dim = self.dim
        npf = self.prefix_tokens
        gh, gw = hh // 16, ww // 16
        tok = nn.Conv(dim, (16, 16), strides=16, name="patch_embed")(x)
        tok = tok.reshape(n, gh * gw, dim)
        cls = self.param("cls_token",
                         lambda k: jnp.zeros((1, 1, dim), jnp.float32))
        prefix = [jnp.tile(cls, (n, 1, 1))]
        if npf == 2:
            dist = self.param("dist_token",
                              lambda k: jnp.zeros((1, 1, dim), jnp.float32))
            prefix.append(jnp.tile(dist, (n, 1, 1)))
        pos = self.param(
            "pos_embed",
            lambda k: jnp.zeros((1, npf + 14 * 14, dim), jnp.float32))
        tok = jnp.concatenate(prefix + [tok], axis=1)
        if gh * gw != pos.shape[1] - npf:  # interpolate pos embed (vit.py:100)
            grid = pos[:, npf:].reshape(1, 14, 14, dim)
            grid = jax.image.resize(grid, (1, gh, gw, dim), "bilinear")
            pos = jnp.concatenate(
                [pos[:, :npf], grid.reshape(1, gh * gw, dim)], axis=1)
        tok = tok + pos

        hooks = {}
        for i in range(_DEPTH):
            tok = Block(heads=self.heads, name=f"block{i}")(tok)
            if i in _HOOKS:
                hooks[i] = tok

        outs = []
        for si, hook in enumerate(_HOOKS):
            t = hooks[hook][:, npf:]  # drop prefix tokens (readout 'ignore')
            fmap = t.reshape(n, gh, gw, dim)
            fmap = nn.Conv(self.stage_ch[si], (1, 1),
                           name=f"head{si}_proj")(fmap)
            if si == 0:
                fmap = nn.ConvTranspose(self.stage_ch[si], (4, 4),
                                        strides=(4, 4), name="head0_up")(fmap)
            elif si == 1:
                fmap = nn.ConvTranspose(self.stage_ch[si], (2, 2),
                                        strides=(2, 2), name="head1_up")(fmap)
            elif si == 3:
                fmap = nn.Conv(self.stage_ch[si], (3, 3), strides=2,
                               padding=1, name="head3_down")(fmap)
            outs.append(fmap)
        return outs


def DeiTSmallFeatures(**kw):
    """timm `deit_small_distilled_patch16_224` (_make_vit 'small',
    pretrained_builder.py:144-147)."""
    return DeiTFeatures(dim=384, heads=6, stage_ch=(48, 96, 192, 384), **kw)


def DeiTTinyFeatures(**kw):
    """timm `deit_tiny_distilled_patch16_224` (_make_vit 'tiny',
    pretrained_builder.py:139-142)."""
    return DeiTFeatures(dim=192, heads=3, stage_ch=(24, 48, 96, 192), **kw)


def ViTBaseFeatures(**kw):
    """timm `vit_base_patch16_224` — plain ViT, cls token only
    (start_index=1, pretrained_builder.py:167; VITS_INCEPTION stats)."""
    return DeiTFeatures(prefix_tokens=1, **kw)


def convert_deit(state: Mapping[str, np.ndarray]) -> dict:
    """timm `deit_base_distilled_patch16_224` state dict → trunk params.

    The per-stage heads keep their random frozen init (parity: the reference
    creates them untrained, vit.py:205-282); merge the returned params over
    an `init()` tree.
    """
    p: Dict = {}
    put(p, "patch_embed/kernel",
        jnp.asarray(np.asarray(state["patch_embed.proj.weight"])
                    .transpose(2, 3, 1, 0)))
    put(p, "patch_embed/bias", state["patch_embed.proj.bias"])
    put(p, "cls_token", state["cls_token"])
    if "dist_token" in state:  # plain (non-distilled) ViTs have cls only
        put(p, "dist_token", state["dist_token"])
    put(p, "pos_embed", state["pos_embed"])
    for i in range(_DEPTH):
        src = f"blocks.{i}"
        dst = f"block{i}"
        put(p, f"{dst}/norm1/scale", state[f"{src}.norm1.weight"])
        put(p, f"{dst}/norm1/bias", state[f"{src}.norm1.bias"])
        put(p, f"{dst}/qkv/kernel", dense_w(state[f"{src}.attn.qkv.weight"]))
        put(p, f"{dst}/qkv/bias", state[f"{src}.attn.qkv.bias"])
        put(p, f"{dst}/proj/kernel", dense_w(state[f"{src}.attn.proj.weight"]))
        put(p, f"{dst}/proj/bias", state[f"{src}.attn.proj.bias"])
        put(p, f"{dst}/norm2/scale", state[f"{src}.norm2.weight"])
        put(p, f"{dst}/norm2/bias", state[f"{src}.norm2.bias"])
        put(p, f"{dst}/fc1/kernel", dense_w(state[f"{src}.mlp.fc1.weight"]))
        put(p, f"{dst}/fc1/bias", state[f"{src}.mlp.fc1.bias"])
        put(p, f"{dst}/fc2/kernel", dense_w(state[f"{src}.mlp.fc2.weight"]))
        put(p, f"{dst}/fc2/bias", state[f"{src}.mlp.fc2.bias"])
    return {"params": p}
