"""CLIP ViT-B/32 (image + text encoders) in flax, with an OpenAI-weights
converter and BPE tokenizer.

Architecture parity: the vendored OpenAI CLIP the reference uses for its
CLIP loss and StyleCLIP tooling
(/root/reference/models/styleganxl/feature_networks/clip/model.py;
criteria/clip_loss.py, editing/styleclip_*). QuickGELU activations, pre-LN
transformer blocks, EOT-token text pooling, learned logit scale.
"""

from __future__ import annotations

import gzip
import html
from functools import lru_cache
from typing import Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .common import dense_w, put

CONTEXT_LENGTH = 77
VOCAB_SIZE = 49408


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible MHA (batch-first here)."""

    width: int
    heads: int

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None):
        n, t, c = x.shape
        qkv = nn.Dense(3 * self.width, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = self.width // self.heads

        def heads(a):
            return a.reshape(n, t, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("nhqd,nhkd->nhqk", q, k) / np.sqrt(hd)
        if mask is not None:
            attn = attn + mask
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("nhqk,nhkd->nhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(n, t, self.width)
        return nn.Dense(self.width, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None):
        x = x + MultiheadAttention(self.width, self.heads, name="attn")(
            nn.LayerNorm(name="ln_1")(x), mask)
        y = nn.LayerNorm(name="ln_2")(x)
        y = nn.Dense(4 * self.width, name="c_fc")(y)
        y = quick_gelu(y)
        y = nn.Dense(self.width, name="c_proj")(y)
        return x + y


class Transformer(nn.Module):
    width: int
    layers: int
    heads: int

    @nn.compact
    def __call__(self, x, mask: Optional[jax.Array] = None,
                 hooks: Optional[tuple] = None):
        """hooks: block indices whose outputs to return (feature-network
        taps); None → final output only."""
        hooked = {}
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads,
                                       name=f"resblock_{i}")(x, mask)
            if hooks is not None and i in hooks:
                hooked[i] = x
        if hooks is not None:
            return x, [hooked[i] for i in hooks]
        return x


class CLIP(nn.Module):
    """ViT-B/32 CLIP. Images: NHWC 224², CLIP-normalized. Text: token ids."""

    embed_dim: int = 512
    image_resolution: int = 224
    vision_width: int = 768
    vision_layers: int = 12
    vision_patch: int = 32
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8

    def setup(self):
        grid = self.image_resolution // self.vision_patch
        scale = self.vision_width ** -0.5
        self.visual_conv = nn.Conv(self.vision_width,
                                   (self.vision_patch, self.vision_patch),
                                   strides=self.vision_patch, use_bias=False,
                                   name="visual_conv1")
        self.class_embedding = self.param(
            "class_embedding",
            lambda key: scale * jax.random.normal(key, (self.vision_width,)))
        self.visual_pos = self.param(
            "visual_positional_embedding",
            lambda key: scale * jax.random.normal(
                key, (grid * grid + 1, self.vision_width)))
        self.ln_pre = nn.LayerNorm(name="ln_pre")
        self.visual_transformer = Transformer(
            self.vision_width, self.vision_layers, self.vision_width // 64,
            name="visual_transformer")
        self.ln_post = nn.LayerNorm(name="ln_post")
        self.visual_proj = self.param(
            "visual_proj",
            lambda key: scale * jax.random.normal(
                key, (self.vision_width, self.embed_dim)))

        self.token_embedding = nn.Embed(VOCAB_SIZE, self.text_width,
                                        name="token_embedding")
        self.text_pos = self.param(
            "positional_embedding",
            lambda key: 0.01 * jax.random.normal(
                key, (CONTEXT_LENGTH, self.text_width)))
        self.text_transformer = Transformer(self.text_width, self.text_layers,
                                            self.text_heads, name="transformer")
        self.ln_final = nn.LayerNorm(name="ln_final")
        self.text_projection = self.param(
            "text_projection",
            lambda key: self.text_width ** -0.5 * jax.random.normal(
                key, (self.text_width, self.embed_dim)))
        self.logit_scale = self.param(
            "logit_scale", lambda key: jnp.asarray(np.log(1 / 0.07), jnp.float32))

    def encode_image(self, image: jax.Array) -> jax.Array:
        x = self.visual_conv(image)  # [N, g, g, W]
        n = x.shape[0]
        x = x.reshape(n, -1, self.vision_width)
        cls = jnp.broadcast_to(self.class_embedding[None, None],
                               (n, 1, self.vision_width))
        x = jnp.concatenate([cls, x], axis=1) + self.visual_pos[None]
        x = self.ln_pre(x)
        x = self.visual_transformer(x)
        x = self.ln_post(x[:, 0, :])
        return x @ self.visual_proj

    def encode_text(self, text: jax.Array) -> jax.Array:
        """text: int32 [N, 77] token ids (0-padded after EOT)."""
        x = self.token_embedding(text) + self.text_pos[None]
        t = text.shape[1]
        causal = jnp.triu(jnp.full((t, t), -jnp.inf), k=1)
        x = self.text_transformer(x, causal)
        x = self.ln_final(x)
        eot = jnp.argmax(text, axis=-1)  # EOT has the highest token id
        x = x[jnp.arange(x.shape[0]), eot]
        return x @ self.text_projection

    def __call__(self, image: jax.Array, text: jax.Array):
        img_f = self.encode_image(image)
        txt_f = self.encode_text(text)
        img_f = img_f / jnp.linalg.norm(img_f, axis=-1, keepdims=True)
        txt_f = txt_f / jnp.linalg.norm(txt_f, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * img_f @ txt_f.T
        return logits_per_image, logits_per_image.T


CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_preprocess_from_synth(images: jax.Array, size: int = 224) -> jax.Array:
    """Generator output ([-1,1] NHWC) → CLIP-normalized size² NHWC."""
    n, h, w, c = images.shape
    x = (images + 1) / 2
    x = jnp.clip(x, 0, 1)
    if (h, w) != (size, size):
        x = jax.image.resize(x, (n, size, size, c), method="cubic")
    return (x - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD


# ------------------------------------------------------------- converter

def _ln_into(p, state, out, key):
    put(p, f"{out}/scale", state[f"{key}.weight"])
    put(p, f"{out}/bias", state[f"{key}.bias"])


def _block_into(p, state, out, key):
    put(p, f"{out}/attn/in_proj/kernel", dense_w(state[f"{key}.attn.in_proj_weight"]))
    put(p, f"{out}/attn/in_proj/bias", state[f"{key}.attn.in_proj_bias"])
    put(p, f"{out}/attn/out_proj/kernel", dense_w(state[f"{key}.attn.out_proj.weight"]))
    put(p, f"{out}/attn/out_proj/bias", state[f"{key}.attn.out_proj.bias"])
    _ln_into(p, state, f"{out}/ln_1", f"{key}.ln_1")
    _ln_into(p, state, f"{out}/ln_2", f"{key}.ln_2")
    put(p, f"{out}/c_fc/kernel", dense_w(state[f"{key}.mlp.c_fc.weight"]))
    put(p, f"{out}/c_fc/bias", state[f"{key}.mlp.c_fc.bias"])
    put(p, f"{out}/c_proj/kernel", dense_w(state[f"{key}.mlp.c_proj.weight"]))
    put(p, f"{out}/c_proj/bias", state[f"{key}.mlp.c_proj.bias"])


def convert_clip_visual_state(state: Mapping[str, np.ndarray]) -> dict:
    """OpenAI CLIP state dict (visual.* subset suffices) → visual-trunk
    params — shared by `CLIP` and `CLIPViTStages` (whose stage heads stay
    randomly initialized, like the reference's untrained ViT readouts)."""
    p: dict = {}
    put(p, "visual_conv1/kernel",
        np.asarray(state["visual.conv1.weight"]).transpose(2, 3, 1, 0))
    put(p, "class_embedding", state["visual.class_embedding"])
    put(p, "visual_positional_embedding", state["visual.positional_embedding"])
    _ln_into(p, state, "ln_pre", "visual.ln_pre")
    for i in range(12):
        _block_into(p, state, f"visual_transformer/resblock_{i}",
                    f"visual.transformer.resblocks.{i}")
    return {"params": p}


def convert_clip_state(state: Mapping[str, np.ndarray]) -> dict:
    """OpenAI CLIP state dict → our params tree."""
    p: dict = dict(convert_clip_visual_state(state)["params"])

    def ln(out, key):
        _ln_into(p, state, out, key)

    def block(out, key, width):
        _block_into(p, state, out, key)

    ln("ln_post", "visual.ln_post")
    put(p, "visual_proj", state["visual.proj"])

    put(p, "token_embedding/embedding", state["token_embedding.weight"])
    put(p, "positional_embedding", state["positional_embedding"])
    for i in range(12):
        block(f"transformer/resblock_{i}", f"transformer.resblocks.{i}", 512)
    ln("ln_final", "ln_final")
    put(p, "text_projection", state["text_projection"])
    put(p, "logit_scale", state["logit_scale"])
    return {"params": p}


# ------------------------------------------------------------- tokenizer

@lru_cache()
def _bytes_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def _get_pairs(word):
    return {(a, b) for a, b in zip(word[:-1], word[1:])}


class SimpleTokenizer:
    """CLIP BPE tokenizer (needs the released bpe_simple_vocab_16e6.txt.gz)."""

    def __init__(self, bpe_path: str):
        import regex

        self._re = regex
        merges = gzip.open(bpe_path).read().decode("utf-8").split("\n")
        merges = [tuple(m.split()) for m in merges[1:49152 - 256 - 2 + 1]]
        self.byte_encoder = _bytes_to_unicode()
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        for merge in merges:
            vocab.append("".join(merge))
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        self.pat = regex.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
            r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
            regex.IGNORECASE)

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str):
        tokens = []
        text = html.unescape(html.unescape(text))
        text = self._re.sub(r"\s+", " ", text.strip()).lower()
        for tok in self._re.findall(self.pat, text):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            tokens.extend(self.encoder[t] for t in self._bpe(tok).split(" "))
        return tokens

    def tokenize(self, texts, context_length: int = CONTEXT_LENGTH) -> np.ndarray:
        if isinstance(texts, str):
            texts = [texts]
        sot = self.encoder["<|startoftext|>"]
        eot = self.encoder["<|endoftext|>"]
        result = np.zeros((len(texts), context_length), np.int32)
        for i, text in enumerate(texts):
            toks = [sot] + self.encode(text) + [eot]
            toks = toks[:context_length]
            if len(toks) == context_length:
                toks[-1] = eot
            result[i, :len(toks)] = toks
        return result


class CLIPViTStages(nn.Module):
    """CLIP ViT-B/32 visual trunk sliced into the 4-stage feature contract.

    Mirrors the reference's ViT feature-network construction
    (pretrained_builder.py:131-195 via midas hooks): transformer blocks are
    hooked at depths (2, 5, 8, 11), token grids reshaped to maps, then
    randomly-initialized per-stage projections resample to /4, /8, /16, /32
    (the projections are frozen-random, like the projector's CCM/CSM).
    Trunk parameter names match `CLIP` → `convert_clip_state` params apply
    (visual.* subset).
    """

    vision_width: int = 768
    vision_layers: int = 12
    vision_patch: int = 32
    hooks: tuple = (2, 5, 8, 11)
    stage_ch: tuple = (96, 192, 384, 768)

    @nn.compact
    def __call__(self, x: jax.Array):
        n, hh, ww, _ = x.shape
        gh, gw = hh // self.vision_patch, ww // self.vision_patch
        scale = self.vision_width ** -0.5
        tok = nn.Conv(self.vision_width,
                      (self.vision_patch, self.vision_patch),
                      strides=self.vision_patch, use_bias=False,
                      name="visual_conv1")(x)
        tok = tok.reshape(n, gh * gw, self.vision_width)
        cls = self.param(
            "class_embedding",
            lambda key: scale * jax.random.normal(key, (self.vision_width,)))
        grid0 = 224 // self.vision_patch
        pos = self.param(
            "visual_positional_embedding",
            lambda key: scale * jax.random.normal(
                key, (grid0 * grid0 + 1, self.vision_width)))
        if gh * gw != pos.shape[0] - 1:  # interpolate for non-224 inputs
            grid = pos[1:].reshape(1, grid0, grid0, self.vision_width)
            grid = jax.image.resize(grid, (1, gh, gw, self.vision_width),
                                    "bilinear")
            pos = jnp.concatenate(
                [pos[:1], grid.reshape(gh * gw, self.vision_width)], axis=0)
        tok = jnp.concatenate(
            [jnp.broadcast_to(cls[None, None], (n, 1, self.vision_width)),
             tok], axis=1) + pos[None]
        tok = nn.LayerNorm(name="ln_pre")(tok)

        _, taps = Transformer(
            self.vision_width, self.vision_layers, self.vision_width // 64,
            name="visual_transformer")(tok, hooks=tuple(self.hooks))

        outs = []
        for si in range(len(self.hooks)):
            t = taps[si][:, 1:]  # readout 'ignore': drop cls token
            fmap = t.reshape(n, gh, gw, self.vision_width)
            fmap = nn.Conv(self.stage_ch[si], (1, 1),
                           name=f"head{si}_proj")(fmap)
            # Patch-32 grid is /32; bring stages to /4, /8, /16, /32.
            ups = (8, 4, 2, 1)[si]
            if ups > 1:
                fmap = nn.ConvTranspose(self.stage_ch[si], (ups, ups),
                                        strides=(ups, ups),
                                        name=f"head{si}_up")(fmap)
            outs.append(fmap)
        return outs
