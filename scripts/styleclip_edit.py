"""Text-driven StyleSpace editing with StyleCLIP global directions.

Parity: reference editing/styleclip_global_directions/edit.py — inverted
latents → W2S → delta_s(neutral→target, β) → α·Δs → synthesis via `all_s`.
An (α, β) grid renders as batched synthesis.
"""

from __future__ import annotations

import dataclasses
import pickle
import sys
from pathlib import Path
from typing import List, Optional

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from stylegan3_editing_tpu.configs import model_paths
from stylegan3_editing_tpu.editing.styleclip_global import (
    StyleCLIPGlobalDirection,
    apply_delta_s,
    load_templates,
)
from stylegan3_editing_tpu.models.backbones.clip import (
    CLIP,
    SimpleTokenizer,
    convert_clip_state,
)
from stylegan3_editing_tpu.utils.cli import parse_dataclass
from stylegan3_editing_tpu.utils.common import tensor2im
from stylegan3_editing_tpu.utils.inference_utils import load_encoder
from stylegan3_editing_tpu.models.sg3 import Generator


@dataclasses.dataclass
class StyleCLIPEditOptions:
    exp_dir: str = "./experiments/styleclip_edit"
    checkpoint_path: Optional[str] = None
    latents_path: str = "./latents.npy"
    stats_path: str = "./styleclip_stats"
    clip_weights: Optional[str] = None
    bpe_path: Optional[str] = None
    neutral_text: str = "face"
    target_text: str = "smiling face"
    alphas: List[float] = dataclasses.field(default_factory=lambda: [2.0])
    betas: List[float] = dataclasses.field(default_factory=lambda: [0.11])
    n_images: Optional[int] = None
    templates_path: Optional[str] = None


def main(opts: StyleCLIPEditOptions):
    out = Path(opts.exp_dir)
    out.mkdir(parents=True, exist_ok=True)

    model, variables, _ = load_encoder(opts.checkpoint_path)
    decoder = Generator(model.decoder_cfg)
    dec_vars = {c: variables[c]["decoder"] for c in ("params", "buffers", "ema")}

    clip_model = CLIP()
    if opts.clip_weights:
        import torch
        state = {k: v.numpy() for k, v in torch.load(
            opts.clip_weights, map_location="cpu").items()}
        clip_vars = convert_clip_state(state)
    else:
        clip_vars = clip_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)),
            jnp.zeros((1, 77), jnp.int32))
        print("WARNING: random CLIP (no --clip_weights)")
    tokenizer = SimpleTokenizer(opts.bpe_path or
                                str(model_paths["clip_bpe_vocab"]))

    stats = Path(opts.stats_path)
    with open(stats / "s_stats", "rb") as f:
        _, s_mean, s_std = pickle.load(f)
    delta_i_c = np.load(stats / "delta_i_c.npy")
    gd = StyleCLIPGlobalDirection(
        delta_i_c, s_std, load_templates(opts.templates_path),
        {k: v[None] for k, v in s_mean.items()}, clip_model, clip_vars,
        tokenizer)

    latents = np.load(opts.latents_path, allow_pickle=True).item()
    names = sorted(latents)[:opts.n_images]
    ws = jnp.asarray(np.stack([np.asarray(latents[n])[-1] for n in names]))
    w2s = jax.jit(lambda v, ws: decoder.apply(v, ws, method=decoder.w2s))
    synth_s = jax.jit(lambda v, all_s: decoder.apply(
        v, None, all_s=all_s, method=decoder.synthesize))
    all_s = w2s(dec_vars, ws)

    for beta in opts.betas:
        delta_s = gd.get_delta_s(opts.neutral_text, opts.target_text, beta)
        for alpha in opts.alphas:
            edited = apply_delta_s(all_s, delta_s, alpha)
            imgs = synth_s(dec_vars, edited)
            for name, img in zip(names, np.asarray(imgs)):
                dst = out / f"{Path(name).stem}_a{alpha}_b{beta}.png"
                tensor2im(img).save(dst)
            print(f"alpha={alpha} beta={beta}: {len(names)} edits saved")


if __name__ == "__main__":
    main(parse_dataclass(StyleCLIPEditOptions))
