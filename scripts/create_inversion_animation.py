"""Latent + transform interpolation animations from inversion results.

Parity: reference inversion/scripts/create_inversion_animation.py — walks
between inverted latents (and their landmark transforms) and renders an
interpolation video. TPU-first: every interpolation frame renders in one
batched synthesis call.
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path
from typing import Optional

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from stylegan3_editing_tpu.models.sg3 import Generator, sg3_r_config
from stylegan3_editing_tpu.utils.cli import parse_dataclass
from stylegan3_editing_tpu.utils.common import generate_mp4, tensor2im
from stylegan3_editing_tpu.utils.inference_utils import load_encoder


@dataclasses.dataclass
class AnimationOptions:
    exp_dir: str = "./experiments/animation"
    checkpoint_path: Optional[str] = None
    latents_path: str = "./latents.npy"
    landmarks_transforms_path: Optional[str] = None
    n_transition_frames: int = 25
    fps: float = 25.0
    batch_size: int = 8
    n_images: Optional[int] = None


def lerp(a, b, ts):
    return a[None] * (1 - ts[:, None]) + b[None] * ts[:, None]


def run(opts: AnimationOptions):
    out = Path(opts.exp_dir)
    out.mkdir(parents=True, exist_ok=True)
    latents = np.load(opts.latents_path, allow_pickle=True).item()
    names = sorted(latents)[:opts.n_images]
    transforms = None
    if opts.landmarks_transforms_path:
        transforms = np.load(opts.landmarks_transforms_path,
                             allow_pickle=True).item()

    model, variables, train_opts = load_encoder(opts.checkpoint_path)
    cfg = model.decoder_cfg
    decoder = Generator(cfg)
    dec_vars = {c: variables[c]["decoder"] for c in ("params", "buffers", "ema")}
    synth = jax.jit(lambda v, ws, t: decoder.apply(v, ws, transform=t,
                                                   method=decoder.synthesize))

    frames = []
    ts = np.linspace(0, 1, opts.n_transition_frames, dtype=np.float32)
    for a, b in zip(names[:-1], names[1:]):
        wa = np.asarray(latents[a])[-1]
        wb = np.asarray(latents[b])[-1]
        ws = lerp(wa, wb, ts)  # [T, num_ws, 512]
        if transforms is not None:
            ta = np.asarray(transforms[a][-1], np.float32)
            tb = np.asarray(transforms[b][-1], np.float32)
            t = lerp(ta, tb, ts)
        else:
            t = np.repeat(np.eye(3, dtype=np.float32)[None],
                          len(ts), axis=0)
        for start in range(0, len(ts), opts.batch_size):
            imgs = synth(dec_vars, jnp.asarray(ws[start:start + opts.batch_size]),
                         jnp.asarray(t[start:start + opts.batch_size]))
            frames.extend(np.array(tensor2im(np.asarray(im)))
                          for im in np.asarray(imgs))
    generate_mp4(out / "animation", frames, {"fps": opts.fps})
    print(f"wrote {len(frames)} frames to {out / 'animation'}.mp4")


if __name__ == "__main__":
    run(parse_dataclass(AnimationOptions))
