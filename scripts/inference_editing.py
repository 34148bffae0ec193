"""Invert a folder of images, then InterFaceGAN-edit over factor ranges.

Parity: reference inversion/scripts/inference_editing.py — per-image ReStyle
inversion followed by boundary walks; every factor range renders as one
batched synthesis.
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path
from typing import List, Optional

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax.numpy as jnp

from stylegan3_editing_tpu.configs import model_paths
from stylegan3_editing_tpu.editing.interfacegan import FaceEditor
from stylegan3_editing_tpu.models.encoders import get_average_image, run_restyle_iterations
from stylegan3_editing_tpu.models.sg3 import Generator, sg3_r_config
from stylegan3_editing_tpu.data import BatchIterator, ImagesDataset, encode_transforms
from stylegan3_editing_tpu.utils.cli import parse_dataclass
from stylegan3_editing_tpu.utils.common import tensor2im
from stylegan3_editing_tpu.utils.inference_utils import load_encoder


@dataclasses.dataclass
class EditOptions:
    exp_dir: str = "./experiments/editing"
    checkpoint_path: Optional[str] = None
    data_path: str = "./data"
    boundaries_dir: Optional[str] = None
    edit_directions: List[str] = dataclasses.field(
        default_factory=lambda: ["age", "smile", "pose"])
    factor_range: int = 5
    test_batch_size: int = 2
    n_iters_per_batch: int = 3
    n_images: Optional[int] = None


def run(opts: EditOptions):
    out = Path(opts.exp_dir) / "editing_results"
    out.mkdir(parents=True, exist_ok=True)

    model, variables, _ = load_encoder(opts.checkpoint_path)
    avg_image, latent_avg = get_average_image(model, variables)
    decoder = Generator(model.decoder_cfg)
    dec_vars = {c: variables[c]["decoder"] for c in ("params", "buffers", "ema")}
    editor = FaceEditor(
        decoder, dec_vars,
        boundaries_dir=opts.boundaries_dir or
        model_paths["interfacegan_boundaries"])

    t = encode_transforms()["transform_inference"]
    dataset = ImagesDataset(opts.data_path, opts.data_path, target_transform=t)
    names = [p.name for p in dataset.source_paths][:opts.n_images]
    it = BatchIterator(dataset, opts.test_batch_size, shuffle=False)
    count = 0
    for x, _ in it.epoch_batches():
        if opts.n_images and count >= opts.n_images:
            break
        batch_names = names[count:count + x.shape[0]]
        results = run_restyle_iterations(
            model, variables, jnp.asarray(x), avg_image, latent_avg,
            n_iters=opts.n_iters_per_batch)
        codes = results[-1][2]
        for direction in opts.edit_directions:
            if direction not in editor.directions:
                print(f"skipping {direction}: no boundary file")
                continue
            images, _ = editor.edit(
                codes, direction,
                factor_range=(-opts.factor_range, opts.factor_range + 1))
            for fi, batch_imgs in enumerate(images):
                factor = -opts.factor_range + fi
                for bi, name in enumerate(batch_names):
                    d = out / direction / Path(name).stem
                    d.mkdir(parents=True, exist_ok=True)
                    tensor2im(np.asarray(batch_imgs[bi])).save(
                        d / f"{factor}.jpg")
        count += x.shape[0]
    print(f"edited {count} images → {out}")


if __name__ == "__main__":
    run(parse_dataclass(EditOptions))
