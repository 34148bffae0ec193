"""Align or crop a folder of face images (multiprocess, host-side).

Parity: reference prepare_data/preparing_faces_parallel.py — dlib-based
FFHQ alignment (`align` mode) or fixed cropping with optional random shift
(`crop` mode) over a worker pool.
"""

from __future__ import annotations

import dataclasses
import multiprocessing as mp
import sys
from functools import partial
from pathlib import Path
from typing import Optional

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from PIL import Image

from stylegan3_editing_tpu.configs import model_paths
from stylegan3_editing_tpu.utils import alignment_utils as au
from stylegan3_editing_tpu.utils.cli import parse_dataclass


@dataclasses.dataclass
class PrepareOptions:
    mode: str = "align"  # 'align' | 'crop'
    root_path: str = "./raw_images"
    output_path: Optional[str] = None
    num_workers: int = 4
    random_shift: float = 0.05
    output_size: int = 1024


def _process_one(path_str: str, opts: PrepareOptions, out_dir: Path) -> str:
    detector, predictor = au.get_dlib_detector(model_paths["shape_predictor"])
    path = Path(path_str)
    try:
        lm = au.get_landmark(str(path), detector, predictor)
        img = Image.open(path).convert("RGB")
        if opts.mode == "align":
            result = au.align_face_from_landmarks(img, lm, opts.output_size)
        else:
            result = au.crop_face_from_landmarks(
                img, lm, random_shift=opts.random_shift,
                output_size=opts.output_size)
        result.save(out_dir / path.name)
        return f"ok {path.name}"
    except Exception as e:
        return f"failed {path.name}: {e}"


def run(opts: PrepareOptions):
    root = Path(opts.root_path)
    out_dir = Path(opts.output_path or f"{opts.root_path}_{opts.mode}ed")
    out_dir.mkdir(parents=True, exist_ok=True)
    paths = [str(p) for p in sorted(root.iterdir())
             if p.suffix.lower() in (".png", ".jpg", ".jpeg")]
    with mp.Pool(opts.num_workers) as pool:
        for res in pool.imap_unordered(
                partial(_process_one, opts=opts, out_dir=out_dir), paths):
            print(res)


if __name__ == "__main__":
    run(parse_dataclass(PrepareOptions))
