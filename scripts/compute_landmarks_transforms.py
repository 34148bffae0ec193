"""Compute & cache landmark transforms between cropped and aligned images.

Parity: reference prepare_data/compute_landmarks_transforms.py — produces
the name → (angle, translation, transform, inverse) dict consumed by
unaligned inversion/editing (the generator `transform` argument).
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
from PIL import Image

from stylegan3_editing_tpu.configs import model_paths
from stylegan3_editing_tpu.utils import alignment_utils as au
from stylegan3_editing_tpu.utils.cli import parse_dataclass
from stylegan3_editing_tpu.video.video_handler import LandmarksHandler


@dataclasses.dataclass
class LandmarksOptions:
    raw_root: str = "./raw_images"
    aligned_root: str = "./aligned_images"
    cropped_root: str = "./cropped_images"
    output_root: str = "./landmarks"
    force: bool = False


def run(opts: LandmarksOptions):
    detector, predictor = au.get_dlib_detector(model_paths["shape_predictor"])

    def landmark_fn(img: Image.Image) -> np.ndarray:
        arr = np.asarray(img.convert("RGB"))
        shape = None
        for det in detector(arr, 1):
            shape = predictor(arr, det)
        assert shape is not None, "no face found"
        return np.array([[p.x, p.y] for p in shape.parts()])

    handler = LandmarksHandler(Path(opts.output_root), landmark_fn=landmark_fn)
    paths = sorted(Path(opts.raw_root).iterdir())
    transforms = handler.get_landmarks_transforms(
        paths, Path(opts.cropped_root), Path(opts.aligned_root),
        force_computing=opts.force)
    print(f"computed {len(transforms)} transforms → {handler.path}")


if __name__ == "__main__":
    run(parse_dataclass(LandmarksOptions))
