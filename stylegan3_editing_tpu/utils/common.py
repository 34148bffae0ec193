"""Transform math + image/video helpers.

Parity: reference utils/common.py — `make_transform` (rotation+translation
3×3, :9), `get_identity_transform` (inverted identity, :22),
`generate_random_transform` (:30), `tensor2im` (:39, here NHWC), and
`generate_mp4` (:48).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
from PIL import Image


def make_transform(translate: Tuple[float, float], angle: float) -> np.ndarray:
    """3×3 rotation+translation matrix (degrees, image-fraction translate)."""
    m = np.eye(3)
    s = np.sin(angle / 360.0 * np.pi * 2)
    c = np.cos(angle / 360.0 * np.pi * 2)
    m[0][0] = c
    m[0][1] = s
    m[0][2] = translate[0]
    m[1][0] = -s
    m[1][1] = c
    m[1][2] = translate[1]
    return m


def get_identity_transform() -> np.ndarray:
    return np.linalg.inv(make_transform((0.0, 0.0), 0.0))


def generate_random_transform(translate: float = 0.3, rotate: float = 25,
                              rng: np.random.RandomState = None) -> np.ndarray:
    rng = rng or np.random
    angle = rng.uniform(low=-rotate, high=rotate)
    t = (rng.uniform(low=-translate, high=translate),
         rng.uniform(low=-translate, high=translate))
    return np.linalg.inv(make_transform(t, angle))


def tensor2im(var) -> Image.Image:
    """NHWC-single (or HWC) [-1, 1] float array → PIL image."""
    arr = np.asarray(var)
    if arr.ndim == 4:
        arr = arr[0]
    arr = np.clip((arr + 1) / 2, 0, 1) * 255
    return Image.fromarray(arr.astype("uint8"))


def generate_mp4(out_name, images: Sequence, kwargs: dict) -> None:
    """Write a list of PIL/np images to `<out_name>.mp4`.

    Environments without an ffmpeg backend (imageio[ffmpeg] not installed)
    fall back to a `<out_name>_frames/` PNG sequence — same content,
    assemblable offline."""
    import imageio

    try:
        writer = imageio.get_writer(str(out_name) + ".mp4", **kwargs)
    except (ValueError, ImportError):
        from pathlib import Path

        frame_dir = Path(str(out_name) + "_frames")
        frame_dir.mkdir(parents=True, exist_ok=True)
        for i, image in enumerate(images):
            imageio.imwrite(frame_dir / f"{i:06d}.png", np.array(image))
        return
    for image in images:
        writer.append_data(np.array(image))
    writer.close()
