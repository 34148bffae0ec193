"""Notebook helpers: pretrained-asset registry + downloader + alignment glue.

Parity: reference notebooks/notebook_utils.py:12-101 — the Google-Drive
asset registry (`ENCODER_PATHS` / `INTERFACEGAN_PATHS` / `STYLECLIP_PATHS`),
the `Downloader`, the dlib model fetch, and the align/crop/transform
wrappers the inference playground calls. The asset ids/names are the
reference's published pointers (interface constants); downloaded torch
checkpoints are converted to this framework's npz via
`scripts/convert_checkpoint.py` (the reference loads them directly).

Zero-egress environments: every download degrades to a clear message and a
None return instead of raising mid-notebook.
"""

from __future__ import annotations

import os
import subprocess
from pathlib import Path
from typing import Optional

# Published asset pointers (reference notebook_utils.py:12-26).
ENCODER_PATHS = {
    "restyle_e4e_ffhq": {"id": "1z_cB187QOc6aqVBdLvYvBjoc93-_EuRm",
                         "name": "restyle_e4e_ffhq.pt"},
    "restyle_pSp_ffhq": {"id": "12WZi2a9ORVg-j6d9x4eF-CKpLaURC2W-",
                         "name": "restyle_pSp_ffhq.pt"},
}
INTERFACEGAN_PATHS = {
    "age": {"id": "1NQVOpKX6YZKVbz99sg94HiziLXHMUbFS",
            "name": "age_boundary.npy"},
    "smile": {"id": "1KgfJleIjrKDgdBTN4vAz0XlgSaa9I99R",
              "name": "Smiling_boundary.npy"},
    "pose": {"id": "1nCzCR17uaMFhAjcg6kFyKnCCxAKOCT2d",
             "name": "pose_boundary.npy"},
    "Male": {"id": "18dpXS5j1h54Y3ah5HaUpT03y58Ze2YEY",
             "name": "Male_boundary.npy"},
}
STYLECLIP_PATHS = {
    "delta_i_c": {"id": "1HOUGvtumLFwjbwOZrTbIloAwBBzs2NBN",
                  "name": "delta_i_c.npy"},
    "s_stats": {"id": "1FVm_Eh7qmlykpnSBN1Iy533e_A2xM78z",
                "name": "s_stats"},
}

DLIB_PREDICTOR_URL = \
    "http://dlib.net/files/shape_predictor_68_face_landmarks.dat.bz2"


class Downloader:
    """Fetch registry assets into `save_dir` (reference Downloader,
    notebook_utils.py:29-62, minus the Colab/pydrive auth path — plain
    Google-Drive URL fetch works in any environment with egress)."""

    def __init__(self, save_dir="pretrained_models"):
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)

    def download_file(self, file_id: str, file_name: str) -> Optional[Path]:
        dst = self.save_dir / file_name
        if dst.exists():
            print(f"{file_name} already exists!")
            return dst
        url = ("https://docs.google.com/uc?export=download&confirm=t"
               f"&id={file_id}")
        try:
            import urllib.request

            urllib.request.urlretrieve(url, dst)  # noqa: S310 — fixed host
            return dst
        except Exception as e:  # zero-egress / offline notebook hosts
            print(f"download of {file_name} failed ({e}); place the file "
                  f"at {dst} manually")
            if dst.exists():
                dst.unlink()
            return None

    def fetch(self, registry: dict, key: str) -> Optional[Path]:
        entry = registry[key]
        return self.download_file(entry["id"], entry["name"])

    def fetch_encoder_npz(self, key: str = "restyle_e4e_ffhq"
                          ) -> Optional[Path]:
        """Download a torch encoder checkpoint and convert it to this
        framework's npz (scripts/convert_checkpoint.py)."""
        pt = self.fetch(ENCODER_PATHS, key)
        if pt is None:
            return None
        npz = pt.with_suffix(".npz")
        if npz.exists():
            return npz
        import sys

        root = Path(__file__).parent.parent
        r = subprocess.run(
            [sys.executable, str(root / "scripts/convert_checkpoint.py"),
             "--src", str(pt), "--dst", str(npz)], capture_output=True,
            text=True)
        if r.returncode != 0:
            print(f"conversion failed:\n{r.stdout}\n{r.stderr}")
            return None
        return npz


def download_dlib_models(dest: str = "shape_predictor_68_face_landmarks.dat"
                         ) -> Optional[str]:
    """Fetch + unpack dlib's 68-landmark predictor (reference :65-70)."""
    if os.path.exists(dest):
        return dest
    try:
        import bz2
        import urllib.request

        print("Downloading files for aligning face image...")
        urllib.request.urlretrieve(DLIB_PREDICTOR_URL, dest + ".bz2")
        with bz2.open(dest + ".bz2") as src, open(dest, "wb") as out:
            out.write(src.read())
        os.unlink(dest + ".bz2")
        print("Done.")
        return dest
    except Exception as e:
        print(f"dlib model download failed ({e}); alignment helpers need "
              f"{dest} placed manually")
        return None


def _dlib_pair():
    from stylegan3_editing_tpu.utils.alignment_utils import get_dlib_detector

    path = download_dlib_models()
    if path is None:
        return None
    return get_dlib_detector(path)


def run_alignment(image_path):
    """FFHQ-align one image (reference :73-81). Returns a PIL image."""
    import numpy as np
    from PIL import Image

    from stylegan3_editing_tpu.utils.alignment_utils import (
        align_face_from_landmarks, get_landmark)

    pair = _dlib_pair()
    if pair is None:
        return None
    detector, predictor = pair
    lm = get_landmark(str(image_path), detector, predictor)
    img = Image.open(image_path).convert("RGB")
    return align_face_from_landmarks(img, np.asarray(lm))


def crop_image(image_path):
    """Fixed-crop variant (reference :84-91)."""
    import numpy as np
    from PIL import Image

    from stylegan3_editing_tpu.utils.alignment_utils import (
        crop_face_from_landmarks, get_landmark)

    pair = _dlib_pair()
    if pair is None:
        return None
    detector, predictor = pair
    lm = get_landmark(str(image_path), detector, predictor)
    img = Image.open(image_path).convert("RGB")
    return crop_face_from_landmarks(img, np.asarray(lm))


def compute_transforms(aligned_path, cropped_path):
    """Landmark transform bridging cropped→aligned (reference :94-101);
    feeds the generator's `transform` input for unaligned synthesis."""
    from stylegan3_editing_tpu.utils.alignment_utils import (
        get_stylegan_transform_from_landmarks, get_landmark)

    pair = _dlib_pair()
    if pair is None:
        return None
    detector, predictor = pair
    import numpy as np
    from PIL import Image

    lm_c = np.asarray(get_landmark(str(cropped_path), detector, predictor))
    lm_a = np.asarray(get_landmark(str(aligned_path), detector, predictor))
    res = get_stylegan_transform_from_landmarks(
        lm_c, lm_a, Image.open(aligned_path).convert("RGB"))
    if res is None:
        print(f"Failed computing transforms on: {cropped_path}")
        return None
    return res
