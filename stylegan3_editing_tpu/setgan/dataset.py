"""Class-consistent multi-set data sampling for SetGAN training.

Parity: reference setgan/dataset.py — `ImagesDataset.from_folder /
by_category` loaders (:128-226), per-dataset wiring (:309-366), and
`ImageMultiSetGenerator` (:441-574: samples class-consistent reference /
candidate sets with optional flip augmentation, sharded by rank), plus
`SafeDataset` (safe_dataset.py: index-skipping wrapper for corrupt samples).

TPU-first: variable set sizes (reference randomizes 7–12 / 1–4 per step)
are PADDED to static maxima with boolean masks → one compiled train step.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from ..data.images_dataset import IMG_EXTENSIONS


class ClassImageDataset:
    """class id → image paths; loads float32 NHWC in [-1, 1]."""

    def __init__(self, class_to_paths: Dict[int, List[Path]], resolution: int):
        self.class_to_paths = {k: list(v) for k, v in class_to_paths.items()
                               if len(v) > 0}
        self.classes = sorted(self.class_to_paths)
        self.resolution = resolution

    @classmethod
    def from_folder(cls, root, resolution: int = 256) -> "ClassImageDataset":
        """Each immediate subdirectory is a class; flat folders = 1 class.
        `.zip` archives load via `from_zip` (the reference's dataset2.py
        zip-backed variant)."""
        root = Path(root)
        if root.suffix.lower() == ".zip":
            return cls.from_zip(root, resolution)
        subdirs = [d for d in sorted(root.iterdir()) if d.is_dir()]
        mapping: Dict[int, List[Path]] = {}
        if subdirs:
            for i, d in enumerate(subdirs):
                mapping[i] = [p for p in sorted(d.rglob("*"))
                              if p.suffix.lower() in IMG_EXTENSIONS]
        else:
            mapping[0] = [p for p in sorted(root.iterdir())
                          if p.suffix.lower() in IMG_EXTENSIONS]
        return cls(mapping, resolution)

    @classmethod
    def from_zip(cls, path, resolution: int = 256) -> "ClassImageDataset":
        """Zip-backed dataset: top-level archive directories are classes."""
        import zipfile

        zf = zipfile.ZipFile(path)
        mapping: Dict[int, List[str]] = {}
        class_names: Dict[str, int] = {}
        for name in sorted(zf.namelist()):
            if not any(name.lower().endswith(e) for e in IMG_EXTENSIONS):
                continue
            cls_name = name.split("/")[0] if "/" in name else ""
            if cls_name not in class_names:
                class_names[cls_name] = len(class_names)
            mapping.setdefault(class_names[cls_name], []).append(name)
        ds = cls(mapping, resolution)
        ds._zip = zf
        return ds

    _zip = None  # set by from_zip

    def load(self, path) -> np.ndarray:
        if self._zip is not None:
            import io
            with self._zip.open(str(path)) as f:
                im = Image.open(io.BytesIO(f.read()))
        else:
            im = Image.open(path)
        im = im.convert("RGB").resize(
            (self.resolution, self.resolution), Image.BILINEAR)
        return np.asarray(im, np.float32) / 127.5 - 1.0

    def num_images(self) -> int:
        return sum(len(v) for v in self.class_to_paths.values())


class SafeClassImageDataset(ClassImageDataset):
    """Skips samples that fail to decode, resampling within the class
    (parity: setgan/safe_dataset.py index-skipping)."""

    def load(self, path: Path) -> np.ndarray:
        try:
            return super().load(path)
        except Exception:
            pass
        # Fall back to any decodable image of the same class.
        for cls_paths in self.class_to_paths.values():
            if path in cls_paths:
                for alt in cls_paths:
                    if alt == path:
                        continue
                    try:
                        return super().load(alt)
                    except Exception:
                        continue
        raise RuntimeError(f"no decodable image near {path}")


class ImageMultiSetGenerator:
    """Infinite sampler of (reference_set, candidate_set, masks) batches.

    Reference/candidate sizes are drawn uniformly in [r_min, r_max] /
    [c_min, c_max] per batch element, padded to the maxima with masks.
    `shard`/`num_shards` split the RNG stream across hosts
    (setgan/dataset.py:456 rank/world_size).
    """

    def __init__(self, dataset: ClassImageDataset, batch_size: int,
                 reference_range: Tuple[int, int] = (7, 12),
                 candidate_range: Tuple[int, int] = (1, 4),
                 flip_augment: bool = True,
                 shard: int = 0, num_shards: int = 1, seed: int = 0):
        self.ds = dataset
        self.batch_size = batch_size
        self.r_min, self.r_max = reference_range
        self.c_min, self.c_max = candidate_range
        self.flip_augment = flip_augment
        self.rng = np.random.RandomState(seed * num_shards + shard)

    def _sample_class_set(self, cls: int, count: int) -> List[np.ndarray]:
        paths = self.ds.class_to_paths[cls]
        replace = len(paths) < count
        idx = self.rng.choice(len(paths), size=count, replace=replace)
        imgs = [self.ds.load(paths[i]) for i in idx]
        if self.flip_augment:
            imgs = [im[:, ::-1] if self.rng.rand() < 0.5 else im for im in imgs]
        return imgs

    def sample_batch(self):
        """→ dict(reference [B,Rmax,H,W,3], candidate [B,Cmax,H,W,3],
        ref_mask [B,Rmax], cand_mask [B,Cmax], classes [B])."""
        res = self.ds.resolution
        b = self.batch_size
        r_sizes = self.rng.randint(self.r_min, self.r_max + 1, size=b)
        c_sizes = self.rng.randint(self.c_min, self.c_max + 1, size=b)
        reference = np.zeros((b, self.r_max, res, res, 3), np.float32)
        candidate = np.zeros((b, self.c_max, res, res, 3), np.float32)
        ref_mask = np.zeros((b, self.r_max), bool)
        cand_mask = np.zeros((b, self.c_max), bool)
        classes = self.rng.choice(self.ds.classes, size=b)
        for i, cls in enumerate(classes):
            imgs = self._sample_class_set(int(cls), r_sizes[i] + c_sizes[i])
            reference[i, :r_sizes[i]] = imgs[:r_sizes[i]]
            candidate[i, :c_sizes[i]] = imgs[r_sizes[i]:]
            ref_mask[i, :r_sizes[i]] = True
            cand_mask[i, :c_sizes[i]] = True
        return {"reference": reference, "candidate": candidate,
                "ref_mask": ref_mask, "cand_mask": cand_mask,
                "classes": classes}

    def __iter__(self):
        while True:
            yield self.sample_batch()
