"""ID-similarity metric over inversion outputs (CurricularFace IR-101).

Parity: reference inversion/scripts/calc_id_loss_parallel.py — embeds
reconstructions + ground truth with an IR-101 face net and reports mean
cosine similarity. Faces are MTCNN-aligned 112² warps exactly like the
reference (mtcnn.align(), calc_id_loss_parallel.py:115) when the released
detector weights are present; without them the script falls back to the
center crop (35:223, 32:220 of the 256² face — criteria/id_loss.py:22) and
says so. The reference's multiprocess pool becomes one batched jitted
embedding pass.
"""

from __future__ import annotations

import dataclasses
import json
import sys
from pathlib import Path
from typing import Optional

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
from PIL import Image

from stylegan3_editing_tpu.configs import model_paths
from stylegan3_editing_tpu.data.transforms import compose, pil_to_array, resize
from stylegan3_editing_tpu.models.backbones.irse import IRSEBackbone, convert_irse_state
from stylegan3_editing_tpu.models.mtcnn import MTCNN
from stylegan3_editing_tpu.ops.image import adaptive_avg_pool2d
from stylegan3_editing_tpu.utils.cli import parse_dataclass


@dataclasses.dataclass
class IDLossCalcOptions:
    output_path: str = "./inference_results"
    gt_path: str = "./gt_images"
    batch_size: int = 4
    curricular_face_path: Optional[str] = None  # torch state dict (.pth)
    # MTCNN .npy weight files; default to the configs registry paths. When
    # all three exist, faces are detector-aligned like the reference.
    mtcnn_pnet: str = str(model_paths["mtcnn_pnet"])
    mtcnn_rnet: str = str(model_paths["mtcnn_rnet"])
    mtcnn_onet: str = str(model_paths["mtcnn_onet"])


def _build_aligner(opts: IDLossCalcOptions) -> Optional[MTCNN]:
    paths = [opts.mtcnn_pnet, opts.mtcnn_rnet, opts.mtcnn_onet]
    if all(Path(p).exists() for p in paths):
        return MTCNN.from_npy(*paths)
    print("WARNING: MTCNN weights not found "
          f"({', '.join(str(p) for p in paths)}); falling back to the "
          "center-crop protocol — similarities are NOT comparable to "
          "reference-published MTCNN-aligned numbers")
    return None


def run(opts: IDLossCalcOptions):
    net = IRSEBackbone(input_size=112, num_layers=100, mode="ir",
                       drop_ratio=0.4, affine=False)
    if opts.curricular_face_path:
        import torch

        state = {k: v.numpy() for k, v in torch.load(
            opts.curricular_face_path, map_location="cpu").items()}
        variables = convert_irse_state(state, num_layers=100, affine=False)
    else:
        variables = net.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 112, 112, 3)))
        print("WARNING: CurricularFace weights not provided; similarities "
              "use a randomly initialized IR-101")

    aligner = _build_aligner(opts)
    prep = compose(resize(256), pil_to_array)

    @jax.jit
    def embed_center_crop(imgs):
        faces = adaptive_avg_pool2d(imgs[:, 35:223, 32:220, :], 112)
        return net.apply(variables, faces)

    @jax.jit
    def embed_aligned(faces):
        return net.apply(variables, faces)

    def load_face(path: Path) -> Optional[np.ndarray]:
        """→ [112, 112, 3] in [-1, 1] (aligned) or [256, 256, 3] (crop)."""
        img = Image.open(path).convert("RGB")
        if aligner is None:
            return prep(img)
        face, _ = aligner.align(np.asarray(img))
        if face is None:
            return None
        # reference id_transform: ToTensor + Normalize(.5, .5) → [-1, 1]
        return np.asarray(face, np.float32) / 127.5 - 1.0

    embed = embed_center_crop if aligner is None else embed_aligned

    out_root = Path(opts.output_path)
    step_dirs = sorted(out_root.glob("step_*")) or [out_root]
    results = {}
    for step_dir in step_dirs:
        sims = []
        names = sorted(p.name for p in step_dir.iterdir()
                       if p.suffix.lower() in (".png", ".jpg", ".jpeg"))
        batch_a, batch_b = [], []

        def flush():
            if not batch_a:
                return
            ea = embed(jnp.asarray(np.stack(batch_a)))
            eb = embed(jnp.asarray(np.stack(batch_b)))
            sims.extend(np.asarray(jnp.sum(ea * eb, axis=-1)).tolist())
            batch_a.clear()
            batch_b.clear()

        for n in names:
            a = load_face(step_dir / n)
            b = load_face(Path(opts.gt_path) / n)
            if a is None or b is None:  # reference skips undetected faces
                print(f"skipping {n} (no face detected)")
                continue
            batch_a.append(a)
            batch_b.append(b)
            if len(batch_a) == opts.batch_size:
                flush()
        flush()
        results[step_dir.name] = {"mean": float(np.mean(sims)),
                                  "std": float(np.std(sims)), "n": len(sims)}
        print(f"id_similarity {step_dir.name}: "
              f"{results[step_dir.name]['mean']:.4f} "
              f"± {results[step_dir.name]['std']:.4f}")
    with open(out_root / "id_scores.json", "w") as f:
        json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    run(parse_dataclass(IDLossCalcOptions))
