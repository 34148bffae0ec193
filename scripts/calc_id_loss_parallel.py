"""ID-similarity metric over inversion outputs (CurricularFace IR-101).

Parity: reference inversion/scripts/calc_id_loss_parallel.py — embeds
reconstructions + ground truth with an IR-101 face net (MTCNN-aligned in
the reference; here center-crop fallback when no detector is available) and
reports mean cosine similarity. The reference's multiprocess pool becomes
one batched jitted embedding pass.
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

from stylegan3_editing_tpu.data.transforms import compose, pil_to_array, resize
from stylegan3_editing_tpu.models.backbones.irse import IRSEBackbone, convert_irse_state
from stylegan3_editing_tpu.ops.image import adaptive_avg_pool2d
from stylegan3_editing_tpu.utils.cli import parse_dataclass


@dataclasses.dataclass
class IDLossCalcOptions:
    output_path: str = "./inference_results"
    gt_path: str = "./gt_images"
    batch_size: int = 4
    curricular_face_path: Optional[str] = None  # torch state dict (.pth)


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

    prep = compose(resize(256), pil_to_array)

    @jax.jit
    def embed(imgs):
        faces = adaptive_avg_pool2d(imgs[:, 35:223, 32:220, :], 112)
        return net.apply(variables, faces)

    out_root = Path(opts.output_path)
    step_dirs = sorted(out_root.glob("step_*")) or [out_root]
    results = {}
    for step_dir in step_dirs:
        sims = []
        names = sorted(p.name for p in step_dir.iterdir()
                       if p.suffix.lower() in (".png", ".jpg", ".jpeg"))
        for start in range(0, len(names), opts.batch_size):
            chunk = names[start:start + opts.batch_size]
            a = jnp.asarray(np.stack(
                [prep(Image.open(step_dir / n)) for n in chunk]))
            b = jnp.asarray(np.stack(
                [prep(Image.open(Path(opts.gt_path) / n)) for n in chunk]))
            ea, eb = embed(a), embed(b)
            sims.extend(np.asarray(jnp.sum(ea * eb, axis=-1)).tolist())
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
