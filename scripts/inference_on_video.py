"""End-to-end video inversion + editing pipeline (CLI).

Parity: reference inversion/video/inference_on_video.py — parse→align/crop→
landmark transforms→per-frame ReStyle inversion→smoothing→videos→optional
InterFaceGAN/StyleCLIP edits. TPU-first: frames invert in batches; edits
render as batched synthesis.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax.numpy as jnp
from PIL import Image

from stylegan3_editing_tpu.configs import model_paths
from stylegan3_editing_tpu.data.transforms import compose, pil_to_array, resize
from stylegan3_editing_tpu.models.encoders import get_average_image, run_restyle_iterations
from stylegan3_editing_tpu.models.sg3 import Generator, sg3_r_config
from stylegan3_editing_tpu.utils.cli import parse_dataclass
from stylegan3_editing_tpu.utils.common import generate_mp4
from stylegan3_editing_tpu.utils.inference_utils import load_encoder
from stylegan3_editing_tpu.video.post_processing import postprocess_and_smooth_inversions, smooth_ws
from stylegan3_editing_tpu.video.video_config import VideoConfig
from stylegan3_editing_tpu.video.video_editor import InterFaceGANVideoEditor
from stylegan3_editing_tpu.video.video_handler import LandmarksHandler, VideoHandler


def _dlib_landmark_fn():
    from stylegan3_editing_tpu.utils.alignment_utils import get_dlib_detector

    detector, predictor = get_dlib_detector(model_paths["shape_predictor"])

    def fn(img: Image.Image) -> np.ndarray:
        arr = np.asarray(img.convert("RGB"))
        shape = None
        for det in detector(arr, 1):
            shape = predictor(arr, det)
        assert shape is not None, "no face found"
        return np.array([[p.x, p.y] for p in shape.parts()])

    return fn


def run_inference_on_video(opts: VideoConfig):
    out = Path(opts.output_path)
    out.mkdir(parents=True, exist_ok=True)

    landmark_fn = _dlib_landmark_fn()
    handler = VideoHandler(opts.video_path, out, landmark_fn,
                           max_frames=opts.max_frames)
    frames, aligned, cropped = handler.parse_video()

    lm = LandmarksHandler(out, opts.landmarks_transforms_path,
                          landmark_fn=landmark_fn)
    transforms = lm.get_landmarks_transforms(frames, handler.cropped_frames_path,
                                             handler.aligned_frames_path)

    model, variables, train_opts = load_encoder(opts.checkpoint_path)
    avg_image, latent_avg = get_average_image(model, variables)
    res = model.decoder_cfg.img_resolution

    prep = compose(resize(256), pil_to_array)
    names = [p.name for p in aligned if p.name in transforms]
    result_latents, frame_transforms = {}, []
    for start in range(0, len(names), opts.batch_size):
        batch_names = names[start:start + opts.batch_size]
        x = jnp.asarray(np.stack(
            [prep(Image.open(handler.aligned_frames_path / n)) for n in batch_names]))
        lmt = jnp.asarray(np.stack(
            [np.asarray(transforms[n][-1], np.float32) for n in batch_names]))
        results = run_restyle_iterations(model, variables, x, avg_image,
                                         latent_avg,
                                         n_iters=opts.n_iters_per_batch,
                                         landmarks_transform=lmt,
                                         force_fp32=not opts.bf16_decode)
        final_codes = results[-1][2]
        for bi, n in enumerate(batch_names):
            result_latents[n] = np.asarray(final_codes[bi])
            frame_transforms.append(np.asarray(transforms[n][-1], np.float32))

    decoder = Generator(model.decoder_cfg)
    dec_vars = {c: variables[c]["decoder"] for c in ("params", "buffers", "ema")}
    smoothed = postprocess_and_smooth_inversions(
        result_latents, frame_transforms, decoder, dec_vars, res,
        expansion_amounts=opts.expansion_amounts)

    inputs = [Image.open(handler.cropped_frames_path / n) for n in names]
    generate_mp4(out / "input_video",
                 [np.asarray(im) for im in inputs], {"fps": opts.fps})
    generate_mp4(out / "result_video_smoothed", smoothed, {"fps": opts.fps})

    # Optional InterFaceGAN edits.
    if opts.interfacegan_directions:
        directions = {}
        for name in opts.interfacegan_directions:
            path = Path(model_paths["interfacegan_boundaries"]) / f"{name}_boundary.npy"
            directions[name] = np.load(path)
        editor = InterFaceGANVideoEditor(decoder, dec_vars, res, out,
                                         directions, opts.expansion_amounts)
        latents_arr = np.stack(list(result_latents.values()))
        smoothed_t = np.asarray(smooth_ws(np.stack(frame_transforms)))
        for edit in opts.interfacegan_edits():
            _, _, lat_start, lat_end = editor.edit(
                edit.direction, edit.start, edit.end, latents_arr,
                frame_transforms)
            for tag, lat in (("start", lat_start), ("end", lat_end)):
                frames_e = editor.postprocess_and_smooth_edits(lat, smoothed_t)
                editor.generate_edited_video(
                    inputs, smoothed, frames_e, opts.fps,
                    f"edited_video_{edit.direction}_{tag}")
    print(f"video pipeline done: {len(names)} frames → {out}")


if __name__ == "__main__":
    run_inference_on_video(parse_dataclass(VideoConfig))
