"""Tests: alignment math, temporal smoothing, video editors, config parsing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from stylegan3_editing_tpu.models.sg3 import Generator, SG3Config
from stylegan3_editing_tpu.utils import alignment_utils as au
from stylegan3_editing_tpu.video.post_processing import (
    average_fine_layers,
    smooth_s,
    smooth_ws,
)
from stylegan3_editing_tpu.video.video_config import VideoConfig
from stylegan3_editing_tpu.video.video_editor import InterFaceGANVideoEditor

RNG = np.random.RandomState(0)


def synthetic_landmarks(cx=256.0, cy=256.0, eye_dist=80.0, angle_deg=0.0):
    """68-point landmark stub with controllable eyes/mouth geometry."""
    lm = np.zeros((68, 2))
    theta = np.radians(angle_deg)
    rot = np.array([[np.cos(theta), -np.sin(theta)],
                    [np.sin(theta), np.cos(theta)]])
    left = np.array([-eye_dist / 2, 0.0]) @ rot.T + [cx, cy]
    right = np.array([eye_dist / 2, 0.0]) @ rot.T + [cx, cy]
    mouth = np.array([0.0, eye_dist]) @ rot.T + [cx, cy]
    lm[36:42] = left
    lm[42:48] = right
    lm[48] = mouth + [-20, 0]
    lm[54] = mouth + [20, 0]
    return lm


def test_alignment_positions_geometry():
    lm = synthetic_landmarks()
    c, x, y = au.get_alignment_positions_from_landmarks(lm)
    # x axis is horizontal for an upright face; scale = 2×eye distance.
    np.testing.assert_allclose(np.hypot(*x), 160.0, rtol=1e-6)
    assert abs(x[1]) < 1e-6
    quad, qsize = au.get_alignment_transformation(c, x, y)
    assert quad.shape == (4, 2) and qsize == pytest.approx(320.0)


def test_rotation_from_eyes():
    lm_a = synthetic_landmarks(angle_deg=0.0)
    lm_u = synthetic_landmarks(angle_deg=-10.0)
    al, ar = au.get_eyes_coors(lm_a)
    ul, ur = au.get_eyes_coors(lm_u)
    r = au.get_rotation_from_eyes(ul, ur, al, ar)
    assert r == pytest.approx(10.0, abs=0.2)


def test_crop_face_by_transform_shapes():
    img = Image.fromarray((RNG.rand(512, 512, 3) * 255).astype(np.uint8))
    lm = synthetic_landmarks()
    aligned = au.align_face_from_landmarks(img, lm, output_size=128)
    assert aligned.size == (128, 128)
    cropped = au.crop_face_from_landmarks(img, lm, output_size=128)
    assert cropped.size == (128, 128)


def test_get_stylegan_transform_identity():
    lm = synthetic_landmarks()
    img = Image.fromarray(np.zeros((512, 512, 3), np.uint8))
    angle, translation, transform, inverse = \
        au.get_stylegan_transform_from_landmarks(lm, lm, img)
    assert angle in (0.0, 360.0) or angle == pytest.approx(0.0, abs=1e-3)
    np.testing.assert_allclose(transform @ inverse, np.eye(3), atol=1e-6)


# ------------------------------------------------------------ smoothing

def test_smooth_ws_formula():
    x = RNG.randn(10, 3).astype(np.float32)
    got = np.asarray(smooth_ws(x))
    want = (x[2:-2] + 0.75 * x[3:-1] + 0.75 * x[1:-3]
            + 0.25 * x[:-4] + 0.25 * x[4:]) / 3
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert got.shape == (6, 3)


def test_smooth_s_roundtrip():
    frames = [{"input": RNG.randn(1, 4).astype(np.float32),
               "L0": RNG.randn(1, 8).astype(np.float32)} for _ in range(7)]
    out = smooth_s(frames)
    assert len(out) == 3  # 7 - 4
    assert out[0]["L0"].shape == (1, 8)


def test_average_fine_layers():
    lat = RNG.randn(5, 12, 4).astype(np.float32)
    out = average_fine_layers(lat, from_idx=9)
    np.testing.assert_allclose(out[:, 9:], np.broadcast_to(
        lat[:, 9:].mean(axis=0), (5, 3, 4)), rtol=1e-6)
    np.testing.assert_allclose(out[:, :9], lat[:, :9])


# ---------------------------------------------------------- config parsing

def test_video_config_edit_parsing():
    cfg = VideoConfig(interfacegan_directions=["age", "smile"],
                      interfacegan_ranges=["(-4_5)", "(2_3)"],
                      styleclip_directions=["smiling"],
                      styleclip_alpha_betas=["(4_0.13)"])
    edits = cfg.interfacegan_edits()
    assert edits[0].start == -4 and edits[0].end == 5
    sc = cfg.styleclip_edits()
    assert sc[0].alpha == 4.0 and sc[0].beta == pytest.approx(0.13)
    with pytest.raises(ValueError):
        VideoConfig(interfacegan_directions=["age"],
                    interfacegan_ranges=[]).interfacegan_edits()


# ---------------------------------------------------------- video editor

@pytest.mark.slow
def test_interfacegan_video_editor(tmp_path):
    cfg = SG3Config(img_resolution=32, channel_base=512, channel_max=32,
                    num_layers=4, num_critical=2, use_bf16=False)
    model = Generator(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, cfg.z_dim)))
    direction = RNG.randn(1, cfg.w_dim).astype(np.float32)
    editor = InterFaceGANVideoEditor(model, variables, 32, tmp_path,
                                     {"age": direction})
    frames = 6
    latents = RNG.randn(frames, cfg.num_ws, cfg.w_dim).astype(np.float32)
    transforms = [np.eye(3, dtype=np.float32)] * frames
    img_s, img_e, lat_s, lat_e = editor.edit("age", -2, 2, latents, transforms)
    assert img_s.shape == (frames, 32, 32, 3)
    assert (tmp_path / "latents" / "latents_age_start.npy").exists()

    smoothed_t = np.repeat(np.eye(3, dtype=np.float32)[None], frames - 4, 0)
    frames_out = editor.postprocess_and_smooth_edits(lat_s, smoothed_t)
    assert len(frames_out) == frames - 4
    assert frames_out[0].shape == (32, 32, 3)
