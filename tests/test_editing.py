"""Tests: InterFaceGAN editor, StyleCLIP global directions + mapper, FOV
expander, CLIP model."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan3_editing_tpu.editing.interfacegan import (
    FaceEditor,
    pseudo_align_latents,
    train_boundary,
)
from stylegan3_editing_tpu.editing.styleclip_global import (
    StyleCLIPGlobalDirection,
    apply_delta_s,
    compute_delta_i_c,
    compute_s_statistics,
    features_channels_to_s,
)
from stylegan3_editing_tpu.editing.styleclip_mapper import (
    LevelsMapper,
    Mapper,
    MapperCoach,
    MapperTrainOptions,
    StyleCLIPMapperNet,
)
from stylegan3_editing_tpu.models.backbones.clip import CLIP
from stylegan3_editing_tpu.models.sg3 import Generator, SG3Config
from stylegan3_editing_tpu.utils.fov_expansion import Expander

RNG = np.random.RandomState(0)


def tiny_cfg():
    return SG3Config(img_resolution=32, channel_base=512, channel_max=32,
                     num_layers=4, num_critical=2, use_bf16=False)


@pytest.fixture(scope="module")
def gen():
    cfg = tiny_cfg()
    model = Generator(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, cfg.z_dim)))
    return cfg, model, variables


# -------------------------------------------------------------- interfacegan

def test_face_editor_factor_range(gen):
    cfg, model, variables = gen
    direction = RNG.randn(1, cfg.w_dim).astype(np.float32)
    editor = FaceEditor(model, variables, directions={"age": direction})
    ws = jnp.asarray(RNG.randn(2, cfg.num_ws, cfg.w_dim).astype(np.float32))

    images, latents = editor.edit(ws, "age", factor_range=(-2, 2))
    assert len(images) == 4 and len(latents) == 4
    assert images[0].shape == (2, 32, 32, 3)
    # factor 0 leaves latents unchanged.
    np.testing.assert_allclose(np.asarray(latents[2]), np.asarray(ws), atol=0)

    img_single, lat_single = editor.edit(ws, "age", factor=-2)
    np.testing.assert_allclose(np.asarray(lat_single), np.asarray(latents[0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(img_single), np.asarray(images[0]),
                               rtol=1e-4, atol=1e-4)


def test_train_boundary_recovers_direction():
    true_normal = np.zeros(16, np.float32)
    true_normal[3] = 1.0
    codes = RNG.randn(600, 16).astype(np.float32)
    scores = (codes @ true_normal)[:, None]
    boundary = train_boundary(codes, scores, chosen_num_or_ratio=0.25)
    assert boundary.shape == (1, 16)
    cos = abs(float(boundary[0] @ true_normal))
    assert cos > 0.95


def test_pseudo_align(gen):
    cfg, _, _ = gen
    ws = jnp.asarray(RNG.randn(2, cfg.num_ws, cfg.w_dim).astype(np.float32))
    w_avg = jnp.asarray(RNG.randn(cfg.w_dim).astype(np.float32))
    out = pseudo_align_latents(ws, w_avg)
    np.testing.assert_allclose(np.asarray(out[:, 0]),
                               np.broadcast_to(np.asarray(w_avg), (2, cfg.w_dim)))
    np.testing.assert_allclose(np.asarray(out[:, 1:]), np.asarray(ws[:, 1:]))


# ------------------------------------------------------------ fov expansion

def test_fov_expander(gen):
    cfg, model, variables = gen
    ws = jnp.asarray(RNG.randn(1, cfg.num_ws, cfg.w_dim).astype(np.float32))
    exp = Expander(model, variables, cfg.img_resolution)
    lm = np.eye(3, dtype=np.float32)
    out = exp.generate_expanded_image(ws, lm, pixels_left=4, pixels_top=2,
                                      pixels_right=3, pixels_bottom=0)
    assert out.shape == (1, 2 + 32 + 0, 4 + 32 + 3, 3)
    # Center matches a plain synthesis.
    plain = model.apply(variables, ws, transform=jnp.asarray(lm),
                        method=model.synthesize)
    np.testing.assert_allclose(np.asarray(out[:, 2:34, 4:36]),
                               np.asarray(plain), rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------------- CLIP

@pytest.fixture(scope="module")
def tiny_clip():
    model = CLIP(embed_dim=32, image_resolution=64, vision_width=64,
                 vision_layers=2, vision_patch=32, text_width=32,
                 text_layers=2, text_heads=4)
    img = jnp.zeros((1, 64, 64, 3))
    txt = jnp.zeros((1, 77), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), img, txt)
    return model, variables


def test_clip_forward(tiny_clip):
    model, variables = tiny_clip
    img = jnp.asarray(RNG.randn(2, 64, 64, 3).astype(np.float32))
    txt = jnp.asarray(RNG.randint(1, 100, (3, 77)).astype(np.int32))
    li, lt = model.apply(variables, img, txt)
    assert li.shape == (2, 3) and lt.shape == (3, 2)
    np.testing.assert_allclose(np.asarray(li), np.asarray(lt).T, rtol=1e-5)


# --------------------------------------------------------- styleclip global

def test_s_statistics_and_global_direction(gen, tiny_clip):
    cfg, model, variables = gen
    transform, s_mean, s_std, s_1k = compute_s_statistics(
        model, variables, num_images=64, batch=32)
    assert "input" in s_mean and set(transform) == {"theta", "x", "y"}
    layer_keys = [k for k in s_mean if k != "input"]
    assert len(layer_keys) == cfg.num_layers + 1

    total_channels = sum(s_mean[k].shape[0] for k in s_mean)
    clip_model, clip_vars = tiny_clip
    # Fake delta_i_c with the tiny clip's embed dim.
    delta_i_c = RNG.randn(total_channels, 32).astype(np.float32)

    class TokStub:
        def tokenize(self, texts):
            return np.ones((len(texts), 77), np.int32)

    gd = StyleCLIPGlobalDirection(delta_i_c, s_std, ["a photo of a {}."],
                                  {k: v[None] for k, v in s_mean.items()},
                                  clip_model, clip_vars, TokStub())
    delta_s = gd.get_delta_s("face", "smiling face", beta=0.1)
    assert set(delta_s) == set(s_mean)

    # Apply in StyleSpace and synthesize.
    z = jnp.asarray(RNG.randn(1, cfg.z_dim).astype(np.float32))
    ws = model.apply(variables, z, method=model.map)
    all_s = model.apply(variables, ws, method=model.w2s)
    edited = apply_delta_s(all_s, delta_s, alpha=2.0)
    np.testing.assert_array_equal(np.asarray(edited["input"]),
                                  np.asarray(all_s["input"]))
    img = model.apply(variables, None, all_s=edited, method=model.synthesize)
    base = model.apply(variables, None, all_s=all_s, method=model.synthesize)
    assert img.shape == base.shape
    assert not np.allclose(np.asarray(img), np.asarray(base), atol=1e-4)


def test_compute_delta_i_c_shapes(gen, tiny_clip):
    cfg, model, variables = gen
    clip_model, clip_vars = tiny_clip
    _, s_mean, s_std, s_1k = compute_s_statistics(model, variables,
                                                  num_images=8, batch=8)
    # Restrict to a tiny S space: perturb only 'input' (4 channels).
    small = {k: v[:1] for k, v in s_1k.items()}
    d = compute_delta_i_c(model, variables, clip_model, clip_vars,
                          small, s_mean, s_std, channels_per_batch=4)
    total_channels = sum(v.shape[-1] for v in small.values())
    assert d.shape == (total_channels, 32)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, rtol=1e-4)


# --------------------------------------------------------- styleclip mapper

def test_levels_mapper_shapes():
    m = LevelsMapper(no_fine_mapper=True)
    w = jnp.asarray(RNG.randn(2, 16, 512).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), w)
    out = m.apply(v, w)
    assert out.shape == w.shape
    np.testing.assert_array_equal(np.asarray(out[:, 8:]), 0)
    assert not np.allclose(np.asarray(out[:, :5]), 0)


def test_mapper_coach_step(gen):
    cfg, model, variables = gen
    # Tiny CLIP matching the decoder resolution (32² → pool k=1).
    opts = MapperTrainOptions(clip_lambda=0.0, id_lambda=0.0,
                              latent_l2_lambda=1.0, learning_rate=0.1)
    coach = MapperCoach(opts, cfg, decoder_variables=variables,
                        text_tokens=np.ones((1, 77), np.int32))
    w = RNG.randn(2, cfg.num_ws, cfg.w_dim).astype(np.float32)
    m1 = coach.train_step(w)
    m2 = coach.train_step(w)
    assert np.isfinite(m1["loss"]) and m2["loss"] <= m1["loss"] * 1.5


# ------------------------------------------------ gen_utils / spectrum

def test_slerp_lerp_paths():
    """Interpolation helpers (reference gen_utils.py:175-230)."""
    import numpy as np

    from stylegan3_editing_tpu.utils.gen_utils import (
        interpolation_path, lerp, slerp)

    a = np.array([1.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0])
    t = np.array([0.0, 0.5, 1.0])
    l = np.asarray(lerp(a, b, t))
    np.testing.assert_allclose(l[0], a, atol=1e-6)
    np.testing.assert_allclose(l[-1], b, atol=1e-6)
    s = np.asarray(slerp(a, b, t))
    np.testing.assert_allclose(s[0], a, atol=1e-5)
    np.testing.assert_allclose(s[-1], b, atol=1e-5)
    # slerp midpoint keeps unit norm on the sphere (lerp shrinks to ~0.707)
    assert abs(np.linalg.norm(s[1]) - 1.0) < 1e-5
    # near-parallel fallback
    sp = np.asarray(slerp(a, a, t))
    assert np.isfinite(sp).all()

    keys = np.stack([a, b, a])
    path = np.asarray(interpolation_path(jnp.asarray(keys), 4, mode="slerp"))
    assert path.shape == (9, 3)
    np.testing.assert_allclose(path[-1], a, atol=1e-5)


def test_spectrum_tools():
    """FFT spectrum analysis (reference utils_spectrum.py:5-155): a pure
    sinusoid concentrates azimuthal power at its frequency radius."""
    import numpy as np

    from stylegan3_editing_tpu.utils.spectrum import (
        azimuthal_average, power_spectrum, spectrum_stats)

    n, size, k = 2, 64, 8
    x = np.arange(size)
    img = np.sin(2 * np.pi * k * x / size)[None, None, :] * np.ones(
        (n, size, 1))
    power = power_spectrum(jnp.asarray(img), normalize=True)
    assert power.shape == (n, size, size)
    prof = np.asarray(azimuthal_average(power))
    peak = int(np.argmax(prof[0]))
    assert abs(peak - k) <= 1, f"power peak at radius {peak}, expected ~{k}"
    stats = spectrum_stats(jnp.asarray(img))
    assert stats["mean"].shape == stats["std"].shape
    assert np.isfinite(np.asarray(stats["mean"])).all()


def test_interpolation_video(tmp_path):
    """End-to-end seed interpolation video through a slim generator
    (reference gen_utils video helpers)."""
    from stylegan3_editing_tpu.models.sg3 import Generator, sg3_r_config
    from stylegan3_editing_tpu.utils.gen_utils import interpolation_video

    cfg = sg3_r_config(32, channel_base=512, channel_max=32, num_layers=4,
                       use_bf16=False)
    model = Generator(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, cfg.z_dim)))
    out = tmp_path / "interp"
    n = interpolation_video(model, variables, seeds=[0, 1], out_path=str(out),
                            frames_per_segment=3, batch=4)
    mp4 = tmp_path / "interp.mp4"
    frames_dir = tmp_path / "interp_frames"
    assert n == 4
    assert (mp4.exists() and mp4.stat().st_size > 0) or \
        (frames_dir.exists() and len(list(frames_dir.glob("*.png"))) == 4)


# ------------------------------------------------- inversion fidelity harness

@pytest.mark.slow
def test_inversion_fidelity_harness_exact_parity(tmp_path):
    """scripts/eval_inversion_fidelity.py end-to-end in random-init mode:
    identical weights through this framework and the reference torch path
    must give a near-zero LPIPS delta (the <0.5 BASELINE bar is for real
    released weights; exact parity is the expectation here)."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).parent.parent
    out = tmp_path / "fidelity.json"
    r = subprocess.run(
        [sys.executable, str(repo / "scripts" / "eval_inversion_fidelity.py"),
         "--resolution", "64", "--channel_base", "2048", "--channel_max",
         "64", "--num_layers", "6", "--num", "2", "--n_iters", "2",
         "--out", str(out)],
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        capture_output=True, text=True, timeout=2400)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    rec = json.loads(out.read_text())
    assert rec["pass"] and rec["lpips_delta"] < 0.05, rec
    assert rec["recon_max_abs_diff"] < 0.05, rec
