"""Unit/integration tests for the alias-free generator (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stylegan3_editing_tpu.models.sg3 import (
    Generator,
    SG3Config,
    sg3_r_config,
    sg3_t_config,
)
from stylegan3_editing_tpu.models.sg3.config import build_synthesis_layout


def tiny_cfg(**kw):
    base = dict(
        img_resolution=64,
        channel_base=2048,
        channel_max=64,
        num_layers=6,
        use_bf16=False,
    )
    base.update(kw)
    return SG3Config(**base)


@pytest.fixture(scope="module")
def tiny_gen():
    cfg = tiny_cfg()
    model = Generator(cfg)
    z = jnp.zeros((2, cfg.z_dim))
    variables = model.init(jax.random.PRNGKey(0), z)
    return cfg, model, variables


def test_layout_matches_reference_schedule():
    # FFHQ-1024 R-config layer schedule spot checks (reference architecture).
    layout = build_synthesis_layout(sg3_r_config(1024))
    assert layout.num_ws == 16
    assert len(layout.layers) == 15
    assert layout.input.size == (36, 36)
    assert layout.input.channels == 1024
    first = layout.layers[0]
    assert first.in_size == (36, 36) and first.out_size == (36, 36)
    assert first.up_factor == 2 and first.down_factor == 2
    assert first.up_taps == 12 and first.down_taps == 12
    assert first.down_radial  # R config: radial on all non-critical layers
    assert not layout.layers[-2].down_radial  # critically sampled → separable
    last = layout.layers[-1]
    assert last.is_torgb
    assert last.out_channels == 3 and last.out_size == (1024, 1024)
    assert last.conv_kernel == 1
    # Only the last two canvases drop the margin (sizes[-2:] = res).
    assert layout.layers[-2].out_size == (1024, 1024)
    assert layout.layers[-3].out_size == (1044, 1044)


def test_layout_t_config():
    layout = build_synthesis_layout(sg3_t_config(1024))
    assert layout.layers[0].conv_kernel == 3
    assert all(not l.down_radial for l in layout.layers)


def test_generator_forward_shapes(tiny_gen):
    cfg, model, variables = tiny_gen
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.z_dim))
    img = model.apply(variables, z)
    assert img.shape == (2, cfg.img_resolution, cfg.img_resolution, 3)
    assert img.dtype == jnp.float32
    assert bool(jnp.isfinite(img).all())


def test_generator_jit_and_determinism(tiny_gen):
    cfg, model, variables = tiny_gen
    z = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.z_dim))
    f = jax.jit(lambda v, z: model.apply(v, z))
    a = f(variables, z)
    b = f(variables, z)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mapping_truncation(tiny_gen):
    cfg, model, variables = tiny_gen
    z = jax.random.normal(jax.random.PRNGKey(3), (4, cfg.z_dim))
    ws_full = model.apply(variables, z, method=model.map)
    assert ws_full.shape == (4, cfg.num_ws, cfg.w_dim)
    ws_trunc = model.apply(variables, z, truncation_psi=0.0, method=model.map)
    w_avg = variables["ema"]["mapping"]["w_avg"]
    np.testing.assert_allclose(
        np.asarray(ws_trunc), np.broadcast_to(np.asarray(w_avg), ws_trunc.shape),
        atol=1e-6)
    # Partial cutoff: layers past the cutoff are untruncated.
    ws_cut = model.apply(variables, z, truncation_psi=0.0, truncation_cutoff=3,
                         method=model.map)
    np.testing.assert_allclose(np.asarray(ws_cut[:, 3:]),
                               np.asarray(ws_full[:, 3:]), atol=1e-6)


def test_w2s_roundtrip(tiny_gen):
    """Synthesis from W+ equals synthesis from W2S styles (identity transform)."""
    cfg, model, variables = tiny_gen
    z = jax.random.normal(jax.random.PRNGKey(4), (2, cfg.z_dim))
    ws = model.apply(variables, z, method=model.map)
    img_w = model.apply(variables, ws, method=model.synthesize)
    all_s = model.apply(variables, ws, method=model.w2s)
    assert set(all_s) == {"input"} | {l.name for l in
                                      build_synthesis_layout(cfg).layers}
    img_s = model.apply(variables, None, all_s=all_s, method=model.synthesize)
    np.testing.assert_allclose(np.asarray(img_w), np.asarray(img_s),
                               rtol=1e-4, atol=1e-4)


def test_transform_argument_translation(tiny_gen):
    """A user translation shifts the image content (functionalized transform)."""
    cfg, model, variables = tiny_gen
    z = jax.random.normal(jax.random.PRNGKey(5), (1, cfg.z_dim))
    ws = model.apply(variables, z, method=model.map)
    base = model.apply(variables, ws, method=model.synthesize)
    # Inverse-translation transform: shift content by 1/8 of the frame.
    m = np.eye(3, dtype=np.float32)
    m[0, 2] = 0.125
    shifted = model.apply(variables, ws, transform=jnp.asarray(m),
                          method=model.synthesize)
    assert not np.allclose(np.asarray(base), np.asarray(shifted), atol=1e-3)
    # Batched per-sample transforms broadcast correctly.
    ws2 = jnp.concatenate([ws, ws], axis=0)
    both = model.apply(
        variables, ws2,
        transform=jnp.stack([jnp.eye(3), jnp.asarray(m)]),
        method=model.synthesize)
    np.testing.assert_allclose(np.asarray(both[0]), np.asarray(base[0]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(both[1]), np.asarray(shifted[0]),
                               rtol=1e-4, atol=1e-4)


def test_ema_updates(tiny_gen):
    cfg, model, variables = tiny_gen
    z = jax.random.normal(jax.random.PRNGKey(6), (2, cfg.z_dim))
    _, mutated = model.apply(variables, z, update_emas=True, mutable=["ema"])
    w_avg_new = mutated["ema"]["mapping"]["w_avg"]
    assert not np.allclose(np.asarray(w_avg_new),
                           np.asarray(variables["ema"]["mapping"]["w_avg"]))
    mags = [np.asarray(v["magnitude_ema"])
            for k, v in mutated["ema"]["synthesis"].items() if k != "input"]
    assert any(not np.allclose(m, 1.0) for m in mags)


def test_bf16_policy():
    cfg = tiny_cfg(use_bf16=True, num_fp16_res=2)
    model = Generator(cfg)
    z = jnp.zeros((1, cfg.z_dim))
    variables = model.init(jax.random.PRNGKey(0), z)
    img = model.apply(variables, jax.random.normal(jax.random.PRNGKey(1),
                                                   (1, cfg.z_dim)))
    assert img.dtype == jnp.float32
    assert bool(jnp.isfinite(img).all())
    # force_fp32 gives a (slightly different but) finite image too.
    img32 = model.apply(variables,
                        jax.random.normal(jax.random.PRNGKey(1), (1, cfg.z_dim)),
                        force_fp32=True)
    assert bool(jnp.isfinite(img32).all())
    # bf16 output should track fp32 within bf16 tolerance.
    assert np.mean(np.abs(np.asarray(img) - np.asarray(img32))) < 0.05
