"""Tests: StyleGAN2 family, superres growth, FIR fast paths."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan3_editing_tpu.models.sg3 import Generator, SG3Config
from stylegan3_editing_tpu.models.sg3.superres import (
    class_embedding_init,
    head_layer_names,
    reinit_stem,
    superres_config,
)
from stylegan3_editing_tpu.models.stylegan2 import (
    SG2Discriminator,
    SG2Generator,
)
from stylegan3_editing_tpu.ops.upfirdn2d import upfirdn2d

RNG = np.random.RandomState(0)


def test_sg2_generator_shapes():
    g = SG2Generator(size=32, style_dim=64, n_mlp=2)
    z = jnp.asarray(RNG.randn(2, 64).astype(np.float32))
    v = g.init(jax.random.PRNGKey(0), z)
    img = g.apply(v, z)
    assert img.shape == (2, 32, 32, 3)
    assert bool(jnp.isfinite(img).all())
    # W+ styles path
    styles = jnp.asarray(RNG.randn(2, g.n_latent, 64).astype(np.float32))
    img2 = g.apply(v, styles=styles)
    assert img2.shape == (2, 32, 32, 3)


def test_sg2_discriminator_shapes():
    d = SG2Discriminator(size=32)
    img = jnp.asarray(RNG.randn(3, 32, 32, 3).astype(np.float32))
    v = d.init(jax.random.PRNGKey(0), img)
    out = d.apply(v, img)
    assert out.shape == (3, 1)
    assert bool(jnp.isfinite(out).all())


def test_superres_growth_and_stem_transfer():
    stem_cfg = SG3Config(img_resolution=32, channel_base=1024, channel_max=32,
                         num_layers=4, num_critical=2, use_bf16=False)
    stem = Generator(stem_cfg)
    z = jnp.zeros((1, stem_cfg.z_dim))
    stem_vars = stem.init(jax.random.PRNGKey(0), z)

    grown_cfg = superres_config(stem_cfg, super_res=64, head_layers=2)
    assert grown_cfg.num_layers == 2 + 2 + 2
    grown = Generator(grown_cfg)
    grown_vars = grown.init(jax.random.PRNGKey(1), z)

    heads = head_layer_names(grown_cfg, stem_cfg)
    assert len(heads) == 5  # head_layers(2) + num_critical(2) + ToRGB

    merged = reinit_stem(grown_vars, stem_vars)
    # Mapping weights must transfer exactly.
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["mapping"]["fc0"]["weight"]),
        np.asarray(stem_vars["params"]["mapping"]["fc0"]["weight"]))
    # Grown model synthesizes at the new resolution.
    img = grown.apply(merged, jax.random.normal(jax.random.PRNGKey(2),
                                                (1, grown_cfg.z_dim)))
    assert img.shape == (1, 64, 64, 3)

    emb = class_embedding_init(10, 64)
    assert emb.shape == (10, 64)


def test_upfirdn2d_shift_impl_matches_conv():
    x = jnp.asarray(RNG.randn(1, 12, 12, 3).astype(np.float32))
    for f, up, down, pad in [
        (RNG.randn(12).astype(np.float32), 2, 1, (5, 4, 3, 2)),
        (RNG.randn(12).astype(np.float32), 1, 2, 0),
        (RNG.randn(6, 6).astype(np.float32) @ np.diag(np.ones(6)), 1, 1, 3),
    ]:
        a = upfirdn2d(x, f, up=up, down=down, padding=pad, impl="conv")
        b = upfirdn2d(x, f, up=up, down=down, padding=pad, impl="shift")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
    # traced 1-D filter also takes the shift path
    ft = jnp.asarray(RNG.randn(8).astype(np.float32))
    a = upfirdn2d(x, ft, up=2, padding=4, impl="conv")
    b = upfirdn2d(x, ft, up=2, padding=4, impl="shift")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)


def test_pallas_fir_interpret_matches_conv():
    from stylegan3_editing_tpu.ops.pallas_fir import fir_resample_pallas

    x = jnp.asarray(RNG.randn(1, 16, 16, 3).astype(np.float32))
    f = RNG.randn(12).astype(np.float32)
    a = upfirdn2d(x, f, up=2, padding=(6, 5, 6, 5), gain=4, impl="conv")
    b = fir_resample_pallas(x, f, (2, 2), (1, 1), (6, 5, 6, 5), False, 4.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)
