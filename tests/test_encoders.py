"""Tests for ReStyle encoders + pSp/e4e wrapper (tiny decoder configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stylegan3_editing_tpu.models.encoders import (
    BackboneEncoder,
    GradualStyleBlock,
    ProgressiveBackboneEncoder,
    ResNetBackboneEncoder,
    RestyleNet,
    get_average_image,
    run_restyle_iterations,
)
from stylegan3_editing_tpu.models.sg3 import SG3Config

RNG = np.random.RandomState(0)


def tiny_decoder_cfg():
    return SG3Config(img_resolution=64, channel_base=1024, channel_max=64,
                     num_layers=4, num_critical=2, use_bf16=False)


def test_gradual_style_block_shapes():
    m = GradualStyleBlock(out_c=512, spatial=16)
    x = jnp.zeros((2, 16, 16, 512))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 512)


@pytest.mark.parametrize("enc_cls", [BackboneEncoder, ResNetBackboneEncoder])
def test_plain_encoders_shapes(enc_cls):
    m = enc_cls(n_styles=6)
    x = jnp.zeros((1, 256, 256, 6))
    v = m.init(jax.random.PRNGKey(0), x)
    codes = m.apply(v, x)
    assert codes.shape == (1, 6, 512)


def test_progressive_encoder_stages():
    m = ProgressiveBackboneEncoder(n_styles=6)
    x = jnp.asarray(RNG.randn(1, 256, 256, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    w_stage0 = m.apply(v, x, stage=0)
    # Stage 0: pure w0 broadcast — every row identical.
    np.testing.assert_allclose(np.asarray(w_stage0[:, 1:]),
                               np.asarray(w_stage0[:, :1]).repeat(5, axis=1),
                               atol=1e-6)
    w_stage2 = m.apply(v, x, stage=2)
    # Deltas 1..2 active, rows 3+ still equal w0.
    assert not np.allclose(np.asarray(w_stage2[:, 1]), np.asarray(w_stage2[:, 0]))
    np.testing.assert_allclose(np.asarray(w_stage2[:, 3:]),
                               np.asarray(w_stage0[:, 3:]), atol=1e-6)
    w_inf = m.apply(v, x)  # INFERENCE: all deltas
    assert not np.allclose(np.asarray(w_inf[:, 5]), np.asarray(w_stage0[:, 5]))


@pytest.fixture(scope="module")
def restyle():
    cfg = tiny_decoder_cfg()
    model = RestyleNet(decoder_cfg=cfg, encoder_type="BackboneEncoder",
                       n_styles=cfg.num_ws)
    x = jnp.zeros((1, 256, 256, 6))
    variables = model.init(jax.random.PRNGKey(0), x,
                           latent_avg=jnp.zeros((512,)))
    return model, variables


def test_restyle_forward_and_dual_decode(restyle):
    model, variables = restyle
    x = jnp.asarray(RNG.randn(2, 256, 256, 6).astype(np.float32))
    latent_avg = variables["ema"]["decoder"]["mapping"]["w_avg"]

    images, codes = model.apply(variables, x, latent_avg=latent_avg)
    assert images.shape == (2, 256, 256, 3)  # face-pooled
    assert codes.shape == (2, model.n_styles, 512)

    m = np.eye(3, dtype=np.float32)
    m[0, 2] = 0.1
    aligned, unaligned, codes2 = model.apply(
        variables, x, latent_avg=latent_avg,
        landmarks_transform=jnp.asarray(m),
        return_aligned_and_unaligned=True)
    assert unaligned.shape == aligned.shape == (2, 256, 256, 3)
    np.testing.assert_allclose(np.asarray(codes), np.asarray(codes2), atol=1e-6)
    # Aligned branch of the batched dual decode == single decode.
    np.testing.assert_allclose(np.asarray(aligned), np.asarray(images),
                               rtol=1e-4, atol=1e-4)
    assert not np.allclose(np.asarray(aligned), np.asarray(unaligned), atol=1e-3)


def test_restyle_residual_logic(restyle):
    model, variables = restyle
    x = jnp.asarray(RNG.randn(1, 256, 256, 6).astype(np.float32))
    latent_avg = jnp.asarray(RNG.randn(512).astype(np.float32))
    prev = jnp.asarray(RNG.randn(1, model.n_styles, 512).astype(np.float32))

    codes_first = model.apply(variables, x, latent_avg=latent_avg,
                              method=model.encode)
    codes_iter = model.apply(variables, x, latent=prev, latent_avg=latent_avg,
                             method=model.encode)
    # Same encoder output, different residual base.
    delta = np.asarray(codes_iter - codes_first)
    want = np.asarray(prev - latent_avg[None, None, :])
    np.testing.assert_allclose(delta, want, rtol=1e-4, atol=1e-4)


def test_run_restyle_iterations(restyle):
    model, variables = restyle
    x = jnp.asarray(RNG.randn(1, 256, 256, 3).astype(np.float32))
    avg_image, latent_avg = get_average_image(model, variables)
    assert avg_image.shape == (256, 256, 3)

    results = run_restyle_iterations(model, variables, x, avg_image,
                                     latent_avg, n_iters=2)
    assert len(results) == 2
    (img1, un1, c1), (img2, un2, c2) = results
    assert un1 is None
    assert img1.shape == (1, 256, 256, 3)
    assert not np.allclose(np.asarray(c1), np.asarray(c2))
