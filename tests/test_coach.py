"""Coach smoke tests: tiny configs, synthetic data, few steps."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan3_editing_tpu.models.sg3 import SG3Config
from stylegan3_editing_tpu.training import (
    E4eTrainOptions,
    LatentCodesDiscriminator,
    LatentCodesPool,
    TrainOptions,
    ranger,
)
from stylegan3_editing_tpu.training.coach import Coach

RNG = np.random.RandomState(0)


def tiny_cfg():
    return SG3Config(img_resolution=32, channel_base=512, channel_max=32,
                     num_layers=4, num_critical=2, use_bf16=False)


def synthetic_batches(n, batch_size=2):
    for _ in range(n):
        y = RNG.rand(batch_size, 256, 256, 3).astype(np.float32) * 2 - 1
        yield y, y


# ------------------------------------------------------------------ ranger

def test_ranger_reduces_quadratic():
    import optax
    tx = ranger(0.1)
    params = {"w": jnp.asarray([3.0, -2.0])}
    state = tx.init(params)

    @jax.jit
    def step(params, state):
        grads = jax.grad(lambda p: jnp.sum(jnp.square(p["w"])))(params)
        updates, state = tx.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    for _ in range(300):
        params, state = step(params, state)
    assert float(jnp.abs(params["w"]).max()) < 0.2


# ------------------------------------------------------------- latent disc

def test_latent_discriminator_and_pool():
    disc = LatentCodesDiscriminator(64, 3)
    w = jnp.zeros((4, 64))
    v = disc.init(jax.random.PRNGKey(0), w)
    assert disc.apply(v, w).shape == (4, 1)

    pool = LatentCodesPool(pool_size=3, seed=0)
    a = RNG.randn(2, 64).astype(np.float32)
    out = pool.query(a)
    assert out.shape == (2, 64)
    np.testing.assert_array_equal(out, a)  # pool not full → passthrough
    b = RNG.randn(4, 5, 64).astype(np.float32)  # 3-D → random row each
    out2 = pool.query(b)
    assert out2.shape == (4, 64)
    assert len(pool.ws) == 3  # capped at pool size


# -------------------------------------------------------------- pSp coach

@pytest.mark.slow
def test_psp_coach_steps_and_checkpoint(tmp_path):
    opts = TrainOptions(
        exp_dir=str(tmp_path), batch_size=2, effective_batch_size=4,
        n_iters_per_batch=2, l2_lambda=1.0, w_norm_lambda=0.01,
        output_size=32, max_steps=4, board_interval=1,
    )
    coach = Coach(opts, decoder_cfg=tiny_cfg())

    p0 = jax.tree_util.tree_leaves(coach.variables["params"]["encoder"])[0]
    p0 = np.asarray(p0).copy()
    losses = [coach.train_step(b)["loss"] for b in synthetic_batches(4)]
    assert all(np.isfinite(l) for l in losses)

    # Grad accumulation: params must move after effective_batch/batch = 2 steps.
    p1 = np.asarray(jax.tree_util.tree_leaves(
        coach.variables["params"]["encoder"])[0])
    assert not np.allclose(p0, p1)
    # Frozen decoder untouched.
    assert coach.opts.train_decoder is False

    val = coach.validate(synthetic_batches(2))
    assert np.isfinite(val["loss"])

    ckpt = tmp_path / "ckpt"
    coach.checkpoint(ckpt)
    coach2 = Coach(TrainOptions(**{**opts.__dict__}), decoder_cfg=tiny_cfg())
    coach2.restore(ckpt)
    assert coach2.global_step == coach.global_step
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(coach2.variables["params"]["encoder"])[0]),
        p1)


# -------------------------------------------------------------- e4e coach

@pytest.mark.slow
def test_e4e_coach_with_discriminator_and_progressive(tmp_path):
    opts = E4eTrainOptions(
        exp_dir=str(tmp_path), batch_size=2, effective_batch_size=2,
        n_iters_per_batch=1, l2_lambda=1.0,
        w_discriminator_lambda=0.1, d_reg_every=2, w_pool_size=4,
        progressive_steps=[0, 2], output_size=32, max_steps=3,
        encoder_type="ProgressiveBackboneEncoder",
    )
    coach = Coach(opts, decoder_cfg=tiny_cfg())
    assert coach._current_stage() == 0

    metrics = [coach.train_step(b) for b in synthetic_batches(3)]
    for m in metrics:
        assert np.isfinite(m["loss"])
        assert "discriminator_loss" in m
        assert "encoder_discriminator_loss" in m
    assert "discriminator_r1_loss" in metrics[0]  # step 0 % d_reg_every == 0
    assert coach._current_stage() == 1  # passed progressive step 2
    assert "total_delta_loss" in metrics[-1]


def test_coach_train_loop_with_prefetcher(tmp_path):
    """coach.train drives the outer loop (stats.jsonl, events, final state)
    through the device prefetcher (data/prefetch.py, depth 2)."""
    opts = TrainOptions(
        exp_dir=str(tmp_path), batch_size=2, effective_batch_size=2,
        n_iters_per_batch=1, l2_lambda=1.0, output_size=32,
        max_steps=3, board_interval=1, val_interval=10 ** 6,
        save_interval=10 ** 6,
    )
    coach = Coach(opts, decoder_cfg=tiny_cfg())
    coach.train(synthetic_batches(5))
    assert coach.global_step == 3
    assert (tmp_path / "stats.jsonl").exists()
