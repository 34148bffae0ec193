"""ADA heuristic + grid_sample tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan3_editing_tpu.ops.image import grid_sample
from stylegan3_editing_tpu.setgan.ada import AdaController, apply_ada

RNG = np.random.RandomState(0)


def test_ada_controller_adapts():
    ctrl = AdaController(target=0.6, interval_imgs=8, ada_kimg=0.1)
    # Overconfident D (sign 1.0 > target) → p rises.
    for _ in range(4):
        p = ctrl.update(1.0, batch_size=4)
    assert p > 0
    # Weak D (sign -1) → p falls back toward 0.
    for _ in range(8):
        p = ctrl.update(-1.0, batch_size=4)
    assert p == 0.0


def test_apply_ada_prob():
    x = jnp.asarray(RNG.rand(8, 16, 16, 3).astype(np.float32) * 2 - 1)
    none = apply_ada(jax.random.PRNGKey(0), x, p=0.0)
    np.testing.assert_array_equal(np.asarray(none), np.asarray(x))
    allp = apply_ada(jax.random.PRNGKey(0), x, p=1.0)
    assert not np.allclose(np.asarray(allp), np.asarray(x))


@pytest.mark.skipif(__import__("os").path.isdir("/root/reference") is False,
                    reason="reference not available")
def test_grid_sample_matches_torch():
    torch = pytest.importorskip("torch")
    x = RNG.randn(2, 3, 8, 10).astype(np.float32)
    grid = (RNG.rand(2, 5, 6, 2).astype(np.float32) * 2 - 1)
    want = torch.nn.functional.grid_sample(
        torch.from_numpy(x), torch.from_numpy(grid), mode="bilinear",
        padding_mode="zeros", align_corners=False).numpy()
    got = grid_sample(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-5)


def test_grid_sample_grad():
    x = jnp.asarray(RNG.randn(1, 6, 6, 2).astype(np.float32))
    grid = jnp.asarray((RNG.rand(1, 4, 4, 2) * 2 - 1).astype(np.float32))
    g = jax.grad(lambda g_: jnp.sum(grid_sample(x, g_)))(grid)
    assert np.isfinite(np.asarray(g)).all()
    g2 = jax.grad(lambda g_: jnp.sum(
        jax.grad(lambda gg: jnp.sum(grid_sample(x, gg) ** 2))(g_) ** 2))(grid)
    assert np.isfinite(np.asarray(g2)).all()  # 2nd order (gradfix parity)
