"""PTI tests: batched per-image tuning + shared (video) tuning."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stylegan3_editing_tpu.inversion import PTI, PTIOptions
from stylegan3_editing_tpu.models.sg3 import Generator, SG3Config

RNG = np.random.RandomState(0)


@pytest.fixture(scope="module")
def setup():
    cfg = SG3Config(img_resolution=32, channel_base=512, channel_max=32,
                    num_layers=4, num_critical=2, use_bf16=False)
    model = Generator(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, cfg.z_dim)))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.z_dim))
    ws = model.apply(variables, z, method=model.map)
    targets = model.apply(variables, ws, method=model.synthesize)
    return cfg, model, variables, ws, targets


@pytest.mark.slow
def test_pti_batched_improves_l2(setup):
    cfg, model, variables, ws, targets = setup
    # Pivot: perturbed latents → imperfect reconstruction to tune away.
    pivot = ws + 0.3 * jax.random.normal(jax.random.PRNGKey(2), ws.shape)
    pti = PTI(cfg, variables, opts=PTIOptions(
        learning_rate=1e-2, steps=15, lpips_threshold=0.0, lpips_lambda=0.0))

    base_img = model.apply(variables, pivot, method=model.synthesize)
    l2_before = float(jnp.mean(jnp.square(base_img - targets)))

    stacked, imgs, metrics = pti.optimize_batch(pivot, targets)
    l2_after = float(np.mean(metrics["l2"]))
    assert l2_after < l2_before * 0.7, (l2_before, l2_after)

    # Per-image params are independent copies.
    leaf = jax.tree_util.tree_leaves(stacked)[0]
    assert leaf.shape[0] == 2
    assert not np.allclose(np.asarray(leaf[0]), np.asarray(leaf[1]))

    # Fourier input stage stays frozen (not in the tuned tree).
    assert "input" not in stacked

    # tuned_variables reproduces the tuned image for image 0.
    one = jax.tree_util.tree_map(lambda p: p[0], stacked)
    tuned_vars = pti.tuned_variables(one)
    img0 = model.apply(tuned_vars, pivot[:1], method=model.synthesize)
    np.testing.assert_allclose(np.asarray(img0[0]), np.asarray(imgs[0]),
                               rtol=1e-3, atol=1e-3)


def test_pti_early_stop_freezes(setup):
    cfg, model, variables, ws, targets = setup
    # Huge threshold → everything converges on step 0; params barely move.
    pti = PTI(cfg, variables, opts=PTIOptions(
        learning_rate=1e-2, steps=30, lpips_threshold=1e9, check_every=1))
    stacked, imgs, metrics = pti.optimize_batch(ws, targets)
    assert bool(np.all(metrics["converged"]))


@pytest.mark.slow
def test_pti_shared_video_mode(setup):
    cfg, model, variables, ws, targets = setup
    pivot = ws + 0.3 * jax.random.normal(jax.random.PRNGKey(3), ws.shape)

    def batches():
        yield pivot, targets, None

    pti = PTI(cfg, variables, opts=PTIOptions(learning_rate=1e-2,
                                              lpips_lambda=0.0))
    tuned, history = pti.optimize_shared(batches, steps=8)
    assert len(history) == 8
    assert history[-1]["l2"] <= history[0]["l2"]
    assert "input" not in tuned


@pytest.mark.slow
def test_run_pti_images_cli_both_modes(tmp_path):
    """CLI smoke: per-image (vmapped) and --shared_weights (video,
    reference run_pti_video.py) modes write tuned images + models."""
    import importlib.util
    import sys
    from pathlib import Path

    from PIL import Image

    spec = importlib.util.spec_from_file_location(
        "run_pti_cli",
        str(Path(__file__).parent.parent / "scripts" / "run_pti_images.py"))
    cli = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = cli
    spec.loader.exec_module(cli)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    names = [f"f{i}.png" for i in range(3)]
    for n in names:
        Image.fromarray(
            (RNG.rand(32, 32, 3) * 255).astype("uint8")).save(img_dir / n)
    # num_ws = num_layers + 2 = 6 at the tiny decoder below.
    latents = {n: RNG.randn(1, 6, 512).astype(np.float32) for n in names}
    np.save(tmp_path / "latents.npy", latents, allow_pickle=True)

    common = dict(
        images_path=str(img_dir), latents_path=str(tmp_path / "latents.npy"),
        output_size=32, steps=2, batch_size=2, lpips_lambda=0.0,
        lpips_threshold=0.0, decoder_channel_base=512,
        decoder_channel_max=32, decoder_num_layers=4)
    cli.main(cli.RunPTIOptions(exp_dir=str(tmp_path / "per_image"),
                               **common))
    for n in names:
        assert (tmp_path / "per_image" / "images" / n).exists()
        assert (tmp_path / "per_image" / f"{Path(n).stem}_model.npz").exists()

    cli.main(cli.RunPTIOptions(exp_dir=str(tmp_path / "video"),
                               shared_weights=True, **common))
    for n in names:
        assert (tmp_path / "video" / "images" / n).exists()
    assert (tmp_path / "video" / "pti_video_model.npz").exists()


@pytest.mark.slow
def test_pti_spatially_sharded_matches_unsharded():
    """Shared-mode PTI under H-sharded synthesis (`PTI(mesh=...)`) takes the
    SAME step as the unsharded PTI (halo-exchange grads are exact) and its
    loss improves — the beyond-one-chip-canvas tuning path."""
    from stylegan3_editing_tpu.models.sg3 import sg3_r_config
    from stylegan3_editing_tpu.parallel import create_mesh

    cfg = sg3_r_config(32, channel_base=1024, channel_max=128,
                       num_layers=4, num_critical=2, use_bf16=False)
    model = Generator(cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, cfg.z_dim)))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.z_dim))
    ws = model.apply(variables, z, method=model.map)
    targets = model.apply(variables, ws, method=model.synthesize)
    pivot = ws + 0.3 * jax.random.normal(jax.random.PRNGKey(2), ws.shape)

    def batches():
        yield pivot, targets, None

    mesh = create_mesh(shape=(4, 1, 2),
                       axis_names=("data", "model", "space"))
    opts = PTIOptions(learning_rate=1e-2, lpips_lambda=0.0)
    tuned_sp, hist_sp = PTI(cfg, variables, opts=opts,
                            mesh=mesh).optimize_shared(batches, steps=4)
    tuned_ref, hist_ref = PTI(cfg, variables,
                              opts=opts).optimize_shared(batches, steps=4)
    # Per-step losses coincide (improvement itself is covered by the
    # unsharded shared-mode test; grad exactness by test_parallel).
    for a, b in zip(hist_sp, hist_ref):
        assert abs(a["l2"] - b["l2"]) <= 1e-5 + 1e-3 * abs(b["l2"]), (a, b)
    fa = {str(p): v
          for p, v in jax.tree_util.tree_leaves_with_path(tuned_sp)}
    fb = {str(p): v
          for p, v in jax.tree_util.tree_leaves_with_path(tuned_ref)}
    assert fa.keys() == fb.keys()
    for k in fa:
        np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]),
                                   rtol=5e-4, atol=5e-5, err_msg=k)
