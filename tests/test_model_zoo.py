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


def test_load_pretrained_imagenet_class_embedding():
    """The reference ships ONE pretrained asset usable in this environment:
    in_embeddings/tf_efficientnet_lite0.pkl — StyleGAN-XL's ImageNet class
    embeddings (a pickled nn.Embedding, networks_stylegan3_resetting.py:137).
    Load it through the allowlist unpickler (no torch class instantiated)."""
    from pathlib import Path

    from stylegan3_editing_tpu.models.sg3.superres import load_class_embedding

    path = Path("/root/reference/in_embeddings/tf_efficientnet_lite0.pkl")
    if not path.exists():
        pytest.skip("reference checkout not mounted")
    emb = load_class_embedding(path)
    assert emb.shape == (1000, 320)
    assert emb.dtype == np.float32
    assert np.isfinite(emb).all()
    assert float(np.std(emb)) > 0.1  # trained weights, not zeros/const

    # End-to-end: the XL conditioning scheme (resetting.py:139-141 — class
    # index → frozen embedding row → mapping's embed FC) is `c = emb[label]`
    # on a c_dim=embed_dim generator. Different classes → different images.
    cfg = SG3Config(img_resolution=32, channel_base=512, channel_max=32,
                    num_layers=4, num_critical=2, use_bf16=False,
                    c_dim=emb.shape[1])
    g = Generator(cfg)
    z = jnp.zeros((2, cfg.z_dim))
    c = jnp.asarray(emb[np.array([3, 873])])
    variables = g.init(jax.random.PRNGKey(0), z, c=c)
    imgs = g.apply(variables, z, c=c)
    assert imgs.shape == (2, 32, 32, 3)
    assert not np.allclose(np.asarray(imgs[0]), np.asarray(imgs[1]))


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


def test_sg2_stem_forward_and_converter():
    """NVIDIA-convention SG2 generator (XL aux net): forward shapes, w_avg
    EMA, torch-state converter key-map round-trip (reference
    models/styleganxl/training/networks_stylegan2.py)."""
    from stylegan3_editing_tpu.models.sg2_stem import (
        SG2Config, SG2Generator, convert_sg2_state)

    cfg = SG2Config(z_dim=32, w_dim=32, img_resolution=32, channel_base=512,
                    channel_max=64, mapping_layers=2, use_bf16=False)
    model = SG2Generator(cfg)
    z = jnp.zeros((2, 32))
    v = jax.jit(model.init)(jax.random.PRNGKey(0), z)
    img = model.apply(v, z)
    assert img.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(img)).all()

    ws = model.apply(v, z, method=model.map)
    assert ws.shape == (2, cfg.num_ws, 32)
    img2 = model.apply(v, ws, method=model.synthesize)
    assert img2.shape == (2, 32, 32, 3)

    # EMA update path
    _, mut = model.apply(v, jnp.ones((2, 32)), update_emas=True,
                         mutable=["ema"])
    assert float(jnp.abs(mut["ema"]["mapping"]["w_avg"]).sum()) > 0

    # Converter: fabricate a torch-style state dict from init shapes.
    rng = np.random.RandomState(0)
    state = {"mapping.w_avg": rng.randn(32).astype(np.float32)}
    for i in range(cfg.mapping_layers):
        state[f"mapping.fc{i}.weight"] = rng.randn(32, 32).astype(np.float32)
        state[f"mapping.fc{i}.bias"] = rng.randn(32).astype(np.float32)
    for res in cfg.block_resolutions:
        ch = cfg.channels(res)
        in_ch = cfg.channels(max(res // 2, 4))
        b = f"synthesis.b{res}"
        if res == 4:
            state[f"{b}.const"] = rng.randn(ch, 4, 4).astype(np.float32)
            convs = [("conv1", ch, ch)]
        else:
            convs = [("conv0", in_ch, ch), ("conv1", ch, ch)]
        for cname, ci, co in convs:
            state[f"{b}.{cname}.weight"] = rng.randn(co, ci, 3, 3).astype(np.float32)
            state[f"{b}.{cname}.bias"] = rng.randn(co).astype(np.float32)
            state[f"{b}.{cname}.noise_strength"] = np.float32(0.1)
            state[f"{b}.{cname}.affine.weight"] = rng.randn(ci, 32).astype(np.float32)
            state[f"{b}.{cname}.affine.bias"] = rng.randn(ci).astype(np.float32)
        state[f"{b}.torgb.weight"] = rng.randn(3, ch, 1, 1).astype(np.float32)
        state[f"{b}.torgb.bias"] = rng.randn(3).astype(np.float32)
        state[f"{b}.torgb.affine.weight"] = rng.randn(ch, 32).astype(np.float32)
        state[f"{b}.torgb.affine.bias"] = rng.randn(ch).astype(np.float32)

    cv = convert_sg2_state(state, cfg)
    got = jax.tree_util.tree_structure(cv["params"])
    want = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda x: 0, dict(v["params"])))
    assert got == want, f"{got}\n!=\n{want}"
    img3 = model.apply({"params": cv["params"], "ema": {"mapping": {"w_avg": cv["ema"]["mapping"]["w_avg"]}}}, z)
    assert np.isfinite(np.asarray(img3)).all()


def test_fastgan_stem_forward():
    """FastGAN stem: forward shapes incl. skip-layer excitation
    (reference networks_fastgan.py:21-84)."""
    from stylegan3_editing_tpu.models.fastgan import (
        FastGANConfig, FastGANGenerator)

    cfg = FastGANConfig(z_dim=16, img_resolution=64, ngf=16)
    model = FastGANGenerator(cfg)
    z = jnp.zeros((2, 16))
    v = model.init(jax.random.PRNGKey(0), z,
                   method=lambda m, z: m.synthesize(m.map(z)))
    img = model.apply(v, z, method=lambda m, z: m.synthesize(m.map(z)))
    assert img.shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(img)).all()
    # lite variant
    cfg_l = FastGANConfig(z_dim=16, img_resolution=32, ngf=16, lite=True)
    ml = FastGANGenerator(cfg_l)
    vl = ml.init(jax.random.PRNGKey(0), z,
                 method=lambda m, z: m.synthesize(m.map(z)))
    assert ml.apply(vl, z, method=lambda m, z: m.synthesize(m.map(z))).shape \
        == (2, 32, 32, 3)


@pytest.mark.slow
def test_setgan_alternate_stems():
    """SG2 and FastGAN stems plug into the SetGAN model
    (reference train_setgan.py:324 stem selection)."""
    from stylegan3_editing_tpu.models.sg3 import SG3Config
    from stylegan3_editing_tpu.setgan.model import SetGAN

    cfg = SG3Config(img_resolution=32, channel_base=512, channel_max=32,
                    z_dim=32, w_dim=32, num_layers=4, num_critical=2,
                    use_bf16=False)
    for stem in ("sg2", "fastgan"):
        model = SetGAN(cfg, stem=stem)
        x = jnp.zeros((1, 2, 64, 64, 3))
        z = jnp.zeros((1, 1, 32))
        v = jax.jit(model.init)(jax.random.PRNGKey(0), x, z,
                                latent_avg=jnp.zeros((32,)))
        imgs = model.apply(v, x, z, latent_avg=jnp.zeros((32,)))
        assert imgs.shape == (1, 1, 32, 32, 3), stem


def test_sg2_style_mixing_and_noise_registry():
    """Rosinality SG2 surface (VERDICT r2 #7): two-latent style mixing with
    inject_index, input_is_latent, return_latents, and the per-layer noise
    buffer registry (noise_mode='const' deterministic; buffers mutable)."""
    g = SG2Generator(size=32, style_dim=64, n_mlp=2)
    z1 = jnp.asarray(RNG.randn(2, 64).astype(np.float32))
    z2 = jnp.asarray(RNG.randn(2, 64).astype(np.float32))
    v = g.init(jax.random.PRNGKey(0), z1)

    # Style mixing: [z1, z2] differs from either single-z render, and
    # inject_index=n_latent reproduces the pure-z1 image.
    img1 = g.apply(v, z1, noise_mode="none")
    img_mix = g.apply(v, [z1, z2], noise_mode="none")
    assert img_mix.shape == img1.shape
    assert not np.allclose(np.asarray(img_mix), np.asarray(img1))
    img_all1 = g.apply(v, [z1, z2], inject_index=g.n_latent,
                       noise_mode="none")
    np.testing.assert_allclose(np.asarray(img_all1), np.asarray(img1),
                               rtol=1e-5, atol=1e-5)

    # input_is_latent: w's bypass the mapping MLP.
    w1 = g.apply(v, z1, method=g.mapping)
    img_w = g.apply(v, w1, input_is_latent=True, noise_mode="none")
    np.testing.assert_allclose(np.asarray(img_w), np.asarray(img1),
                               rtol=1e-5, atol=1e-5)

    # return_latents gives the broadcast W+.
    _, lat = g.apply(v, z1, noise_mode="none", return_latents=True)
    assert lat.shape == (2, g.n_latent, 64)

    # Noise registry: 'const' initializes zero buffers (== 'none' output),
    # is deterministic, and honors injected buffer values.
    img_c, mutated = g.apply(v, z1, noise_mode="const",
                             mutable=["noises"])
    np.testing.assert_allclose(np.asarray(img_c), np.asarray(img1),
                               rtol=1e-5, atol=1e-5)
    noises = mutated["noises"]
    assert "noise_0" in noises and noises["noise_0"].shape == (1, 4, 4, 1)
    bumped = {k: jnp.ones_like(val) for k, val in noises.items()}
    img_b = g.apply({**v, "noises": bumped}, z1, noise_mode="const")
    # noise weights start at zero → still equal; after forcing a weight,
    # the buffer must matter.
    params2 = jax.tree_util.tree_map(lambda p: p, v["params"])
    params2["conv1"]["noise"]["weight"] = jnp.asarray(1.0)
    img_n0 = g.apply({"params": params2, "noises": noises}, z1,
                     noise_mode="const")
    img_n1 = g.apply({"params": params2, "noises": bumped}, z1,
                     noise_mode="const")
    assert not np.allclose(np.asarray(img_n0), np.asarray(img_n1))
