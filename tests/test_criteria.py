"""Tests for criteria + backbones: shape/grad sanity and torch parity where
the reference's pure-torch code can serve as oracle (IR-SE, MS-SSIM)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stylegan3_editing_tpu.criteria import (
    IDLoss,
    LPIPS,
    MocoLoss,
    msssim,
    ssim,
    w_norm_loss,
)
from stylegan3_editing_tpu.models.backbones import (
    AlexNetFeatures,
    IRSEBackbone,
    ResNet50Features,
    VGG16Features,
    convert_irse_state,
)
from stylegan3_editing_tpu.ops.image import adaptive_avg_pool2d, resize_nearest

REF = "/root/reference"
HAS_REF = os.path.isdir(REF)

RNG = np.random.RandomState(0)


# ------------------------------------------------------------------ ms-ssim

def test_ssim_identical_images():
    x = jnp.asarray(RNG.rand(2, 32, 32, 3).astype(np.float32))
    val = ssim(x, x, val_range=1.0)
    np.testing.assert_allclose(float(val), 1.0, atol=1e-5)


@pytest.mark.skipif(not HAS_REF, reason="reference not available")
def test_msssim_parity_with_reference():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    torch = pytest.importorskip("torch")
    from criteria.ms_ssim import msssim as torch_msssim

    a = RNG.rand(2, 3, 64, 64).astype(np.float32) * 2 - 1
    b = np.clip(a + RNG.randn(2, 3, 64, 64).astype(np.float32) * 0.1, -1, 1)
    with torch.no_grad():
        want = float(torch_msssim(torch.from_numpy(a), torch.from_numpy(b)))
    got = float(msssim(jnp.asarray(a.transpose(0, 2, 3, 1)),
                       jnp.asarray(b.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------------- w-norm

@pytest.mark.skipif(not HAS_REF, reason="reference not available")
def test_w_norm_parity_with_reference():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    torch = pytest.importorskip("torch")
    from criteria.w_norm import WNormLoss

    latent = RNG.randn(4, 16, 512).astype(np.float32)
    avg = RNG.randn(512).astype(np.float32)
    with torch.no_grad():
        want = float(WNormLoss(True)(torch.from_numpy(latent),
                                     torch.from_numpy(avg)))
    got = float(w_norm_loss(jnp.asarray(latent), jnp.asarray(avg)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


# ------------------------------------------------------- image-space helpers

@pytest.mark.skipif(not HAS_REF, reason="reference not available")
def test_adaptive_avg_pool_matches_torch():
    torch = pytest.importorskip("torch")
    x = RNG.randn(1, 3, 188, 188).astype(np.float32)
    want = torch.nn.AdaptiveAvgPool2d((112, 112))(torch.from_numpy(x)).numpy()
    got = adaptive_avg_pool2d(jnp.asarray(x.transpose(0, 2, 3, 1)), 112)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not HAS_REF, reason="reference not available")
def test_resize_nearest_matches_torch():
    torch = pytest.importorskip("torch")
    x = RNG.randn(1, 3, 100, 100).astype(np.float32)
    want = torch.nn.functional.interpolate(torch.from_numpy(x), size=224).numpy()
    got = resize_nearest(jnp.asarray(x.transpose(0, 2, 3, 1)), 224)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want)


# -------------------------------------------------------------------- IR-SE

@pytest.mark.skipif(not HAS_REF, reason="reference not available")
def test_irse50_parity_with_reference():
    """Randomly-initialized torch IR-SE-50 == converted flax IR-SE-50."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    torch = pytest.importorskip("torch")
    from models.setgan.encoder.encoders.model_irse import Backbone

    torch.manual_seed(0)
    net = Backbone(input_size=112, num_layers=50, drop_ratio=0.6,
                   mode="ir_se").eval()
    state = {k: v.numpy() for k, v in net.state_dict().items()}

    model = IRSEBackbone(input_size=112, num_layers=50, mode="ir_se")
    variables = convert_irse_state(state, num_layers=50)

    x = RNG.randn(2, 3, 112, 112).astype(np.float32)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()
    got = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-4)


def test_idloss_runs_and_grads():
    model = IDLoss()
    x = jnp.asarray(RNG.randn(2, 256, 256, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, x, x)

    def loss_fn(y_hat):
        loss, sim, _ = model.apply(variables, y_hat, x, x)
        return loss

    loss, grad = jax.value_and_grad(loss_fn)(x * 0.9)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(grad)).all()


# ------------------------------------------------------------------- LPIPS

@pytest.mark.parametrize("net_type", ["alex", "vgg", "squeeze"])
def test_lpips_properties(net_type):
    model = LPIPS(net_type=net_type)
    x = jnp.asarray(RNG.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    variables = model.init(jax.random.PRNGKey(0), x, x)
    zero = model.apply(variables, x, x)
    np.testing.assert_allclose(float(zero), 0.0, atol=1e-6)
    y = jnp.clip(x + 0.3, -1, 1)
    d = model.apply(variables, x, y)
    assert float(d) != 0.0 and np.isfinite(float(d))


def test_lpips_linear_converter_shapes():
    from stylegan3_editing_tpu.criteria.lpips import convert_lpips_linear_state
    from stylegan3_editing_tpu.models.backbones.alexnet import N_CHANNELS
    state = {f"{i}.1.weight": RNG.rand(1, c, 1, 1).astype(np.float32)
             for i, c in enumerate(N_CHANNELS)}
    params = convert_lpips_linear_state(state)
    assert params["lin0"].shape == (1, 1, 64, 1)


def test_lpips_squeeze_heads_and_converter():
    """squeeze variant: 7 taps with the reference channel list
    (/root/reference/criteria/lpips/networks.py:65-72), converter maps a
    torchvision squeezenet1_1-shaped state dict + 7 linear heads."""
    from stylegan3_editing_tpu.criteria.lpips import convert_lpips_linear_state
    from stylegan3_editing_tpu.models.backbones.squeezenet import (
        N_CHANNELS as SQ_CH,
        SqueezeNetFeatures,
        convert_squeezenet_state,
    )

    x = jnp.asarray(RNG.rand(1, 64, 64, 3).astype(np.float32))
    net = SqueezeNetFeatures()
    variables = net.init(jax.random.PRNGKey(0), x)
    feats = net.apply(variables, x)
    assert tuple(f.shape[-1] for f in feats) == SQ_CH

    # Converter: build a fake torchvision state dict, check tree compatibility.
    fire_cfg = {3: (64, 16, 64), 4: (128, 16, 64), 6: (128, 32, 128),
                7: (256, 32, 128), 9: (256, 48, 192), 10: (384, 48, 192),
                11: (384, 64, 256), 12: (512, 64, 256)}
    state = {"features.0.weight": RNG.rand(64, 3, 3, 3).astype(np.float32),
             "features.0.bias": RNG.rand(64).astype(np.float32)}
    for idx, (cin, sq, ex) in fire_cfg.items():
        state[f"features.{idx}.squeeze.weight"] = RNG.rand(sq, cin, 1, 1).astype(np.float32)
        state[f"features.{idx}.squeeze.bias"] = RNG.rand(sq).astype(np.float32)
        state[f"features.{idx}.expand1x1.weight"] = RNG.rand(ex, sq, 1, 1).astype(np.float32)
        state[f"features.{idx}.expand1x1.bias"] = RNG.rand(ex).astype(np.float32)
        state[f"features.{idx}.expand3x3.weight"] = RNG.rand(ex, sq, 3, 3).astype(np.float32)
        state[f"features.{idx}.expand3x3.bias"] = RNG.rand(ex).astype(np.float32)
    converted = convert_squeezenet_state(state)
    want = jax.tree_util.tree_structure(variables)
    got = jax.tree_util.tree_structure(converted)
    assert want == got, (want, got)
    shapes_want = jax.tree_util.tree_map(lambda a: a.shape, variables)
    shapes_got = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, converted)
    assert shapes_want == shapes_got

    # 7-head linear converter round-trip.
    lin_state = {f"{i}.1.weight": RNG.rand(1, c, 1, 1).astype(np.float32)
                 for i, c in enumerate(SQ_CH)}
    lin = convert_lpips_linear_state(lin_state)
    assert len(lin) == 7 and lin["lin6"].shape == (1, 1, 512, 1)


def test_max_pool2d_ceil_mode_vs_torch():
    """ceil_mode parity with torch MaxPool2d across odd/even sizes."""
    import torch
    import torch.nn.functional as F
    from stylegan3_editing_tpu.ops.image import max_pool2d

    for size in (7, 8, 13, 55, 111):
        x = RNG.rand(1, size, size, 4).astype(np.float32)
        got = max_pool2d(jnp.asarray(x), 3, 2, ceil_mode=True)
        want = F.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                            3, 2, ceil_mode=True).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=0)


# -------------------------------------------------------------------- MoCo

def test_moco_loss_runs():
    model = MocoLoss()
    x = jnp.asarray(RNG.randn(2, 224, 224, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, x, x)
    loss, sim, logs = model.apply(variables, x * 0.5, x, x)
    assert np.isfinite(float(loss))
    assert logs["diff_target"].shape == (2,)


def test_backbone_output_shapes():
    x = jnp.zeros((1, 224, 224, 3))
    alex = AlexNetFeatures()
    va = alex.init(jax.random.PRNGKey(0), x)
    feats = alex.apply(va, x)
    assert [f.shape[-1] for f in feats] == [64, 192, 384, 256, 256]

    vgg = VGG16Features()
    vv = vgg.init(jax.random.PRNGKey(0), x)
    feats = vgg.apply(vv, x)
    assert [f.shape[-1] for f in feats] == [64, 128, 256, 512, 512]
    assert feats[0].shape[1] == 224 and feats[-1].shape[1] == 14

    rn = ResNet50Features()
    vr = rn.init(jax.random.PRNGKey(0), x)
    out = rn.apply(vr, x)
    assert out.shape == (1, 2048)
