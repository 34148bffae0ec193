"""Golden tests for the signal-processing op core vs independent NumPy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from stylegan3_editing_tpu.ops import (
    bias_act,
    design_lowpass_filter,
    downsample2d,
    filter2d,
    filtered_lrelu,
    modulated_conv2d,
    setup_filter,
    upfirdn2d,
    upsample2d,
)

from oracles import (
    bias_act_np,
    filtered_lrelu_np,
    modulated_conv2d_np,
    upfirdn2d_np,
)

RNG = np.random.RandomState(0)


def nchw(x_nhwc):
    return np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2))


def nhwc(x_nchw):
    return jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1)), jnp.float32)


# ---------------------------------------------------------------- upfirdn2d

UPFIRDN_CASES = [
    # (up, down, padding, f_shape, flip, gain)
    (1, 1, 0, (3, 3), False, 1),
    (2, 1, (2, 1), (4,), False, 4),
    (2, 1, (5, 4, 3, 2), (12,), False, 4),
    (1, 2, 2, (12,), False, 1),
    (2, 2, (3, 3), (6, 6), True, 2),
    (4, 1, (6, 5), (8,), False, 16),
    (1, 1, (-1, 2, 0, -1), (3, 3), False, 1),
    (1, 1, 1, None, False, 3),
    (3, 2, (4, 4), (9,), False, 9),
]


@pytest.mark.parametrize("up,down,padding,fshape,flip,gain", UPFIRDN_CASES)
def test_upfirdn2d_golden(up, down, padding, fshape, flip, gain):
    x = RNG.randn(2, 3, 8, 8).astype(np.float32)  # NCHW for the oracle
    f = None if fshape is None else RNG.randn(*fshape).astype(np.float32)
    want = upfirdn2d_np(x, f, up=up, down=down, padding=padding,
                        flip_filter=flip, gain=gain)
    got = upfirdn2d(nhwc(x), f, up=up, down=down, padding=padding,
                    flip_filter=flip, gain=gain)
    np.testing.assert_allclose(nchw(got), want, rtol=1e-5, atol=1e-5)


def test_upfirdn2d_anisotropic():
    x = RNG.randn(1, 2, 6, 5).astype(np.float32)
    f = RNG.randn(4, 7).astype(np.float32)
    want = upfirdn2d_np(x, f, up=(2, 3), down=(1, 2), padding=(3, 2, 4, 1))
    got = upfirdn2d(nhwc(x), f, up=(2, 3), down=(1, 2), padding=(3, 2, 4, 1))
    np.testing.assert_allclose(nchw(got), want, rtol=1e-5, atol=1e-5)


def test_upfirdn2d_identity():
    x = RNG.randn(1, 1, 5, 5).astype(np.float32)
    got = upfirdn2d(nhwc(x), None)
    np.testing.assert_allclose(nchw(got), x, rtol=0, atol=0)


def test_filter2d_same_size():
    x = RNG.randn(2, 4, 9, 9).astype(np.float32)
    f = setup_filter([1, 3, 3, 1])
    y = filter2d(nhwc(x), f)
    assert nchw(y).shape == x.shape


def test_up_down_round_trip_shapes():
    x = RNG.randn(1, 2, 8, 8).astype(np.float32)
    f = setup_filter([1, 3, 3, 1])
    up = upsample2d(nhwc(x), f, up=2)
    assert up.shape == (1, 16, 16, 2)
    down = downsample2d(up, f, down=2)
    assert down.shape == (1, 8, 8, 2)


def test_upsample2d_dc_gain():
    # Upsampling a constant image with a normalized filter keeps its level.
    x = jnp.ones((1, 8, 8, 1), jnp.float32)
    f = setup_filter(design_lowpass_filter(12, cutoff=2, width=4, fs=8))
    y = upsample2d(x, f, up=2)
    interior = np.asarray(y)[0, 6:-6, 6:-6, 0]
    np.testing.assert_allclose(interior, 1.0, rtol=1e-4)


# ----------------------------------------------------------------- bias_act

@pytest.mark.parametrize("act", ["linear", "relu", "lrelu", "tanh", "sigmoid",
                                 "elu", "selu", "softplus", "swish"])
def test_bias_act_golden(act):
    x = RNG.randn(3, 4, 5, 6).astype(np.float32)
    b = RNG.randn(4).astype(np.float32)
    want = bias_act_np(x, b, dim=1, act=act)
    got = bias_act(jnp.asarray(x), jnp.asarray(b), dim=1, act=act)
    # fp32 transcendentals differ slightly from the float64 oracle.
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_bias_act_gain_clamp():
    x = RNG.randn(2, 8).astype(np.float32) * 10
    want = bias_act_np(x, None, act="lrelu", alpha=0.1, gain=3.0, clamp=5.0)
    got = bias_act(jnp.asarray(x), act="lrelu", alpha=0.1, gain=3.0, clamp=5.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


# ----------------------------------------------------------- filtered_lrelu

FLRELU_CASES = [
    # (up, down, padding, fu_taps, fd_taps, clamp)
    (2, 2, (6, 6), 12, 12, 256),
    (2, 1, (3, 2, 4, 5), 12, 1, None),
    (1, 2, (8, 8), 1, 12, 256),
    (2, 2, (6, 5, 6, 5), 12, 12, None),
    (1, 1, 2, 1, 1, 1.0),
]


@pytest.mark.parametrize("up,down,padding,fu_taps,fd_taps,clamp", FLRELU_CASES)
def test_filtered_lrelu_golden(up, down, padding, fu_taps, fd_taps, clamp):
    x = RNG.randn(2, 3, 10, 10).astype(np.float32)
    b = RNG.randn(3).astype(np.float32)
    fu = None if fu_taps == 1 else RNG.randn(fu_taps).astype(np.float32)
    fd = None if fd_taps == 1 else RNG.randn(fd_taps).astype(np.float32)
    want = filtered_lrelu_np(x, fu, fd, b, up=up, down=down, padding=padding,
                             clamp=clamp)
    got = filtered_lrelu(nhwc(x), fu, fd, jnp.asarray(b), up=up, down=down,
                         padding=padding, clamp=clamp)
    np.testing.assert_allclose(nchw(got), want, rtol=1e-4, atol=1e-4)


def test_filtered_lrelu_radial_filter():
    x = RNG.randn(1, 2, 12, 12).astype(np.float32)
    fu = design_lowpass_filter(12, cutoff=3, width=4, fs=16)
    fd = design_lowpass_filter(12, cutoff=3, width=4, fs=16, radial=True)
    want = filtered_lrelu_np(x, fu, fd, None, up=2, down=2, padding=(6, 6))
    got = filtered_lrelu(nhwc(x), fu, fd, None, up=2, down=2, padding=(6, 6))
    np.testing.assert_allclose(nchw(got), want, rtol=1e-4, atol=1e-4)


# -------------------------------------------------------- modulated_conv2d

@pytest.mark.parametrize("kernel,demodulate,input_gain", [
    (1, True, None),
    (1, False, None),
    (3, True, None),
    (3, True, 0.7),
    (1, True, "per_channel"),
])
def test_modulated_conv2d_golden(kernel, demodulate, input_gain):
    n, ic, oc, hw = 2, 6, 5, 8
    x = RNG.randn(n, ic, hw, hw).astype(np.float32)
    w_oihw = RNG.randn(oc, ic, kernel, kernel).astype(np.float32)
    s = RNG.randn(n, ic).astype(np.float32) + 1.0
    ig = RNG.rand(ic).astype(np.float32) + 0.5 if input_gain == "per_channel" else input_gain
    padding = kernel - 1
    want = modulated_conv2d_np(x, w_oihw, s, demodulate=demodulate,
                               padding=padding, input_gain=ig)
    w_hwio = np.transpose(w_oihw, (2, 3, 1, 0))
    got = modulated_conv2d(nhwc(x), jnp.asarray(w_hwio), jnp.asarray(s),
                           demodulate=demodulate, padding=padding,
                           input_gain=None if ig is None else jnp.asarray(ig))
    np.testing.assert_allclose(nchw(got), want, rtol=2e-4, atol=2e-4)


# -------------------------------------------------------------- filter design

def test_design_lowpass_identity():
    assert design_lowpass_filter(1, 2, 4, 16) is None


def test_design_lowpass_separable():
    f = design_lowpass_filter(12, cutoff=2, width=4, fs=16)
    assert f.shape == (12,)
    np.testing.assert_allclose(f.sum(), 1.0, rtol=1e-6)


def test_design_lowpass_radial():
    f = design_lowpass_filter(24, cutoff=128, width=120, fs=512, radial=True)
    assert f.shape == (24, 24)
    np.testing.assert_allclose(f.sum(), 1.0, rtol=1e-5)
    assert np.isfinite(f).all()


def test_setup_filter_modes():
    assert setup_filter(None).shape == (1, 1)  # impulse → full 1x1
    f1 = setup_filter([1, 3, 3, 1])
    assert f1.shape == (4, 4)  # short 1-D → outer product
    f2 = setup_filter(list(range(1, 9)))
    assert f2.shape == (8,)  # long 1-D stays separable
    f3 = setup_filter([1, 2, 1], gain=4, separable=True)
    np.testing.assert_allclose(f3.sum(), 2.0, rtol=1e-6)  # gain^(1/2) * 1


# ------------------------------------------------- fused Pallas filtered lrelu

def test_fused_filtered_lrelu_vs_composition():
    """Fused one-kernel filtered lrelu (ops/pallas_flrelu.py) matches the
    composed reference semantics on every SG3-R layer geometry.

    Runs the Pallas kernel in interpret mode on CPU. Parity target: the
    reference fused CUDA kernel /root/reference/torch_utils/ops/
    filtered_lrelu.cu:139-153 via `_filtered_lrelu_ref` semantics.
    """
    import math

    from stylegan3_editing_tpu.models.sg3.config import (
        build_synthesis_layout, sg3_r_config)
    from stylegan3_editing_tpu.ops.filtered_lrelu import filtered_lrelu
    from stylegan3_editing_tpu.ops.pallas_flrelu import fused_filtered_lrelu

    layout = build_synthesis_layout(sg3_r_config(1024))
    rng = np.random.RandomState(0)
    # One u=2 positive-pad, one u=4 crop, one separable-down, one radial-down.
    picked = {"L0_36_1024", "L2_52_1024", "L12_1044_64", "L13_1024_64"}
    for s in layout.layers:
        if s.up_filter is None or s.name not in picked:
            continue
        hi = max(s.in_size[1] // 16, 24)
        wi = max(s.in_size[0] // 16, 24)
        c = min(s.out_channels, 40)
        x = jnp.asarray(rng.randn(2, hi, wi, c).astype(np.float32))
        b = jnp.asarray(rng.randn(c).astype(np.float32))
        ref = filtered_lrelu(
            x, fu=s.up_filter, fd=s.down_filter, b=b, up=s.up_factor,
            down=s.down_factor, padding=s.padding, clamp=s.conv_clamp,
            impl="xla")
        got = fused_filtered_lrelu(
            x, s.up_filter, s.down_filter, b, s.up_factor, s.down_factor,
            tuple(s.padding), gain=math.sqrt(2), slope=0.2,
            clamp=s.conv_clamp, c_block=32)
        assert got is not None, s.name
        assert got.shape == ref.shape, s.name
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5, err_msg=s.name)


def test_fused_filtered_lrelu_bf16_rank_truncation():
    """bf16 layers run rank-truncated + tap-compressed radial down filters
    (tol 3e-3 ≈ bf16's own resolution): the compressed result must stay
    within bf16 noise of the exact fp32 composition, and the compression
    must actually drop ranks/taps on the SG3-R radial filters (the perf
    point — chip ablation put ~60-75%% of hot-layer kernel time in the
    down-pass FMA chains)."""
    import math

    from stylegan3_editing_tpu.models.sg3.config import (
        build_synthesis_layout, sg3_r_config)
    from stylegan3_editing_tpu.ops.filtered_lrelu import filtered_lrelu
    from stylegan3_editing_tpu.ops.fir import _separate_2d
    from stylegan3_editing_tpu.ops.pallas_flrelu import (
        _truncate_rank_terms, fused_filtered_lrelu)

    layout = build_synthesis_layout(sg3_r_config(1024))
    s = next(l for l in layout.layers if l.name == "L8_276_406")
    full = _separate_2d(np.asarray(s.down_filter, np.float64))
    kept = _truncate_rank_terms(full)
    assert len(full) == 4 and len(kept) == 2  # σ₃/σ₁ ≈ 2.9e-3 < 3e-3
    # Tap zeroing is budget-gated: on the SG3-R jinc factors no tap is
    # small enough to zero within tol (kept factors stay dense) — the
    # chains must still handle zeros (structural zeros in other filters).
    nz = sum(int(np.count_nonzero(col)) + int(np.count_nonzero(row))
             for col, row in kept)
    tot = sum(len(col) + len(row) for col, row in kept)
    assert nz <= tot, (nz, tot)
    # And the compressed 2-D filter stays within the error budget.
    fd = np.asarray(s.down_filter, np.float64)
    approx = sum(np.outer(col, row) for col, row in kept)
    rel = np.linalg.norm(approx - fd) / np.linalg.norm(fd)
    assert rel <= 4.5e-3, rel  # tol 3e-3 each for rank + taps, RSS-combined

    rng = np.random.RandomState(1)
    x32 = rng.randn(2, 24, 24, 32).astype(np.float32)
    b = jnp.asarray(rng.randn(32).astype(np.float32))
    ref = filtered_lrelu(
        jnp.asarray(x32), fu=s.up_filter, fd=s.down_filter, b=b,
        up=s.up_factor, down=s.down_factor, padding=s.padding,
        clamp=s.conv_clamp, impl="xla")
    got = fused_filtered_lrelu(
        jnp.asarray(x32).astype(jnp.bfloat16), s.up_filter, s.down_filter,
        b, s.up_factor, s.down_factor, tuple(s.padding),
        gain=math.sqrt(2), slope=0.2, clamp=s.conv_clamp, c_block=32)
    assert got is not None
    err = np.abs(np.asarray(got, np.float32) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).max()
    # bf16 storage alone gives ~4e-3 relative; truncation adds ≤ 2e-4.
    assert err.max() <= 2e-2 * scale, err.max() / scale


def test_fused_filtered_lrelu_mxu_down_pass():
    """SG3TPU_FLRELU_DOWN=mxu routes the down stage through banded
    dot_generals (pallas_flrelu._down_matrices/_down_dot — the MXU engine)
    and must match the VPU tap-chain path exactly in f32: same polyphase
    read plan, expressed as matrices. Covers u=2/u=4 (split route), 1-D
    and radial 2-D down filters, asymmetric padding."""
    import math
    import os

    from stylegan3_editing_tpu.ops.pallas_flrelu import fused_filtered_lrelu

    rng = np.random.RandomState(7)
    cases = [
        (2, 24, 24, 8, False, (3, 3, 3, 3)),
        (2, 30, 26, 16, True, (5, 2, 4, 3)),
        (4, 16, 16, 8, True, (6, 6, 6, 6)),
        (4, 20, 14, 4, False, (4, 5, 6, 3)),
    ]
    for u, hi, wi, c, radial, pad in cases:
        x = jnp.asarray(rng.randn(2, hi, wi, c).astype(np.float32))
        b = jnp.asarray(rng.randn(c).astype(np.float32))
        fu = np.hanning(8 + u)[1:-1]
        fu /= fu.sum()
        if radial:
            w1 = np.hanning(10)[1:-1]
            fd = np.outer(w1, w1) / np.outer(w1, w1).sum() \
                + 0.03 * np.outer(w1[::-1], w1)
        else:
            fd = np.hanning(10)[1:-1]
            fd /= fd.sum()
        args = (x, fu, fd, b, u, 2, pad, math.sqrt(2), 0.2, 256.0)
        prev = os.environ.get("SG3TPU_FLRELU_DOWN")
        prev_up = os.environ.get("SG3TPU_FLRELU_UP")
        try:
            os.environ["SG3TPU_FLRELU_DOWN"] = "vpu"
            want = fused_filtered_lrelu(*args)
            os.environ["SG3TPU_FLRELU_DOWN"] = "mxu"
            got = fused_filtered_lrelu(*args)
            os.environ["SG3TPU_FLRELU_DOWN"] = "mxu_shared"
            got_shared = fused_filtered_lrelu(*args)
            got_shared_native = None
            if u == 4:
                # Single 16-plane kernel (no split) under the shared engine.
                os.environ["SG3TPU_FLRELU_U4"] = "native"
                got_shared_native = fused_filtered_lrelu(*args)
                os.environ.pop("SG3TPU_FLRELU_U4", None)
            os.environ["SG3TPU_FLRELU_DOWN"] = "mxu"
            os.environ["SG3TPU_FLRELU_UP"] = "mxu"  # both engines on MXU
            got_up = fused_filtered_lrelu(*args)
        finally:
            for key, val in (("SG3TPU_FLRELU_DOWN", prev),
                             ("SG3TPU_FLRELU_UP", prev_up)):
                if val is None:
                    os.environ.pop(key, None)
                else:
                    os.environ[key] = val
        assert got is not None and want is not None
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-6, rtol=2e-6,
                                   err_msg=f"u={u} radial={radial}")
        np.testing.assert_allclose(np.asarray(got_shared), np.asarray(want),
                                   atol=2e-6, rtol=2e-6,
                                   err_msg=f"shared u={u} radial={radial}")
        if got_shared_native is not None:
            np.testing.assert_allclose(
                np.asarray(got_shared_native), np.asarray(want),
                atol=2e-6, rtol=2e-6,
                err_msg=f"shared-native u={u} radial={radial}")
        np.testing.assert_allclose(np.asarray(got_up), np.asarray(want),
                                   atol=2e-6, rtol=2e-6,
                                   err_msg=f"up-mxu u={u} radial={radial}")

    # Backward kernel: same engine swap must be exact for dx too.
    from stylegan3_editing_tpu.ops.pallas_flrelu import (
        fused_filtered_lrelu_bwd)

    for u, hi, wi, c, radial, pad in cases[:3]:
        x = jnp.asarray(rng.randn(2, hi, wi, c).astype(np.float32))
        b = jnp.asarray(rng.randn(c).astype(np.float32))
        fu = np.hanning(8 + u)[1:-1]
        fu /= fu.sum()
        if radial:
            w1 = np.hanning(10)[1:-1]
            fd = np.outer(w1, w1) / np.outer(w1, w1).sum() \
                + 0.03 * np.outer(w1[::-1], w1)
        else:
            fd = np.hanning(10)[1:-1]
            fd /= fd.sum()
        prev = os.environ.get("SG3TPU_FLRELU_DOWN")
        try:
            os.environ["SG3TPU_FLRELU_DOWN"] = "vpu"
            y = fused_filtered_lrelu(x, fu, fd, b, u, 2, pad, math.sqrt(2),
                                     0.2, 256.0)
            dy = jnp.asarray(rng.randn(*y.shape).astype(np.float32))
            args = (dy, x, fu, fd, b, u, 2, pad, math.sqrt(2), 0.2, 256.0)
            want = fused_filtered_lrelu_bwd(*args)
            os.environ["SG3TPU_FLRELU_DOWN"] = "mxu"
            got = fused_filtered_lrelu_bwd(*args)
        finally:
            if prev is None:
                os.environ.pop("SG3TPU_FLRELU_DOWN", None)
            else:
                os.environ["SG3TPU_FLRELU_DOWN"] = prev
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-6, rtol=2e-6,
                                   err_msg=f"bwd u={u} radial={radial}")


def test_flrelu_auto_engine_rule(monkeypatch):
    """The 'auto' down-engine default resolves per the round-4/5 chip
    measurements (BASELINE.md MXU shootouts): banded-MXU for up=2 on TPU,
    VPU tap chains for up=4 and on non-TPU backends — with the round-5
    phase-shared exceptions on the measured-winner SG3-R geometries
    (L11 at any batch; L9/L10 at the bench batch, with L10 on 18 MB
    tiles). Keys are the post-fold (h, n·C) the dispatch sees."""
    import math
    import os

    from stylegan3_editing_tpu.ops import pallas_flrelu as pf

    assert pf._auto_down_mode(2)[0] == "vpu"  # CPU backend in tests
    assert pf._auto_down_mode(4)[0] == "vpu"
    monkeypatch.setattr(pf.jax, "default_backend", lambda: "tpu")
    assert pf._auto_down_mode(2) == ("mxu", None)
    assert pf._auto_down_mode(4) == ("vpu", None)
    # Round-5 measured-winner geometries (keys = the REAL margin-extended
    # SG3-R input canvases: L11 in 1044², L9 in 276², L10 in 532²):
    assert pf._auto_down_mode(2, h=1044, c=8 * 102) == ("mxu_shared", None)
    assert pf._auto_down_mode(2, h=1044, c=102) == ("mxu_shared", None)
    assert pf._auto_down_mode(2, h=1044, c=8 * 64) == ("mxu", None)  # L12/13
    assert pf._auto_down_mode(4, h=276, c=8 * 256) == ("mxu_shared", None)
    assert pf._auto_down_mode(4, h=276, c=2 * 256) == ("mxu_shared", None)
    assert pf._auto_down_mode(4, h=276, c=256) == ("vpu", None)  # b1
    assert pf._auto_down_mode(4, h=532, c=8 * 161) == ("mxu_shared", 18)
    assert pf._auto_down_mode(4, h=532, c=2 * 161) == ("vpu", None)
    monkeypatch.undo()

    # Env unset → auto; on CPU that is the VPU path and must match an
    # explicit vpu run bit-for-bit.
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 12, 12, 4).astype(np.float32))
    fu = np.hanning(10)[1:-1]
    fu /= fu.sum()
    fd = np.hanning(10)[1:-1]
    fd /= fd.sum()
    args = (x, fu, fd, None, 2, 2, (3, 3, 3, 3), math.sqrt(2), 0.2, 256.0)
    prev = os.environ.pop("SG3TPU_FLRELU_DOWN", None)
    try:
        got = pf.fused_filtered_lrelu(*args)
        os.environ["SG3TPU_FLRELU_DOWN"] = "vpu"
        want = pf.fused_filtered_lrelu(*args)
    finally:
        if prev is None:
            os.environ.pop("SG3TPU_FLRELU_DOWN", None)
        else:
            os.environ["SG3TPU_FLRELU_DOWN"] = prev
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # The backward-only override pins the bwd engine without touching the
    # forward: SG3TPU_FLRELU_DOWN_BWD=mxu must stay exact vs the default.
    y = pf.fused_filtered_lrelu(*args)
    dy = jnp.asarray(rng.randn(*y.shape).astype(np.float32))
    bwd_args = (dy, x, fu, fd, None, 2, 2, (3, 3, 3, 3),
                math.sqrt(2), 0.2, 256.0)
    want_b = pf.fused_filtered_lrelu_bwd(*bwd_args)
    prev_b = os.environ.get("SG3TPU_FLRELU_DOWN_BWD")
    try:
        os.environ["SG3TPU_FLRELU_DOWN_BWD"] = "mxu"
        got_b = pf.fused_filtered_lrelu_bwd(*bwd_args)
    finally:
        if prev_b is None:
            os.environ.pop("SG3TPU_FLRELU_DOWN_BWD", None)
        else:
            os.environ["SG3TPU_FLRELU_DOWN_BWD"] = prev_b
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want_b),
                               atol=2e-6, rtol=2e-6)


def test_fused_filtered_lrelu_unsupported_configs():
    from stylegan3_editing_tpu.ops.pallas_flrelu import fused_filtered_lrelu

    x = jnp.zeros((1, 8, 8, 4))
    f = np.ones(4) / 4
    # down != 2 and missing filters are outside the kernel envelope
    assert fused_filtered_lrelu(x, f, f, None, 2, 1, (0, 0, 0, 0),
                                1.0, 0.2, None) is None
    assert fused_filtered_lrelu(x, None, f, None, 2, 2, (0, 0, 0, 0),
                                1.0, 0.2, None) is None


# ---------------------------------------------------------- conv2d_resample

class TestConv2dResample:
    """Parity vs the reference torch conv2d_resample (impl='ref' CPU ops) —
    every fast path: 1×1 up/down, strided down, transpose up, plain."""

    CASES = [
        # (kh, up, down, padding, groups, flip_weight)
        (1, 1, 2, 0, 1, True),    # 1×1 down-first
        (1, 2, 1, 0, 1, True),    # 1×1 conv-first + up
        (3, 1, 2, 1, 1, True),    # strided down conv
        (3, 2, 1, 1, 1, True),    # transpose up conv
        (3, 2, 1, 1, 1, False),   # transpose up, convolution convention
        (3, 2, 2, 1, 1, True),    # up then down
        (3, 1, 1, 1, 1, True),    # plain symmetric padding
        (3, 1, 1, (1, 0, 2, 1), 1, True),  # generic fallback (asym pad)
        (3, 2, 1, 1, 2, True),    # grouped transpose up
    ]

    @pytest.mark.parametrize("kh,up,down,padding,groups,flip_weight", CASES)
    def test_parity_with_reference(self, kh, up, down, padding, groups,
                                   flip_weight):
        import os
        import sys

        if not os.path.isdir("/root/reference"):
            pytest.skip("reference checkout not available")
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        torch = pytest.importorskip("torch")
        os.environ.setdefault("SG3_NO_CUDA", "1")
        from torch_utils.ops import conv2d_resample as ref_mod
        from torch_utils.ops.upfirdn2d import setup_filter as ref_setup

        from stylegan3_editing_tpu.ops.conv2d_resample import conv2d_resample
        from stylegan3_editing_tpu.ops.filter_design import setup_filter

        rng = np.random.RandomState(kh * 100 + up * 10 + down + groups)
        n, c_in, c_out, size = 2, 6, 4, 16
        x = rng.randn(n, size, size, c_in).astype(np.float32)
        w = rng.randn(kh, kh, c_in // groups, c_out).astype(np.float32) * 0.3
        taps = rng.rand(4).astype(np.float32) + 0.1

        f_ref = ref_setup(torch.from_numpy(taps))
        with torch.no_grad():
            want = ref_mod.conv2d_resample(
                torch.from_numpy(x.transpose(0, 3, 1, 2)),
                torch.from_numpy(w.transpose(3, 2, 0, 1)).contiguous(),
                f=f_ref, up=up, down=down, padding=padding, groups=groups,
                flip_weight=flip_weight)
        want = want.numpy().transpose(0, 2, 3, 1)

        got = conv2d_resample(
            jnp.asarray(x), jnp.asarray(w), f=setup_filter(taps),
            up=up, down=down, padding=padding, groups=groups,
            flip_weight=flip_weight)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_fused_filtered_lrelu_backward_kernel():
    """One-kernel backward (dx + db) vs autodiff of the composition — every
    SG3-R tiny geometry incl. ×4 up and radial down filters (reference
    backward: same CUDA kernel with swapped filters + sign read,
    filtered_lrelu.py:253-264)."""
    import jax

    from stylegan3_editing_tpu.models.sg3 import sg3_r_config
    from stylegan3_editing_tpu.models.sg3.config import build_synthesis_layout
    from stylegan3_editing_tpu.ops.filtered_lrelu import filtered_lrelu
    from stylegan3_editing_tpu.ops.pallas_flrelu import (
        fused_filtered_lrelu_bwd)

    cfg = sg3_r_config(32, channel_base=1024, channel_max=128, num_layers=4,
                       num_critical=2, use_bf16=False)
    layout = build_synthesis_layout(cfg)
    rng = np.random.RandomState(0)
    for L in layout.layers:
        if L.up_factor == 1:
            continue
        x = jnp.asarray(rng.randn(1, L.in_size[1], L.in_size[0],
                                  8).astype(np.float32))
        b = jnp.asarray(rng.randn(8).astype(np.float32))

        def f(xc, bc, _L=L):
            return filtered_lrelu(
                xc, fu=_L.up_filter, fd=_L.down_filter, b=bc,
                up=_L.up_factor, down=_L.down_factor, padding=_L.padding,
                gain=np.sqrt(2), slope=0.2, clamp=_L.conv_clamp, impl="xla")

        y, vjp = jax.vjp(f, x, b)
        dy = jnp.asarray(rng.randn(*y.shape).astype(np.float32))
        want_dx, want_db = vjp(dy)
        got_dx = fused_filtered_lrelu_bwd(
            dy, x, L.up_filter, L.down_filter, b, L.up_factor,
            L.down_factor, L.padding, gain=float(np.sqrt(2)), slope=0.2,
            clamp=L.conv_clamp)
        assert got_dx is not None, L.name
        np.testing.assert_allclose(np.asarray(got_dx), np.asarray(want_dx),
                                   rtol=1e-4, atol=1e-5, err_msg=L.name)
        got_db = jnp.sum(got_dx, axis=(0, 1, 2))
        np.testing.assert_allclose(np.asarray(got_db), np.asarray(want_db),
                                   rtol=1e-4, atol=1e-4, err_msg=L.name)
