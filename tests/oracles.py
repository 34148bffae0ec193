"""Independent NumPy oracles for golden op tests.

Straightforward loop/stride implementations of the documented op semantics
(reference: torch_utils/ops/*.py `_ref` paths, described in SURVEY.md §2a/2b).
Written for clarity, not speed — tests use tiny tensors. All oracles use the
reference's NCHW layout; tests transpose when comparing against the NHWC ops.
"""

import numpy as np


def _pair(v):
    if isinstance(v, (int, np.integer)):
        return int(v), int(v)
    a, b = v
    return int(a), int(b)


def _pad4(padding):
    if isinstance(padding, (int, np.integer)):
        padding = [padding, padding]
    padding = [int(p) for p in padding]
    if len(padding) == 2:
        px, py = padding
        padding = [px, px, py, py]
    return padding


def upfirdn2d_np(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1):
    """NCHW upfirdn2d oracle: zero-stuff, pad/crop, correlate, stride."""
    x = np.asarray(x, np.float64)
    n, c, in_h, in_w = x.shape
    upx, upy = _pair(up)
    downx, downy = _pair(down)
    px0, px1, py0, py1 = _pad4(padding)

    if f is None:
        f = np.ones((1, 1), np.float64)
    f = np.asarray(f, np.float64)
    if f.ndim == 1:
        f2 = np.outer(f, f) * (gain)  # separable: total gain across both passes
    else:
        f2 = f * gain
    if not flip_filter:
        f2 = f2[::-1, ::-1]
    fh, fw = f2.shape

    # Zero-stuff: up-1 zeros after each sample.
    up_h, up_w = in_h * upy, in_w * upx
    xu = np.zeros((n, c, up_h, up_w), np.float64)
    xu[:, :, ::upy, ::upx] = x

    # Pad (positive) then crop (negative).
    xp = np.pad(
        xu,
        ((0, 0), (0, 0), (max(py0, 0), max(py1, 0)), (max(px0, 0), max(px1, 0))),
    )
    xp = xp[
        :,
        :,
        max(-py0, 0): xp.shape[2] - max(-py1, 0),
        max(-px0, 0): xp.shape[3] - max(-px1, 0),
    ]

    # Valid correlation with the (possibly flipped) filter, then stride.
    oh = xp.shape[2] - fh + 1
    ow = xp.shape[3] - fw + 1
    y = np.zeros((n, c, oh, ow), np.float64)
    for i in range(oh):
        for j in range(ow):
            patch = xp[:, :, i:i + fh, j:j + fw]
            y[:, :, i, j] = np.einsum("nchw,hw->nc", patch, f2)
    return y[:, :, ::downy, ::downx]


def bias_act_np(x, b=None, dim=1, act="linear", alpha=None, gain=None, clamp=None):
    """Bias + activation + gain + clamp oracle (NCHW channel dim=1)."""
    defaults = {
        "linear": (0.0, 1.0, lambda v, a: v),
        "relu": (0.0, np.sqrt(2), lambda v, a: np.maximum(v, 0)),
        "lrelu": (0.2, np.sqrt(2), lambda v, a: np.where(v >= 0, v, v * a)),
        "tanh": (0.0, 1.0, lambda v, a: np.tanh(v)),
        "sigmoid": (0.0, 1.0, lambda v, a: 1 / (1 + np.exp(-v))),
        "elu": (0.0, 1.0, lambda v, a: np.where(v >= 0, v, np.expm1(v))),
        "selu": (
            0.0,
            1.0,
            lambda v, a: 1.0507009873554805 * np.where(
                v >= 0, v, 1.6732632423543772 * np.expm1(v)),
        ),
        "softplus": (0.0, 1.0, lambda v, a: np.log1p(np.exp(v))),
        "swish": (0.0, np.sqrt(2), lambda v, a: v / (1 + np.exp(-v))),
    }
    def_alpha, def_gain, fn = defaults[act]
    alpha = def_alpha if alpha is None else alpha
    gain = def_gain if gain is None else gain
    x = np.asarray(x, np.float64)
    if b is not None:
        shape = [1] * x.ndim
        shape[dim] = -1
        x = x + np.asarray(b, np.float64).reshape(shape)
    x = fn(x, alpha) * gain
    if clamp is not None:
        x = np.clip(x, -clamp, clamp)
    return x


def filtered_lrelu_np(x, fu=None, fd=None, b=None, up=1, down=1, padding=0,
                      gain=np.sqrt(2), slope=0.2, clamp=None, flip_filter=False):
    """Composition oracle: bias → up-FIR(gain=up²) → lrelu → down-FIR."""
    px0, px1, py0, py1 = _pad4(padding)
    x = bias_act_np(x, b)
    x = upfirdn2d_np(x, fu, up=up, padding=[px0, px1, py0, py1],
                     gain=up ** 2, flip_filter=flip_filter)
    x = bias_act_np(x, act="lrelu", alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d_np(x, fd, down=down, flip_filter=flip_filter)
    return x


def modulated_conv2d_np(x, w, s, demodulate=True, padding=0, input_gain=None):
    """Per-sample modulated conv oracle, NCHW / OIHW, explicit weights."""
    x = np.asarray(x, np.float64)
    w = np.asarray(w, np.float64)  # [O, I, kh, kw]
    s = np.asarray(s, np.float64)  # [N, I]
    n = x.shape[0]
    out_c, in_c, kh, kw = w.shape

    if demodulate:
        w = w * (np.mean(np.square(w), axis=(1, 2, 3), keepdims=True) ** -0.5)
        s = s * (np.mean(np.square(s)) ** -0.5)

    wn = w[None] * s[:, None, :, None, None]  # [N, O, I, kh, kw]
    if demodulate:
        d = (np.sum(np.square(wn), axis=(2, 3, 4)) + 1e-8) ** -0.5  # [N, O]
        wn = wn * d[:, :, None, None, None]
    if input_gain is not None:
        ig = np.broadcast_to(np.asarray(input_gain, np.float64), (n, in_c))
        wn = wn * ig[:, None, :, None, None]

    xp = np.pad(x, ((0, 0), (0, 0), (padding, padding), (padding, padding)))
    oh = xp.shape[2] - kh + 1
    ow = xp.shape[3] - kw + 1
    y = np.zeros((n, out_c, oh, ow), np.float64)
    for i in range(oh):
        for j in range(ow):
            patch = xp[:, :, i:i + kh, j:j + kw]  # [N, I, kh, kw]
            y[:, :, i, j] = np.einsum("nikl,noikl->no", patch, wn)
    return y
