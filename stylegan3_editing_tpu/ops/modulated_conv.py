"""Style-modulated convolution, TPU-first.

Semantics parity: reference `modulated_conv2d`
(/root/reference/models/stylegan3/networks_stylegan3.py:24-63).

The reference materializes per-sample weight tensors [N, O, I, kh, kw] and
runs a grouped conv with groups=batch — a CUDA-ism that defeats the MXU. By
linearity of convolution, modulating weight input-channels by s[n, i] equals
scaling input channels by s[n, i], and demodulating weight out-channels by
d[n, o] equals scaling output channels — so here we run **one batch-shared
conv** on style-scaled inputs and rescale outputs, keeping the conv large,
batched, and MXU-tileable (and for kernel 1 — the SG3-R config — XLA lowers
it to a single [N*H*W, I] @ [I, O] matmul).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def modulated_conv2d(
    x: jax.Array,
    w: jax.Array,
    s: jax.Array,
    demodulate: bool = True,
    padding: int = 0,
    input_gain: Optional[jax.Array] = None,
    up: int = 1,
) -> jax.Array:
    """Per-sample style-modulated conv over NHWC images.

    Args:
        x: input ``[N, H, W, I]`` (compute dtype: fp32 or bf16).
        w: weights ``[kh, kw, I, O]`` (fp32).
        s: styles ``[N, I]`` (fp32).
        demodulate: pre-normalize w and s, demodulate output channels.
        padding: symmetric spatial padding (int).
        input_gain: optional scale for input channels — scalar, ``[I]``,
            or ``[N, I]`` (the magnitude-EMA gain of alias-free layers).

    Returns:
        ``[N, H + 2*padding - kh + 1, W + 2*padding - kw + 1, O]`` in x.dtype.
    """
    batch = x.shape[0]
    kh, kw, in_channels, out_channels = w.shape
    assert x.shape[-1] == in_channels
    assert s.shape == (batch, in_channels)

    w = w.astype(jnp.float32)
    s = s.astype(jnp.float32)

    # Pre-normalize (training-time numerical hygiene; per-O weight norm and
    # a global style norm, exactly as the reference).
    if demodulate:
        w = w * lax.rsqrt(jnp.mean(jnp.square(w), axis=(0, 1, 2), keepdims=True))
        s = s * lax.rsqrt(jnp.mean(jnp.square(s)))

    # Demodulation coefficients: d[n,o] = rsqrt(sum_i s^2[n,i]·(sum_kk w^2)[i,o] + eps).
    if demodulate:
        w_sq = jnp.sum(jnp.square(w), axis=(0, 1))  # [I, O]
        dcoefs = lax.rsqrt(jnp.square(s) @ w_sq + 1e-8)  # [N, O]

    # Fold styles (and the magnitude-EMA input gain) into an input-channel scale.
    scale = s
    if input_gain is not None:
        input_gain = jnp.broadcast_to(
            jnp.asarray(input_gain, jnp.float32).reshape(
                (1, -1) if jnp.ndim(input_gain) <= 1 else (batch, in_channels)),
            (batch, in_channels))
        scale = scale * input_gain

    out_dtype = x.dtype
    x = x * scale[:, None, None, :].astype(x.dtype)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    # No preferred_element_type override: the TPU MXU accumulates bf16
    # matmuls in fp32 internally, and a fp32 output dtype breaks the conv
    # transpose under autodiff (cotangent/operand dtype mismatch).
    # `up=2`: transpose-conv semantics via input dilation (the reference
    # SG2/XL up-convs, conv2d_resample.py:47 up path) — out = 2·in + 2·pad
    # - k + 2; callers follow with the FIR blur to land on the 2× grid.
    x = lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding=((padding, padding), (padding, padding)),
        lhs_dilation=(up, up),
        dimension_numbers=dn,
    )
    if demodulate:
        x = x * dcoefs[:, None, None, :].astype(x.dtype)
    return x.astype(out_dtype)
