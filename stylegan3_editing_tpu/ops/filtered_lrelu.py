"""Filtered leaky ReLU: bias → up-FIR → leaky-ReLU·gain → clamp → down-FIR.

The hot op of alias-free synthesis (≈90% of reference synthesis time). TPU
equivalent of the reference's 1.7k-line CUDA kernel
(/root/reference/torch_utils/ops/filtered_lrelu.{cu,cpp}); semantics match
the reference `_filtered_lrelu_ref`
(/root/reference/torch_utils/ops/filtered_lrelu.py:122-154).

Implementation notes (TPU-first):
- The composition below is jit-fused by XLA: the bias add folds into the
  up-FIR conv, the lrelu/gain/clamp chain folds into one VPU kernel between
  the two depthwise convs. No sign tensor is needed — JAX recomputes the
  cheap elementwise chain in the backward pass (the convs' transposes are
  analytic upfirdn2d calls XLA derives automatically).
- A fully fused Pallas kernel (VMEM-tiled, one HBM round-trip) is the
  planned fast path; `impl` selects between 'xla' (default) and future
  'pallas'.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .bias_act import bias_act
from .upfirdn2d import _filter_size, parse_padding, upfirdn2d


def filtered_lrelu(
    x: jax.Array,
    fu: Optional[Union[np.ndarray, jax.Array]] = None,
    fd: Optional[Union[np.ndarray, jax.Array]] = None,
    b: Optional[jax.Array] = None,
    up: int = 1,
    down: int = 1,
    padding=0,
    gain: float = float(np.sqrt(2)),
    slope: float = 0.2,
    clamp: Optional[float] = None,
    flip_filter: bool = False,
    impl: str = "xla",
) -> jax.Array:
    """Fused filtered leaky ReLU over NHWC images.

    Args:
        x: ``[N, H, W, C]`` input.
        fu / fd: up/downsampling FIR filters (1-D separable, 2-D, or None).
        b: per-channel bias ``[C]`` or None.
        up / down: integer resampling factors.
        padding: w.r.t. the upsampled image; scalar / (x, y) / (x0, x1, y0, y1).
        gain: scale applied with the leaky ReLU (default sqrt(2)).
        slope: negative-side slope of the leaky ReLU.
        clamp: clamp magnitude after activation (None = disabled).
        flip_filter: False = convolution, True = correlation.

    Returns:
        ``[N, out_h, out_w, C]`` with
        ``out = (in*up + pad0 + pad1 - (fu_taps-1) - (fd_taps-1) + (down-1)) // down``.
    """
    assert x.ndim == 4, "expected NHWC input"
    if impl == "auto":
        import os
        # TPU default: the fused one-kernel path (fastest measured,
        # differentiable via its composition-backed VJP). SG3TPU_FLRELU_IMPL
        # overrides ('xla' = composed ops).
        default = "fused" if jax.default_backend() == "tpu" else "xla"
        impl = os.environ.get("SG3TPU_FLRELU_IMPL", default)
    assert impl in ("xla", "pallas", "auto", "fused")
    assert isinstance(up, int) and up >= 1
    assert isinstance(down, int) and down >= 1
    px0, px1, py0, py1 = parse_padding(padding)
    assert gain > 0 and slope >= 0
    assert clamp is None or clamp >= 0

    fu_w, fu_h = _filter_size(None if fu is None else jnp.asarray(fu, jnp.float32))
    fd_w, fd_h = _filter_size(None if fd is None else jnp.asarray(fd, jnp.float32))
    batch, in_h, in_w, channels = x.shape
    in_dtype = x.dtype
    out_w = (in_w * up + (px0 + px1) - (fu_w - 1) - (fd_w - 1) + (down - 1)) // down
    out_h = (in_h * up + (py0 + py1) - (fu_h - 1) - (fd_h - 1) + (down - 1)) // down

    if impl == "fused" and not flip_filter and jax.default_backend() == "tpu":
        # One-kernel VMEM path (ops/pallas_flrelu.py): the ×u intermediate
        # grid never touches HBM. Falls through to the composition when the
        # config is outside the kernel's envelope (e.g. the filterless
        # ToRGB layer, odd down factors). Differentiable: a custom VJP runs
        # the fused kernel forward and the composition's autodiff backward
        # (fused grads fall out of the same composed graph under remat).
        from .pallas_flrelu import fused_filtered_lrelu

        from .fir import _separate_2d

        fu_np = fu if (fu is None or isinstance(fu, np.ndarray)) else None
        fd_np = fd if (fd is None or isinstance(fd, np.ndarray)) else None
        supported = (
            fu_np is not None and fd_np is not None
            and down == 2 and up in (2, 4) and np.ndim(fu_np) == 1
            and (np.ndim(fd_np) == 1
                 or _separate_2d(np.asarray(fd_np)[::-1, ::-1]) is not None))
        if supported:
            def composed(xc, bc):
                return filtered_lrelu(
                    xc, fu=fu_np, fd=fd_np, b=bc, up=up, down=down,
                    padding=padding, gain=gain, slope=slope, clamp=clamp,
                    flip_filter=flip_filter, impl="xla")

            @jax.custom_vjp
            def fused_op(xc, bc):
                out = fused_filtered_lrelu(
                    xc, fu_np, fd_np, bc, up, down, (px0, px1, py0, py1),
                    gain=gain, slope=slope, clamp=clamp)
                assert out is not None
                return out

            def fwd(xc, bc):
                return fused_op(xc, bc), (xc, bc)

            def bwd(res, dy):
                import os

                xc, bc = res
                if (jax.default_backend() == "tpu"
                        and os.environ.get("SG3TPU_FLRELU_BWD") != "composed"):
                    # Fused one-kernel backward (reference: the same CUDA
                    # kernel with swapped filters + sign read,
                    # filtered_lrelu.py:253-264; here A is recomputed per
                    # tile in VMEM instead of storing a sign tensor).
                    from .pallas_flrelu import fused_filtered_lrelu_bwd

                    dx = fused_filtered_lrelu_bwd(
                        dy, xc, fu_np, fd_np, bc, up, down,
                        (px0, px1, py0, py1), gain=gain, slope=slope,
                        clamp=clamp)
                    if dx is not None:
                        db = jnp.sum(dx.astype(jnp.float32), axis=(0, 1, 2))
                        return dx, db.astype(bc.dtype)
                _, vjp_fn = jax.vjp(composed, xc, bc)
                return vjp_fn(dy)

            fused_op.defvjp(fwd, bwd)
            out = fused_op(x, b if b is not None
                           else jnp.zeros((channels,), jnp.float32))
            assert out.shape == (batch, out_h, out_w, channels)
            return out

    x = bias_act(x=x, b=b)
    x = upfirdn2d(
        x=x, f=fu, up=up, padding=[px0, px1, py0, py1],
        gain=up ** 2, flip_filter=flip_filter)
    x = bias_act(x=x, act="lrelu", alpha=slope, gain=gain, clamp=clamp)
    x = upfirdn2d(x=x, f=fd, down=down, flip_filter=flip_filter)

    assert x.shape == (batch, out_h, out_w, channels)
    assert x.dtype == in_dtype
    return x
