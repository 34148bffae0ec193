"""Fused bias + activation + gain + clamp.

TPU-native equivalent of the reference CUDA kernel
(/root/reference/torch_utils/ops/bias_act.{cu,cpp}); semantics match the
reference `_bias_act_ref` (/root/reference/torch_utils/ops/bias_act.py:92-121).

On TPU there is nothing to hand-fuse: under jit, XLA fuses the whole chain
into one elementwise (VPU) kernel, and autodiff provides arbitrary-order
gradients — the reference's hand-written 2nd-order autograd pair is not
needed. The activation registry (name → fn, default alpha/gain) mirrors
bias_act.py:22-32 so network code can parametrize activations by name.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ActivationSpec:
    func: Callable[..., jax.Array]
    def_alpha: float = 0.0
    def_gain: float = 1.0


_SQRT2 = float(np.sqrt(2))

activation_funcs: dict[str, ActivationSpec] = {
    "linear": ActivationSpec(lambda x, **_: x),
    "relu": ActivationSpec(lambda x, **_: jax.nn.relu(x), def_gain=_SQRT2),
    "lrelu": ActivationSpec(
        lambda x, alpha, **_: jnp.where(x >= 0, x, x * alpha),
        def_alpha=0.2,
        def_gain=_SQRT2,
    ),
    "tanh": ActivationSpec(lambda x, **_: jnp.tanh(x)),
    "sigmoid": ActivationSpec(lambda x, **_: jax.nn.sigmoid(x)),
    "elu": ActivationSpec(lambda x, **_: jax.nn.elu(x)),
    "selu": ActivationSpec(lambda x, **_: jax.nn.selu(x)),
    "softplus": ActivationSpec(lambda x, **_: jax.nn.softplus(x)),
    "swish": ActivationSpec(lambda x, **_: jax.nn.sigmoid(x) * x, def_gain=_SQRT2),
}


def bias_act(
    x: jax.Array,
    b: Optional[jax.Array] = None,
    dim: int = -1,
    act: str = "linear",
    alpha: Optional[float] = None,
    gain: Optional[float] = None,
    clamp: Optional[float] = None,
) -> jax.Array:
    """Add per-channel bias, apply activation, scale by gain, clamp.

    Args:
        x: input of any shape.
        b: 1-D bias matching ``x.shape[dim]``, or ``None``.
        dim: channel dimension of ``x`` (default -1: NHWC convention).
        act: activation name from `activation_funcs`.
        alpha: activation shape parameter (None = registry default).
        gain: output scale (None = registry default).
        clamp: clamp output to ``[-clamp, clamp]`` (None = disabled).
    """
    spec = activation_funcs[act]
    alpha = float(alpha if alpha is not None else spec.def_alpha)
    gain = float(gain if gain is not None else spec.def_gain)
    assert clamp is None or clamp >= 0

    if b is not None:
        assert b.ndim == 1
        axis = dim % x.ndim
        assert b.shape[0] == x.shape[axis]
        shape = [1] * x.ndim
        shape[axis] = -1
        x = x + b.reshape(shape).astype(x.dtype)

    x = spec.func(x, alpha=alpha)
    if gain != 1:
        x = x * jnp.asarray(gain, x.dtype)
    if clamp is not None:
        x = jnp.clip(x, -clamp, clamp)
    return x
