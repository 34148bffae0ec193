"""InceptionV3 (FID variant, pool3 features) — flax NHWC port.

The reference computes FID against NVIDIA's InceptionV3 TorchScript pickle
(/root/reference/setgan/metric_utils.py:374-402, setgan/metrics.py:28-76),
which is the TF-2015 FID network: torchvision InceptionV3 topology with the
FID patches (branch-pool average pooling excludes padding; Mixed_7c uses a
max pool in its pool branch) and BatchNorm eps=1e-3. This module re-derives
that topology in flax; `convert_inception` maps a torch state dict with
torchvision/pytorch-fid naming (`Mixed_5b.branch1x1.conv.weight`, …) onto it.

Preprocessing matches the NVIDIA detector: bilinear resize to 299² and
(x_uint8 − 128)/128 scaling — `inception_features` takes [-1, 1] NHWC images
and applies the exact equivalent affine.
"""

from __future__ import annotations

from typing import Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.image import max_pool2d, resize_bilinear
from .common import BatchNorm, bn_from_torch, conv_w, put


def _avg_pool_3x3_same(x: jax.Array) -> jax.Array:
    """3×3 stride-1 same-padded average pool, count_include_pad=False
    (the FID patch on torchvision's InceptionA/C/E pool branches)."""
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    sum_ = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
    return sum_ / cnt


def _max_pool_3x3_same(x: jax.Array) -> jax.Array:
    """3×3 stride-1 same-padded max pool (Mixed_7c FID patch)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1), "SAME")


class BasicConv2d(nn.Module):
    out: int
    kernel: tuple
    stride: int = 1
    padding: tuple = (0, 0)

    @nn.compact
    def __call__(self, x):
        pad = ((self.padding[0], self.padding[0]),
               (self.padding[1], self.padding[1]))
        x = nn.Conv(self.out, self.kernel, strides=self.stride, padding=pad,
                    use_bias=False, name="conv")(x)
        x = BatchNorm(epsilon=1e-3, name="bn")(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_same(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = max_pool2d(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_same(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = max_pool2d(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool: str = "avg"  # Mixed_7b: 'avg' (no count pad); Mixed_7c: 'max'

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        bp = _avg_pool_3x3_same(x) if self.pool == "avg" else _max_pool_3x3_same(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """[-1, 1] NHWC images (any size) → [N, 2048] pool3 features."""

    resize_input: bool = True

    @nn.compact
    def __call__(self, x):
        if self.resize_input:
            x = resize_bilinear(x, 299)
        # NVIDIA detector scaling: uint8 → (v − 128)/128; from [-1, 1]:
        # v = (x + 1)·127.5 → (x·127.5 − 0.5)/128.
        x = x * np.float32(127.5 / 128.0) - np.float32(0.5 / 128.0)
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = max_pool2d(x, 3, 2)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = max_pool2d(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool → [N, 2048]


# Every BasicConv2d in the network, in torch dotted naming.
_BLOCKS = (
    ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3", "Conv2d_3b_1x1",
     "Conv2d_4a_3x3"]
    + [f"Mixed_5{s}.{b}" for s in "bcd"
       for b in ("branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1",
                 "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool")]
    + [f"Mixed_6a.{b}" for b in ("branch3x3", "branch3x3dbl_1",
                                 "branch3x3dbl_2", "branch3x3dbl_3")]
    + [f"Mixed_6{s}.{b}" for s in "bcde"
       for b in ("branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
                 "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                 "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool")]
    + [f"Mixed_7a.{b}" for b in ("branch3x3_1", "branch3x3_2", "branch7x7x3_1",
                                 "branch7x7x3_2", "branch7x7x3_3",
                                 "branch7x7x3_4")]
    + [f"Mixed_7{s}.{b}" for s in "bc"
       for b in ("branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
                 "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a",
                 "branch3x3dbl_3b", "branch_pool")]
)


def convert_inception(state: Mapping[str, np.ndarray]) -> dict:
    """torch (torchvision / pytorch-fid) InceptionV3 state dict → variables."""
    params: dict = {}
    stats: dict = {}
    for name in _BLOCKS:
        flax_name = name.replace(".", "/")
        put(params, f"{flax_name}/conv/kernel", conv_w(state[f"{name}.conv.weight"]))
        bn_from_torch(params, stats, f"{flax_name}/bn", state, f"{name}.bn")
    return {"params": params, "batch_stats": stats}


def inception_feature_fn(variables):
    """Returns a jitted `images([-1,1] NHWC) → [N, 2048]` feature callable
    (the default ConditionalFID extractor)."""
    model = InceptionV3Features()

    @jax.jit
    def features(images):
        return model.apply(variables, jnp.asarray(images, jnp.float32))

    return features
