"""Mesh construction and parameter-sharding rules.

Replaces the reference's data-parallel NCCL design (SURVEY.md §5): a 2-D
``('data', 'model')`` mesh where the batch axis shards over 'data' (pure DP —
the reference's only parallelism) and the widest channel dimensions of
generator weights shard over 'model' (tensor parallelism the reference never
had). Collectives ride ICI automatically once shardings are annotated.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on 'data', one 'model' group — matching the
    reference's pure data parallelism. Pass ``shape=(dp, tp)`` for 2-D.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for batched arrays: leading dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_for_param(path: str, value: jax.Array, mesh: Mesh,
                    model_axis: str = "model", min_size: int = 128) -> P:
    """Tensor-parallel rule: shard the widest weight dims over 'model'.

    - FC weights ``[out, in]`` → shard `out` when divisible.
    - Conv weights ``[kh, kw, I, O]`` → shard `O` when divisible.
    Biases and small params stay replicated (they are tiny; their psum cost
    would dwarf the memory win).
    """
    tp = mesh.shape[model_axis]
    if tp <= 1 or value.ndim < 2:
        return P()
    if value.ndim == 2 and value.shape[0] % tp == 0 and value.shape[0] >= min_size:
        return P(model_axis, None)
    if value.ndim == 4 and value.shape[-1] % tp == 0 and value.shape[-1] >= min_size:
        return P(None, None, None, model_axis)
    return P()


def shard_params(variables, mesh: Mesh, model_axis: str = "model"):
    """Place a variable pytree on the mesh under the TP rule above."""

    flat, treedef = jax.tree_util.tree_flatten_with_path(variables)
    placed = []
    for path, value in flat:
        pathstr = jax.tree_util.keystr(path)
        spec = _spec_for_param(pathstr, value, mesh, model_axis)
        placed.append(jax.device_put(value, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, placed)
