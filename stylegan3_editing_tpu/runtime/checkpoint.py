"""Checkpoint I/O: orbax pytrees + JSON sidecar metadata.

Replaces the reference's three torch formats (SURVEY.md §5 checkpoint/resume)
with one: orbax PyTree checkpoints (multihost-coordinated on real pods) for
variables/optimizer state, plus a JSON sidecar holding opts and progress
counters (global_step, best_val_loss, …) so resume restores the schedule —
the role of the reference's snapshot progress tensors
(setgan/training_loop.py:571-588).
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


_NPZ_MANIFEST = "sg3tpu_manifest.json"


def _serialize_structure(node, leaves: list):
    """Tree → JSON structure with {"__leaf__": i} placeholders.

    Mirrors orbax's restore conventions (namedtuples → field-name dicts,
    tuples → lists) so trees written by either backend restore through the
    same caller-side `tree_unflatten(live_structure, tree_leaves(...))`.
    """
    if node is None:
        return None
    if isinstance(node, tuple) and hasattr(node, "_fields"):
        return {k: _serialize_structure(getattr(node, k), leaves)
                for k in node._fields}
    if isinstance(node, dict):
        return {str(k): _serialize_structure(v, leaves)
                for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        return [_serialize_structure(v, leaves) for v in node]
    leaves.append(np.asarray(node))
    return {"__leaf__": len(leaves) - 1}


def _deserialize_structure(node, arrays):
    if node is None:
        return None
    if isinstance(node, dict):
        if set(node) == {"__leaf__"}:
            return arrays[f"l{node['__leaf__']}"]
        return {k: _deserialize_structure(v, arrays) for k, v in node.items()}
    if isinstance(node, list):
        return [_deserialize_structure(v, arrays) for v in node]
    raise ValueError(f"unexpected manifest node: {type(node)}")


def save_pytree(path, tree, metadata: Optional[dict] = None) -> None:
    """Save a pytree + optional JSON metadata sidecar.

    Single-process: orbax PyTree checkpoint. Multi-process: a
    collective-free npz+manifest directory — orbax's `Checkpointer.save`
    issues `sync_global_processes` barriers across ALL hosts, but our
    snapshots are rank-0-only host-local writes (reference: rank 0 writes,
    setgan/training_loop.py:548-588), so a lone rank-0 orbax save would
    rendezvous its barrier against whatever collective the other hosts run
    next (observed: name-mismatch abort against the shutdown barrier).
    `load_pytree` auto-detects the format.
    """
    path = Path(path).absolute()
    if path.exists():
        import shutil
        shutil.rmtree(path)
    if jax.process_count() > 1:
        path.mkdir(parents=True)
        leaves: list = []
        structure = _serialize_structure(_to_numpy(tree), leaves)
        np.savez(path / "arrays.npz",
                 **{f"l{i}": a for i, a in enumerate(leaves)})
        with open(path / _NPZ_MANIFEST, "w") as f:
            json.dump(structure, f)
    else:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(str(path), _to_numpy(tree))
    if metadata is not None:
        with open(str(path) + ".json", "w") as f:
            json.dump(metadata, f, indent=2, default=str)


def load_pytree(path) -> Tuple[Any, Optional[dict]]:
    """Load a pytree + its metadata sidecar (None if absent)."""
    path = Path(path).absolute()
    if (path / _NPZ_MANIFEST).exists():
        with open(path / _NPZ_MANIFEST) as f:
            structure = json.load(f)
        with np.load(path / "arrays.npz") as arrays:
            tree = _deserialize_structure(structure, arrays)
    else:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        tree = ckptr.restore(str(path))
    meta = None
    if os.path.exists(str(path) + ".json"):
        with open(str(path) + ".json") as f:
            meta = json.load(f)
    return tree, meta


def opts_to_dict(opts) -> dict:
    if dataclasses.is_dataclass(opts):
        return dataclasses.asdict(opts)
    return dict(opts)
