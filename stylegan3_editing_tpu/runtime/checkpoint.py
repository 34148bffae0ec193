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


def save_pytree(path, tree, metadata: Optional[dict] = None) -> None:
    """Save a pytree (orbax) + optional JSON metadata sidecar."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    if path.exists():
        import shutil
        shutil.rmtree(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(str(path), _to_numpy(tree))
    if metadata is not None:
        with open(str(path) + ".json", "w") as f:
            json.dump(metadata, f, indent=2, default=str)


def load_pytree(path) -> Tuple[Any, Optional[dict]]:
    """Load a pytree + its metadata sidecar (None if absent)."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
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
