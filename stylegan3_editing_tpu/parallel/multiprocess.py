"""Multi-process (multi-host) entry path.

TPU-native replacement for the reference's per-GPU process spawning +
NCCL file rendezvous (/root/reference/train_setgan.py:38-118): each host
runs the SAME single program; `jax.distributed.initialize` joins them into
one JAX runtime whose `jax.devices()` spans every host, and the pjit
partitioner inserts cross-host collectives.

Env-gated so single-process runs are untouched:

    SG3TPU_NUM_PROCESSES=2 SG3TPU_PROCESS_ID=0 \
    SG3TPU_COORDINATOR=host0:12355 python scripts/train_setgan.py ...

On Cloud TPU pods the three variables are auto-derived by JAX; calling
``maybe_initialize_distributed()`` with no env set is a no-op there only
if no coordinator is configured.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def maybe_initialize_distributed() -> bool:
    """Env-gated `jax.distributed.initialize`. Returns True when a
    multi-process runtime was started (call once, before first device use).

    Also honors JAX_PLATFORMS=cpu explicitly: this environment's axon TPU
    plugin silently OVERRIDES the env var, so a CLI asked to run on CPU
    (smoke tests, CI) would otherwise claim the single shared TPU chip.
    The config flag wins over the plugin (see tests/conftest.py).
    """
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized
    num = os.environ.get("SG3TPU_NUM_PROCESSES")
    if not num:
        return False
    jax.distributed.initialize(
        coordinator_address=os.environ.get("SG3TPU_COORDINATOR",
                                           "localhost:12355"),
        num_processes=int(num),
        process_id=int(os.environ.get("SG3TPU_PROCESS_ID", "0")),
    )
    return True


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    """True on the checkpoint-writing process (reference: rank 0 writes
    snapshots, setgan/training_loop.py:548-588)."""
    return jax.process_index() == 0


def put_global_batch(sharding, local_batch):
    """Per-process local numpy batch → one GLOBAL jax.Array.

    Single-process: plain device_put. Multi-process: each host contributes
    its local rows via `jax.make_array_from_process_local_data` (device_put
    cannot target non-addressable devices). The local batch is this host's
    shard of the global batch (reference data sharding: InfiniteSampler
    rank/num_replicas, torch_utils/misc.py:113-147)."""
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return jax.device_put(jnp.asarray(local_batch), sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_batch))
