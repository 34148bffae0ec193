"""Device-mesh parallelism: sharding rules and collectives-by-construction.

TPU-native replacement for the reference's torch.distributed/NCCL backend
(/root/reference/train_setgan.py:38-58, setgan/training_loop.py:278-455):
single-program pjit over a `jax.sharding.Mesh`; gradient all-reduce, param
broadcast, and stat syncs all become XLA collectives inserted by the
partitioner.
"""

from .mesh import create_mesh, batch_sharding, replicated, shard_params

__all__ = ["create_mesh", "batch_sharding", "replicated", "shard_params"]
