"""Runtime infrastructure: checkpointing, stats collection, logging, config.

TPU-native replacement for the reference's dnnlib/torch_utils runtime layer
(SURVEY.md §2c): EasyDict/Logger/reflection, training-stats with collective
sync, orbax checkpoints with progress state.
"""

from .util import EasyDict, Logger, construct_class_by_name, format_time
from .checkpoint import save_pytree, load_pytree
from .training_stats import StatsCollector

__all__ = ["EasyDict", "Logger", "construct_class_by_name", "format_time",
           "save_pytree", "load_pytree", "StatsCollector"]
