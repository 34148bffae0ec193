"""Train a ReStyle-e4e encoder (CLI).

Parity: reference inversion/scripts/train_restyle_e4e.py — e4e options
(latent discriminator, delta reg, progressive stages) + resume support.
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).parent.parent))

from stylegan3_editing_tpu.training.options import E4eTrainOptions
from stylegan3_editing_tpu.utils.cli import parse_dataclass

from train_restyle_psp import build_coach, build_data  # noqa: E402


@dataclasses.dataclass
class E4eCliOptions(E4eTrainOptions):
    train_root: Optional[str] = None
    test_root: Optional[str] = None
    resume_training_from_ckpt: Optional[str] = None


def main(opts):
    from stylegan3_editing_tpu.parallel.multiprocess import (
        maybe_initialize_distributed)
    maybe_initialize_distributed()  # before first device use
    # Validate data roots before the (slow) model build/compile.
    train_iter, val_batches = build_data(opts)
    coach = build_coach(opts)
    if opts.resume_training_from_ckpt:
        coach.restore(opts.resume_training_from_ckpt)
    elif opts.checkpoint_path:
        coach.restore(opts.checkpoint_path)
    from stylegan3_editing_tpu.runtime.profiling import (
        maybe_start_trace, stop_trace)
    maybe_start_trace()  # SG3TPU_TRACE_DIR-gated jax.profiler capture
    try:
        coach.train(train_iter, val_batches_fn=val_batches)
    finally:
        trace_dir = stop_trace()
        if trace_dir:
            print(f"profiler trace written to {trace_dir}")
    coach.checkpoint(Path(opts.exp_dir) / "checkpoints" / "final_model")
    print(f"done: {coach.global_step} steps, best_val_loss={coach.best_val_loss}")
    return coach


if __name__ == "__main__":
    main(parse_dataclass(E4eCliOptions))
