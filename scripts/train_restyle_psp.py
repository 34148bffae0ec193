"""Train a ReStyle-pSp encoder (CLI).

Parity: reference inversion/scripts/train_restyle_psp.py — dataclass options
→ Coach.train. Dataset roots come from the registry (configs.py) keyed by
--dataset_type, or explicit --train_root/--test_root overrides.
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path
from typing import Optional

sys.path.insert(0, str(Path(__file__).parent.parent))

from stylegan3_editing_tpu.configs import get_dataset_registry
from stylegan3_editing_tpu.data import BatchIterator, ImagesDataset, encode_transforms
from stylegan3_editing_tpu.models.sg3 import sg3_r_config
from stylegan3_editing_tpu.models.sg3.convert import load_torch_pt, npz_to_variables
from stylegan3_editing_tpu.training.coach import Coach
from stylegan3_editing_tpu.training.options import TrainOptions
from stylegan3_editing_tpu.utils.cli import parse_dataclass


@dataclasses.dataclass
class PspCliOptions(TrainOptions):
    train_root: Optional[str] = None
    test_root: Optional[str] = None


def build_coach(opts) -> Coach:
    overrides = {}
    if opts.decoder_channel_base:
        overrides["channel_base"] = opts.decoder_channel_base
    if opts.decoder_channel_max:
        overrides["channel_max"] = opts.decoder_channel_max
    if opts.decoder_num_layers:
        overrides["num_layers"] = opts.decoder_num_layers
    decoder_cfg = sg3_r_config(opts.output_size, **overrides)
    decoder_variables = None
    if opts.stylegan_weights:
        path = str(opts.stylegan_weights)
        if path.endswith(".npz"):
            decoder_variables = npz_to_variables(path)
        else:
            decoder_variables, _ = load_torch_pt(path, decoder_cfg)
    return Coach(opts, decoder_cfg=decoder_cfg,
                 decoder_variables=decoder_variables)


def build_data(opts):
    t = encode_transforms(seed=opts.seed)
    if opts.train_root:
        train_root = test_root = opts.train_root
        test_root = opts.test_root or train_root
    else:
        reg = get_dataset_registry()[opts.dataset_type]
        train_root, test_root = reg["train_target_root"], reg["test_target_root"]
    train_ds = ImagesDataset(train_root, train_root,
                             target_transform=t["transform_gt_train"])
    test_ds = ImagesDataset(test_root, test_root,
                            target_transform=t["transform_test"])
    train_iter = iter(BatchIterator(train_ds, opts.batch_size, seed=opts.seed))
    def val_batches():
        return BatchIterator(test_ds, opts.test_batch_size,
                             shuffle=False).epoch_batches(opts.max_val_batches)
    return train_iter, val_batches


def main(opts) -> Coach:
    from stylegan3_editing_tpu.parallel.multiprocess import (
        maybe_initialize_distributed)
    maybe_initialize_distributed()  # before first device use
    # Validate data roots before the (slow) model build/compile.
    train_iter, val_batches = build_data(opts)
    coach = build_coach(opts)
    if opts.checkpoint_path:
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
    main(parse_dataclass(PspCliOptions))
