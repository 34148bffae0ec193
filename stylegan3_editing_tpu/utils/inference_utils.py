"""Inference helpers: rebuild a trained encoder from a checkpoint, run
iterative ReStyle inversion.

Parity: reference utils/inference_utils.py — `load_encoder` (:28, rebuild
opts from ckpt, optionally swap generator), `get_average_image` (:59),
`run_on_batch` (:67).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.encoders import RestyleNet
from ..models.encoders import restyle as _restyle
from ..models.sg3 import SG3Config, sg3_r_config
from ..runtime.checkpoint import load_pytree
from ..training.options import E4eTrainOptions, TrainOptions

get_average_image = _restyle.get_average_image
run_on_batch = _restyle.run_restyle_iterations


def load_encoder(checkpoint_path, generator_variables: Optional[dict] = None,
                 decoder_cfg: Optional[SG3Config] = None
                 ) -> Tuple[RestyleNet, dict, TrainOptions]:
    """Rebuild (model, variables, opts) from a coach checkpoint.

    `generator_variables` optionally swaps in a different (e.g. PTI-tuned)
    generator, mirroring inference_utils.py:40-47.
    """
    tree, meta = load_pytree(checkpoint_path)
    assert meta is not None and "opts" in meta, "checkpoint missing opts sidecar"
    opts_dict = dict(meta["opts"])
    opts_cls = E4eTrainOptions if meta.get("is_e4e") else TrainOptions
    field_names = {f.name for f in dataclasses.fields(opts_cls)}
    opts = opts_cls(**{k: v for k, v in opts_dict.items() if k in field_names})

    if decoder_cfg is None:
        overrides = {}
        if opts.decoder_channel_base:
            overrides["channel_base"] = opts.decoder_channel_base
        if opts.decoder_channel_max:
            overrides["channel_max"] = opts.decoder_channel_max
        if opts.decoder_num_layers:
            overrides["num_layers"] = opts.decoder_num_layers
        decoder_cfg = sg3_r_config(opts.output_size, **overrides)

    model = RestyleNet(decoder_cfg=decoder_cfg, encoder_type=opts.encoder_type,
                       n_styles=decoder_cfg.num_ws, input_nc=opts.input_nc)
    variables = jax.tree_util.tree_map(jnp.asarray, tree["variables"])
    if generator_variables is not None:
        for col in ("params", "buffers", "ema"):
            if col in generator_variables:
                variables[col] = dict(variables[col])
                variables[col]["decoder"] = generator_variables[col]
    return model, variables, opts
