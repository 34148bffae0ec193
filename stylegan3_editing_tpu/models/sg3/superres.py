"""Progressive-growth ("superres") extension of the alias-free generator.

Parity: reference models/styleganxl/training/networks_stylegan3_resetting.py —
`SuperresGenerator` (:595-739): load a pretrained low-resolution stem, drop
its critically-sampled tail, append `head_layers` new alias-free layers up to
the target resolution (`compute_superres_filterparams` :704-735), and
`reinit_stem` (:680) to copy stem weights. Class conditioning =
`rand_embedding` (:126) mapped into the mapping network's c input.

TPU design: "growing" is config composition — a new SG3Config whose layer
schedule keeps the stem's sub-critical layers and appends a fresh geometric
tail; weights transfer by matching layer names/shapes across param trees.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import SG3Config, build_synthesis_layout


def superres_config(stem_cfg: SG3Config, super_res: int,
                    head_layers: int, **overrides) -> SG3Config:
    """Config for a generator grown from `stem_cfg` to `super_res`.

    The combined network has the stem's non-critical layers plus
    `head_layers + num_critical` new layers; the geometric cutoff schedule
    re-solves for the larger resolution (the reference recomputes filter
    params for head layers the same way, resetting.py:704-735).
    """
    assert super_res > stem_cfg.img_resolution
    stem_layers = stem_cfg.num_layers - stem_cfg.num_critical
    kwargs = dict(
        img_resolution=super_res,
        num_layers=stem_layers + head_layers + stem_cfg.num_critical,
        num_critical=stem_cfg.num_critical,
        channel_base=stem_cfg.channel_base,
        channel_max=stem_cfg.channel_max,
        conv_kernel=stem_cfg.conv_kernel,
        filter_size=stem_cfg.filter_size,
        use_radial_filters=stem_cfg.use_radial_filters,
        magnitude_ema_beta=stem_cfg.magnitude_ema_beta,
        output_scale=stem_cfg.output_scale,
        z_dim=stem_cfg.z_dim,
        c_dim=stem_cfg.c_dim,
        w_dim=stem_cfg.w_dim,
    )
    kwargs.update(overrides)
    return SG3Config(**kwargs)


def head_layer_names(cfg: SG3Config, stem_cfg: SG3Config) -> Tuple[str, ...]:
    """Names of the newly added (trainable) head layers."""
    layout = build_synthesis_layout(cfg)
    stem_count = stem_cfg.num_layers - stem_cfg.num_critical
    return tuple(spec.name for spec in layout.layers[stem_count:])


def reinit_stem(variables: dict, stem_variables: dict,
                verbose: bool = False) -> dict:
    """Copy stem weights into a grown model's tree (matching name+shape).

    Parity: `SuperresGenerator.reinit_stem` + `copy_params_and_buffers`
    (resetting.py:680; require_all=False semantics — anything that doesn't
    match keeps its fresh init).
    """
    out = jax.tree_util.tree_map(lambda v: v, variables)  # shallow copy tree

    def merge(dst: dict, src: dict, path=""):
        for key, sval in src.items():
            if key not in dst:
                continue
            dval = dst[key]
            if isinstance(sval, dict) and isinstance(dval, dict):
                merge(dval, sval, f"{path}/{key}")
            elif hasattr(sval, "shape") and hasattr(dval, "shape"):
                if tuple(sval.shape) == tuple(dval.shape):
                    dst[key] = jnp.asarray(sval)
                elif verbose:
                    print(f"skip {path}/{key}: {sval.shape} vs {dval.shape}")

    for col in ("params", "buffers", "ema", "batch_stats"):
        if col in stem_variables and col in out:
            merge(out[col], stem_variables[col], col)
    return out


def class_embedding_init(num_classes: int, c_dim: int, seed: int = 0
                         ) -> np.ndarray:
    """Random (frozen) class embedding table (XL `rand_embedding`,
    resetting.py:126): class one-hots → embedding rows fed as mapping `c`."""
    rng = np.random.RandomState(seed)
    return rng.randn(num_classes, c_dim).astype(np.float32)


def load_class_embedding(path) -> np.ndarray:
    """Pretrained ImageNet class-embedding table from the reference's
    `in_embeddings/*.pkl` assets (a pickled `nn.Embedding`, loaded by
    networks_stylegan3_resetting.py:134-137 and
    pg_modules/discriminator.py:95-106, `{'embed': Embedding}`). Read with
    the standalone allowlist unpickler — no torch class is instantiated.
    Returns [num_classes, embed_dim] float32."""
    from .persistence import _StandaloneUnpickler

    with open(path, "rb") as f:
        data = _StandaloneUnpickler(f).load()
    weight = data["embed"].state_dict()["weight"]
    return np.asarray(weight, dtype=np.float32)
