"""Checkpoint conversion: reference torch state dicts → flax variables.

The reference ships weights in three formats (SURVEY.md §5 checkpoint/resume):
official `.pkl` (persistence-embedded classes), converted `.pt` state dicts,
and coach checkpoints. This module maps the `.pt`/state-dict naming
(models/stylegan3/networks_stylegan3.py parameter tree) 1:1 onto our
{'params', 'buffers', 'ema'} collections:

- FC weights keep the reference `[out, in]` layout (same equalized-LR
  convention: stored value = init/lr_multiplier, gains applied at runtime).
- Conv weights transpose OIHW → HWIO (NHWC framework layout).
- `synthesis.input.transform` is intentionally dropped: the user transform is
  a function argument here, not a buffer (it is returned separately so video
  tooling can reapply a stored transform).
- Unknown / missing keys raise, mirroring `load_state_dict(strict=True)`
  (models/stylegan3/model.py:59-65), with an opt-out.
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import SG3Config, build_synthesis_layout
from .generator import Generator


def _assign(tree: dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = jnp.asarray(value)


def torch_state_to_variables(
    state: Mapping[str, np.ndarray],
    cfg: SG3Config,
    strict: bool = True,
) -> Tuple[dict, Optional[np.ndarray]]:
    """Convert a reference generator state dict (name → numpy) to variables.

    Returns (variables, stored_transform). `state` values must already be
    numpy arrays (callers torch.load + `.numpy()` on their side, or use
    `load_torch_pt`).
    """
    layout = build_synthesis_layout(cfg)
    layer_names = {spec.name for spec in layout.layers}

    params: dict = {}
    buffers: dict = {}
    ema: dict = {}
    transform: Optional[np.ndarray] = None
    unmatched = []

    for name, value in state.items():
        v = np.asarray(value)
        parts = name.split(".")
        if name == "synthesis.input.transform":
            transform = v
            continue
        if parts[0] == "mapping":
            if parts[1] == "w_avg":
                _assign(ema, ("mapping", "w_avg"), v)
            elif re.fullmatch(r"fc\d+", parts[1]) or parts[1] == "embed":
                _assign(params, ("mapping", parts[1], parts[2]), v)
            else:
                unmatched.append(name)
        elif parts[0] == "synthesis" and parts[1] == "input":
            if parts[2] in ("freqs", "phases"):
                _assign(buffers, ("synthesis", "input", parts[2]), v)
            elif parts[2] == "weight":
                _assign(params, ("synthesis", "input", "weight"), v)
            elif parts[2] == "affine":
                _assign(params, ("synthesis", "input", "affine", parts[3]), v)
            else:
                unmatched.append(name)
        elif parts[0] == "synthesis" and parts[1] in layer_names:
            lname = parts[1]
            if parts[2] == "affine":
                _assign(params, ("synthesis", lname, "affine", parts[3]), v)
            elif parts[2] == "weight":
                # OIHW → HWIO.
                _assign(params, ("synthesis", lname, "weight"),
                        v.transpose(2, 3, 1, 0))
            elif parts[2] == "bias":
                _assign(params, ("synthesis", lname, "bias"), v)
            elif parts[2] == "magnitude_ema":
                _assign(ema, ("synthesis", lname, "magnitude_ema"), v)
            elif parts[2] in ("up_filter", "down_filter"):
                _assign(buffers, ("synthesis", lname, parts[2]), v)
            else:
                unmatched.append(name)
        else:
            unmatched.append(name)

    if strict and unmatched:
        raise ValueError(f"unmatched checkpoint keys: {unmatched[:10]}"
                         f"{'...' if len(unmatched) > 10 else ''}")

    variables = {"params": params, "buffers": buffers, "ema": ema}
    _validate_against_init(variables, cfg, strict=strict)
    return variables, transform


def _validate_against_init(variables: dict, cfg: SG3Config, strict: bool):
    """Shape-check the converted tree against a freshly initialized one."""
    model = Generator(cfg)
    ref_shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), jnp.zeros((1, cfg.z_dim)),
        jnp.zeros((1, cfg.c_dim)) if cfg.c_dim else None)

    ref_flat = dict(jax.tree_util.tree_flatten_with_path(ref_shapes)[0])
    got_flat = dict(jax.tree_util.tree_flatten_with_path(variables)[0])
    missing = [jax.tree_util.keystr(k) for k in ref_flat if k not in got_flat]
    extra = [jax.tree_util.keystr(k) for k in got_flat if k not in ref_flat]
    bad_shape = [
        (jax.tree_util.keystr(k), got_flat[k].shape, ref_flat[k].shape)
        for k in ref_flat
        if k in got_flat and tuple(got_flat[k].shape) != tuple(ref_flat[k].shape)
    ]
    problems = []
    if missing:
        problems.append(f"missing: {missing[:8]}")
    if extra:
        problems.append(f"unexpected: {extra[:8]}")
    if bad_shape:
        problems.append(f"shape mismatch: {bad_shape[:8]}")
    if problems and strict:
        raise ValueError("checkpoint does not match config: " + "; ".join(problems))


def load_torch_pt(path: str, cfg: SG3Config, strict: bool = True):
    """Load a reference `.pt` state-dict checkpoint (torch CPU required)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    np_state = {k: v.detach().cpu().numpy() for k, v in state.items()}
    return torch_state_to_variables(np_state, cfg, strict=strict)


def load_pkl(path: str, cfg: SG3Config, strict: bool = True):
    """Load an official SG3 `.pkl` (persistence-embedded classes).

    Fully standalone: the embedded class source is never executed and the
    reference checkout is not needed (see `persistence.py`). Legacy TF1
    pickles convert through the same entry point.
    """
    from .persistence import load_network_pkl, state_dict_of

    data = load_network_pkl(path)
    g_ema = data.get("G_ema", data.get("G"))
    assert g_ema is not None, "pickle holds no generator"
    return torch_state_to_variables(state_dict_of(g_ema), cfg, strict=strict)


def variables_to_npz(variables: dict, path: str):
    """Save converted variables as a flat .npz (framework-native archive)."""
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    arrays = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    np.savez(path, **arrays)


def npz_to_variables(path: str) -> dict:
    """Inverse of `variables_to_npz`."""
    arrays = np.load(path)
    tree: dict = {}
    for key, value in arrays.items():
        # keystr format: ['a']['b']['c']
        parts = re.findall(r"\['([^']+)'\]", key)
        _assign(tree, tuple(parts), value)
    return tree
