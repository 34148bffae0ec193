"""Pretrained ReStyle encoder checkpoint converter.

Maps the reference's released encoder state dicts — pSp/e4e over an IR(-SE)
trunk (restyle_e4e_encoders.ProgressiveBackboneEncoder :31-88,
restyle_psp_encoders.BackboneEncoder :10-50) or the ResNet-34 trunk variants
(:91-148 / :53-93) — onto the flax encoders in `backbones.py`, so reference
checkpoints (`--encoder_ckpt`, ReStyle releases, SetGAN full-model
checkpoints' `encoder.*` subtrees) drop in.

Plain and progressive variants share one parameter tree (the progressive
schedule is runtime behavior, not architecture), so the converted variables
load into any of the four encoder classes.
"""

from __future__ import annotations

from typing import Mapping, Tuple

import numpy as np

from ..backbones.common import bn_from_torch, conv_w, put
from ..backbones.irse import get_blocks
from ..backbones.resnet import RESNET34_LAYERS, convert_resnet34_body_state

# body block-count → IR depth (helpers.get_blocks: 3+4+14+3 etc.).
_IR_DEPTH_BY_BLOCKS = {24: 50, 49: 100, 50: 152}


def _style_count(state: Mapping[str, np.ndarray]) -> int:
    idx = {int(k.split(".")[1]) for k in state if k.startswith("styles.")}
    assert idx, "no styles.* heads in the encoder state dict"
    assert idx == set(range(max(idx) + 1)), f"non-contiguous style heads {idx}"
    return max(idx) + 1


def _convert_styles(state, params) -> int:
    n_styles = _style_count(state)
    for j in range(n_styles):
        k = 0
        while f"styles.{j}.convs.{2 * k}.weight" in state:
            put(params, f"style_{j}/conv{k}/kernel",
                conv_w(state[f"styles.{j}.convs.{2 * k}.weight"]))
            put(params, f"style_{j}/conv{k}/bias",
                state[f"styles.{j}.convs.{2 * k}.bias"])
            k += 1
        assert k > 0, f"style head {j} has no convs"
        # EqualLinear(lr_mul=1) ≡ FullyConnected: [out, in] weight, 1:1 map.
        put(params, f"style_{j}/linear/weight", state[f"styles.{j}.linear.weight"])
        put(params, f"style_{j}/linear/bias", state[f"styles.{j}.linear.bias"])
    return n_styles


def convert_restyle_encoder_state(
        state: Mapping[str, np.ndarray]) -> Tuple[dict, dict]:
    """torch ReStyle encoder state dict → (flax variables, info).

    Trunk family, IR depth, IR vs IR-SE, and style count are detected from
    the keys. Returns variables with 'params' and 'batch_stats' collections
    matching `{Progressive,}BackboneEncoder` / `ResNet{Progressive,}
    BackboneEncoder` init trees, and an info dict
    {trunk, n_styles[, num_layers, mode]} for constructing the module.
    """
    state = {k: np.asarray(v) for k, v in state.items()}
    params: dict = {}
    stats: dict = {}

    if "input_layer.0.weight" in state:  # IR(-SE) trunk
        n_body = len({int(k.split(".")[1]) for k in state
                      if k.startswith("body.")})
        num_layers = _IR_DEPTH_BY_BLOCKS.get(n_body)
        assert num_layers is not None, f"unrecognized IR body size {n_body}"
        mode = ("ir_se" if "body.0.res_layer.5.fc1.weight" in state else "ir")

        trunk_p: dict = {}
        trunk_s: dict = {}
        put(trunk_p, "input_conv/kernel", conv_w(state["input_layer.0.weight"]))
        bn_from_torch(trunk_p, trunk_s, "input_bn", state, "input_layer.1")
        put(trunk_p, "input_prelu/alpha", state["input_layer.2.weight"])
        idx = 0
        for stage in get_blocks(num_layers):
            for spec in stage:
                t, o = f"body.{idx}", f"body_{idx}"
                if spec.in_channel != spec.depth:
                    put(trunk_p, f"{o}/shortcut_conv/kernel",
                        conv_w(state[f"{t}.shortcut_layer.0.weight"]))
                    bn_from_torch(trunk_p, trunk_s, f"{o}/shortcut_bn",
                                  state, f"{t}.shortcut_layer.1")
                bn_from_torch(trunk_p, trunk_s, f"{o}/bn1", state,
                              f"{t}.res_layer.0")
                put(trunk_p, f"{o}/conv1/kernel",
                    conv_w(state[f"{t}.res_layer.1.weight"]))
                put(trunk_p, f"{o}/prelu/alpha", state[f"{t}.res_layer.2.weight"])
                put(trunk_p, f"{o}/conv2/kernel",
                    conv_w(state[f"{t}.res_layer.3.weight"]))
                bn_from_torch(trunk_p, trunk_s, f"{o}/bn2", state,
                              f"{t}.res_layer.4")
                if mode == "ir_se":
                    put(trunk_p, f"{o}/se/fc1/kernel",
                        conv_w(state[f"{t}.res_layer.5.fc1.weight"]))
                    put(trunk_p, f"{o}/se/fc2/kernel",
                        conv_w(state[f"{t}.res_layer.5.fc2.weight"]))
                idx += 1
        info = {"trunk": "irse", "num_layers": num_layers, "mode": mode}
    elif "conv1.weight" in state:  # ResNet-34 trunk
        trunk_p = {}
        trunk_s = {}
        put(trunk_p, "conv1/kernel", conv_w(state["conv1.weight"]))
        bn_from_torch(trunk_p, trunk_s, "bn1", state, "bn1")
        put(trunk_p, "relu/alpha", state["relu.weight"])
        # Flat Sequential indices → torchvision layerN.M naming, then reuse
        # the resnet34 body converter.
        body_state = {}
        flat = 0
        for stage_i, (blocks, _) in enumerate(RESNET34_LAYERS, start=1):
            for block_i in range(blocks):
                pfx = f"body.{flat}."
                for k, v in state.items():
                    if k.startswith(pfx):
                        body_state[f"layer{stage_i}.{block_i}.{k[len(pfx):]}"] = v
                flat += 1
        body_vars = convert_resnet34_body_state(body_state)
        trunk_p["body"] = body_vars["params"]
        trunk_s["body"] = body_vars["batch_stats"]
        info = {"trunk": "resnet34"}
    else:
        raise ValueError("state dict is neither an IR(-SE) nor a ResNet "
                         "ReStyle encoder (no input_layer.0 / conv1 keys)")

    params["trunk"] = trunk_p
    stats["trunk"] = trunk_s
    info["n_styles"] = _convert_styles(state, params)
    return {"params": params, "batch_stats": stats}, info


def encoder_state_from_model_checkpoint(
        ckpt: Mapping[str, np.ndarray],
        prefix: str = "encoder.") -> Mapping[str, np.ndarray]:
    """Slice an encoder sub-state out of a full-model checkpoint
    (reference SetGAN._get_keys, models/setgan/setgan.py:272-278)."""
    if "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    out = {k[len(prefix):]: v for k, v in ckpt.items()
           if k.startswith(prefix)}
    return out if out else ckpt
