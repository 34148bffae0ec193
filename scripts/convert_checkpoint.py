#!/usr/bin/env python
"""Convert reference checkpoints to framework-native .npz archives.

One entry point for every artifact a krylea/stylegan3-editing user holds
(reference README download tables):

  SG3 generator pickles (official / TF1-legacy, --kind sg3, .pkl)
      via the standalone allowlist unpickler (models/sg3/persistence.py) —
      config auto-derived from the pickle's captured init_kwargs.
  SG3 .pt state dicts (landscapes etc., --kind sg3) — config from
      --preset/--res/--cfg overrides.
  ReStyle encoder checkpoints (--kind encoder, released restyle_{psp,e4e}
      weights or `encoder.*` subtrees of full-model checkpoints —
      setgan.py:138-141) — trunk family/depth/styles auto-detected.
  NVIDIA-convention SG2 stems (--kind sg2_stem) for SetGAN superres growth.
  timm/torch feature backbones (--kind backbone --name <registry name>).
  ImageNet class embeddings (--kind class_embedding,
      in_embeddings/*.pkl).

Output: <dst>.npz (flat keystr archive readable by
models/sg3/convert.npz_to_variables) + <dst>.json metadata.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def _detect_kind(src: str, state=None) -> str:
    if src.endswith(".pkl"):
        return "sg3"
    if state is not None:
        keys = list(state)
        if any(k.startswith(("input_layer.", "conv1.")) for k in keys) and \
                any(k.startswith("styles.") for k in keys):
            return "encoder"
        if any(k.startswith("synthesis.input.") for k in keys):
            return "sg3"
        if any(k.startswith("synthesis.b4.") for k in keys):
            return "sg2_stem"
    raise SystemExit("cannot auto-detect checkpoint kind; pass --kind")


def _load_torch_state(src: str):
    import torch

    ckpt = torch.load(src, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return {k: np.asarray(v) for k, v in ckpt.items()}


def _sg3_cfg(preset: str, res: int, overrides: dict):
    from stylegan3_editing_tpu.models.sg3.config import (sg3_r_config,
                                                         sg3_t_config)

    make = sg3_r_config if preset == "sg3-r" else sg3_t_config
    return make(res, use_bf16=False, **overrides)


_CFG_KEYS = ("z_dim", "c_dim", "w_dim", "img_channels", "channel_base",
             "channel_max", "num_layers", "num_critical", "conv_kernel",
             "filter_size", "use_radial_filters", "output_scale",
             "margin_size", "first_cutoff", "first_stopband",
             "last_stopband_rel", "magnitude_ema_beta")


def convert(src: str, dst: str, kind: str = "auto", preset: str = "sg3-r",
            res: int = 1024, name: str = "", entry: str = "G_ema",
            cfg_overrides: dict | None = None, strict: bool = True) -> dict:
    from stylegan3_editing_tpu.models.sg3.convert import variables_to_npz

    overrides = dict(cfg_overrides or {})
    meta: dict = {"src": src, "kind": kind}

    state = None
    if src.endswith((".pt", ".pth")):
        state = _load_torch_state(src)
    if kind == "auto":
        kind = _detect_kind(src, state)
        meta["kind"] = kind

    if kind == "sg3" and src.endswith(".pkl"):
        from stylegan3_editing_tpu.models.sg3.convert import (
            torch_state_to_variables)
        from stylegan3_editing_tpu.models.sg3.persistence import (
            load_network_pkl, state_dict_of)

        data = load_network_pkl(src)
        g = data.get(entry) or data.get("G_ema") or data.get("G")
        assert g is not None, f"pickle holds no {entry!r}/G_ema/G entry"
        init_kwargs = dict(getattr(g, "init_kwargs", {}) or {})
        # Captured constructor kwargs override the preset (official SG3
        # pickles carry the full synthesis config at the top level).
        for k in _CFG_KEYS:
            if k in init_kwargs and k not in overrides:
                overrides[k] = init_kwargs[k]
        res = int(init_kwargs.get("img_resolution", res))
        cfg = _sg3_cfg(preset, res, overrides)
        variables, transform = torch_state_to_variables(
            state_dict_of(g), cfg, strict=strict)
        meta["decoder_cfg"] = dataclasses.asdict(cfg)
        meta["transform"] = (np.asarray(transform).tolist()
                             if transform is not None else None)
    elif kind == "sg3":
        from stylegan3_editing_tpu.models.sg3.convert import (
            torch_state_to_variables)

        cfg = _sg3_cfg(preset, res, overrides)
        variables, transform = torch_state_to_variables(state, cfg,
                                                        strict=strict)
        meta["decoder_cfg"] = dataclasses.asdict(cfg)
        meta["transform"] = (np.asarray(transform).tolist()
                             if transform is not None else None)
    elif kind == "encoder":
        from stylegan3_editing_tpu.models.encoders import (
            convert_restyle_encoder_state, encoder_state_from_model_checkpoint)

        variables, info = convert_restyle_encoder_state(
            encoder_state_from_model_checkpoint(state))
        meta["encoder"] = info
    elif kind == "sg2_stem":
        from stylegan3_editing_tpu.models.sg2_stem import (SG2Config,
                                                           convert_sg2_state)

        cfg = SG2Config(img_resolution=res, use_bf16=False, **overrides)
        variables = convert_sg2_state(state, cfg)
        meta["decoder_cfg"] = dataclasses.asdict(cfg)
    elif kind == "backbone":
        from stylegan3_editing_tpu.models.backbones.registry import (
            convert_feature_network_state)

        assert name, "--kind backbone needs --name <registry name>"
        variables = convert_feature_network_state(name, state)
        meta["backbone"] = name
    elif kind == "class_embedding":
        from stylegan3_editing_tpu.models.sg3.superres import (
            load_class_embedding)

        emb = load_class_embedding(src)
        variables = {"class_embedding": np.asarray(emb)}
        meta["shape"] = list(np.asarray(emb).shape)
    else:
        raise SystemExit(f"unknown kind {kind!r}")

    dst = dst if dst.endswith(".npz") else dst + ".npz"
    variables_to_npz(variables, dst)
    with open(Path(dst).with_suffix(".json"), "w") as f:
        json.dump(meta, f, indent=2, default=str)
    print(f"wrote {dst} ({meta['kind']})")
    return meta


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--kind", default="auto",
                   choices=["auto", "sg3", "encoder", "sg2_stem",
                            "backbone", "class_embedding"])
    p.add_argument("--preset", default="sg3-r", choices=["sg3-r", "sg3-t"])
    p.add_argument("--res", type=int, default=1024)
    p.add_argument("--name", default="", help="backbone registry name")
    p.add_argument("--entry", default="G_ema", help="pickle entry to convert")
    p.add_argument("--cfg", default="", help="JSON config overrides")
    p.add_argument("--no-strict", action="store_true")
    a = p.parse_args(argv)
    convert(a.src, a.dst, kind=a.kind, preset=a.preset, res=a.res,
            name=a.name, entry=a.entry,
            cfg_overrides=json.loads(a.cfg) if a.cfg else None,
            strict=not a.no_strict)


if __name__ == "__main__":
    main()
