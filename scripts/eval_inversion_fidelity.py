"""One-command inversion-fidelity harness (BASELINE bar: <0.5 LPIPS delta).

Runs N ReStyle inversions through BOTH this framework and the reference's
pure-torch path (`impl='ref'` ops on CPU) with IDENTICAL weights and prints
one JSON line:

  lpips_ours          LPIPS(recon_ours, target), mean over images
  lpips_ref           LPIPS(recon_ref,  target), mean over images
  lpips_delta         |lpips_ours - lpips_ref|  ← the BASELINE <0.5 bar
  recon_max_abs_diff  max |recon_ours - recon_ref| (exactness diagnostic)

Weights-gated: with released checkpoints (--encoder_ckpt, --generator_ckpt,
--lpips_heads + backbone weights) this produces the real fidelity number.
Without them it random-initializes the reference torch modules, converts
those SAME weights into this framework, and the expectation is exact parity
(delta ≈ 0) — which is what tests/test_editing.py::test_inversion_fidelity
checks end-to-end.

Reference parity anchors: the inversion loop mirrors
inversion/scripts/inference_iterative.py:70-101 +
utils/inference_utils.py:67-111 (run_on_batch) + e4e3.py:45-87 (forward,
residual-vs-latent_avg, identity transform, 256² face pool); the LPIPS
comparison mirrors inversion/scripts/calc_losses_on_images.py:40-112.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

REF = "/root/reference"


# ---------------------------------------------------------------- reference

def _load_reference_modules():
    """Import the reference encoder + SG3 generator with torchvision and the
    rosinality CUDA-op module stubbed (models/stylegan2/op JIT-compiles a
    CUDA extension at import; nothing on this path executes it)."""
    import torch

    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        import torchvision  # noqa: F401 — real install wins (ResNet paths)
    except ImportError:
        # Stub only when torchvision is genuinely absent. The stub's
        # resnet34 raises (instead of returning None) so a ResNet encoder
        # type fails loudly up front, not with a confusing downstream error.
        def _no_torchvision(*a, **k):
            raise ImportError(
                "torchvision is not installed — ResNet* encoder types need "
                "it; use a BackboneEncoder type or install torchvision")

        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvm.resnet34 = _no_torchvision
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
    if "models.stylegan2.op" not in sys.modules:
        op = types.ModuleType("models.stylegan2.op")
        op.FusedLeakyReLU = torch.nn.LeakyReLU
        op.fused_leaky_relu = lambda *a, **k: None
        op.upfirdn2d = lambda *a, **k: None
        sys.modules["models.stylegan2.op"] = op
    from models.setgan.encoder.encoders import restyle_e4e_encoders
    from models.stylegan3.networks_stylegan3 import Generator as TorchGenerator
    return torch, restyle_e4e_encoders, TorchGenerator


def _ref_invert(torch, encoder, generator, targets_nchw, latent_avg,
                avg_image, n_iters):
    """Reference ReStyle loop in torch (run_on_batch semantics,
    utils/inference_utils.py:67-111; forward = e4e3.py:45-87)."""
    n = targets_nchw.shape[0]
    face_pool = torch.nn.AdaptiveAvgPool2d((256, 256))
    y_hat = avg_image.unsqueeze(0).repeat(n, 1, 1, 1)
    latent = None
    with torch.no_grad():
        for it in range(n_iters):
            x_input = torch.cat([targets_nchw, y_hat], dim=1)
            codes = encoder(x_input)
            if latent is not None:
                codes = codes + latent
            else:
                codes = codes + latent_avg.repeat(codes.shape[0], 1, 1)
            generator.synthesis.input.transform = (
                torch.eye(3).unsqueeze(0).repeat(n, 1, 1).float())
            images = generator.synthesis(codes, noise_mode="const",
                                         force_fp32=True)
            y_hat = face_pool(images)
            latent = codes
    return y_hat.numpy(), latent.numpy()


# --------------------------------------------------------------------- main

def main():
    ap = argparse.ArgumentParser(
        description="Inversion fidelity: this framework vs the reference "
                    "torch path, LPIPS delta vs the <0.5 BASELINE bar.")
    ap.add_argument("--encoder_ckpt", default=None,
                    help=".pt ReStyle encoder (released format); default: "
                         "random-init reference encoder (exact-parity mode)")
    ap.add_argument("--generator_ckpt", default=None,
                    help="SG3 generator .pt state dict; default: random-init")
    ap.add_argument("--lpips_heads", default=None,
                    help="richzhang linear-head .pt for LPIPS(alex); default: "
                         "uniform heads (delta still well-defined)")
    ap.add_argument("--data", default=None,
                    help="folder of target images; default: synthesize "
                         "targets from the generator itself")
    ap.add_argument("--num", type=int, default=4)
    ap.add_argument("--n_iters", type=int, default=3)
    ap.add_argument("--resolution", type=int, default=1024)
    ap.add_argument("--channel_base", type=int, default=None)
    ap.add_argument("--channel_max", type=int, default=None)
    ap.add_argument("--num_layers", type=int, default=None)
    ap.add_argument("--encoder_type", default="ProgressiveBackboneEncoder")
    ap.add_argument("--encoder_depth", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None, help="also write the JSON here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # The axon TPU plugin overrides JAX_PLATFORMS=cpu; honor it explicitly
    # so CI runs never claim the shared TPU chip.
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass

    torch, ref_enc_mod, TorchGenerator = _load_reference_modules()
    torch.manual_seed(args.seed)

    from stylegan3_editing_tpu.criteria import LPIPS
    from stylegan3_editing_tpu.criteria.lpips import convert_lpips_linear_state
    from stylegan3_editing_tpu.models.encoders import (
        RestyleNet, get_average_image, run_restyle_iterations)
    from stylegan3_editing_tpu.models.encoders.convert import (
        convert_restyle_encoder_state)
    from stylegan3_editing_tpu.models.sg3 import sg3_r_config
    from stylegan3_editing_tpu.models.sg3.convert import (
        torch_state_to_variables)
    from stylegan3_editing_tpu.ops.image import adaptive_avg_pool2d

    overrides = {k: v for k, v in (("channel_base", args.channel_base),
                                   ("channel_max", args.channel_max),
                                   ("num_layers", args.num_layers))
                 if v is not None}
    cfg = sg3_r_config(args.resolution, use_bf16=False, **overrides)
    n_styles = cfg.num_ws

    # --- reference torch modules (shared weight source) ------------------
    tgen = TorchGenerator(
        z_dim=cfg.z_dim, c_dim=0, w_dim=cfg.w_dim,
        img_resolution=cfg.img_resolution, img_channels=cfg.img_channels,
        channel_base=cfg.channel_base, channel_max=cfg.channel_max,
        num_layers=cfg.num_layers, num_critical=cfg.num_critical,
        conv_kernel=cfg.conv_kernel,
        use_radial_filters=cfg.use_radial_filters,
        output_scale=cfg.output_scale,
        magnitude_ema_beta=cfg.magnitude_ema_beta).eval()
    if args.generator_ckpt:
        state = torch.load(args.generator_ckpt, map_location="cpu",
                           weights_only=True)
        state = state.get("g_ema", state.get("state_dict", state))
        tgen.load_state_dict(state)

    mode = "ir_se"
    tenc = ref_enc_mod.ProgressiveBackboneEncoder(
        args.encoder_depth, mode, n_styles=n_styles, input_nc=6).eval()
    if args.encoder_ckpt:
        from stylegan3_editing_tpu.models.encoders.convert import (
            encoder_state_from_model_checkpoint)
        ckpt = torch.load(args.encoder_ckpt, map_location="cpu",
                          weights_only=True)
        enc_state_np = encoder_state_from_model_checkpoint(ckpt)
        tenc.load_state_dict({k: torch.as_tensor(np.asarray(v))
                              for k, v in enc_state_np.items()})

    gen_state = {k: v.detach().numpy() for k, v in tgen.state_dict().items()}
    enc_state = {k: v.detach().numpy() for k, v in tenc.state_dict().items()}

    # --- this framework, SAME weights ------------------------------------
    gen_vars, _transform = torch_state_to_variables(gen_state, cfg)
    enc_vars, info = convert_restyle_encoder_state(enc_state)
    assert info["n_styles"] == n_styles, (info, n_styles)

    model = RestyleNet(decoder_cfg=cfg, encoder_type=args.encoder_type,
                       n_styles=n_styles, input_nc=6)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, 256, 256, 6)),
        latent_avg=jnp.zeros((cfg.w_dim,)))
    variables = jax.device_get(variables)
    for col in ("params", "buffers", "ema"):
        if col in gen_vars:
            variables.setdefault(col, {})
            variables[col] = dict(variables[col])
            variables[col]["decoder"] = gen_vars[col]
    for col, sub in enc_vars.items():
        variables[col] = dict(variables.get(col, {}))
        variables[col]["encoder"] = sub

    avg_image, latent_avg = get_average_image(model, variables)

    # --- targets ----------------------------------------------------------
    if args.data:
        from PIL import Image
        paths = [p for p in sorted(Path(args.data).rglob("*"))
                 if p.is_file() and p.suffix.lower() in
                 {".png", ".jpg", ".jpeg"}][: args.num]
        imgs = []
        for p in paths:
            im = Image.open(p).convert("RGB").resize((256, 256))
            imgs.append(np.asarray(im, np.float32) / 127.5 - 1.0)
        targets = np.stack(imgs)  # NHWC in [-1, 1]
    else:
        from stylegan3_editing_tpu.models.sg3 import Generator
        g = Generator(cfg)
        z = jax.random.normal(jax.random.PRNGKey(args.seed + 1),
                              (args.num, cfg.z_dim))
        full = g.apply(gen_vars, z, truncation_psi=0.7)
        targets = np.asarray(adaptive_avg_pool2d(full, 256), np.float32)

    # --- invert through both pipelines ------------------------------------
    results = run_restyle_iterations(
        model, variables, jnp.asarray(targets), avg_image, latent_avg,
        n_iters=args.n_iters)
    recon_ours = np.asarray(results[-1][0])  # final aligned, 256² NHWC

    t_latent_avg = torch.as_tensor(np.asarray(latent_avg))
    t_avg_image = torch.as_tensor(
        np.asarray(avg_image).transpose(2, 0, 1))
    targets_nchw = torch.as_tensor(targets.transpose(0, 3, 1, 2))
    recon_ref_nchw, _lat = _ref_invert(
        torch, tenc, tgen, targets_nchw, t_latent_avg, t_avg_image,
        args.n_iters)
    recon_ref = recon_ref_nchw.transpose(0, 2, 3, 1)

    # --- LPIPS vs target through the same criterion ------------------------
    lpips = LPIPS(net_type="alex")
    lp_vars = lpips.init(jax.random.PRNGKey(2), jnp.zeros((1, 256, 256, 3)),
                         jnp.zeros((1, 256, 256, 3)))
    if args.lpips_heads:
        heads = torch.load(args.lpips_heads, map_location="cpu",
                           weights_only=True)
        lp_vars = dict(lp_vars)
        lp_vars["params"] = {
            **dict(lp_vars["params"]),
            **convert_lpips_linear_state(
                {k: v.numpy() for k, v in heads.items()})}

    def lpips_mean(recon):
        per = [float(lpips.apply(lp_vars, jnp.asarray(recon[i:i + 1]),
                                 jnp.asarray(targets[i:i + 1])))
               for i in range(recon.shape[0])]
        return float(np.mean(per))

    lp_ours = lpips_mean(recon_ours)
    lp_ref = lpips_mean(recon_ref)
    record = {
        "metric": "inversion_fidelity_lpips_delta",
        "lpips_ours": round(lp_ours, 6),
        "lpips_ref": round(lp_ref, 6),
        "lpips_delta": round(abs(lp_ours - lp_ref), 6),
        "bar": 0.5,
        "pass": abs(lp_ours - lp_ref) < 0.5,
        "recon_max_abs_diff": round(
            float(np.max(np.abs(recon_ours - recon_ref))), 6),
        "num_images": int(targets.shape[0]),
        "n_iters": args.n_iters,
        "resolution": args.resolution,
        "weights": {"encoder": bool(args.encoder_ckpt),
                    "generator": bool(args.generator_ckpt),
                    "lpips_heads": bool(args.lpips_heads)},
    }
    line = json.dumps(record)
    print(line)
    if args.out:
        Path(args.out).write_text(line)
    return record


if __name__ == "__main__":
    main()
