"""Steady-state 1024² training step times on the TPU chip.

Publishes POST-COMPILE sec/step (VERDICT r2 #2) for:
  (a) one 1024² PTI step   — LPIPS-free L2 tuning step over synthesis
      params (reference hot loop: run_pti_images.py:130-143);
  (b) one 1024² ReStyle-coach encoder step — encoder backward through a
      1024² decode (reference coach_restyle_psp.py:91-112).

Timing: chained fori_loop + forced scalar transfer (block_until_ready is a
no-op under axon). Each step includes the full forward+backward+optimizer.

Usage: python scripts/bench_train_steps.py [--what pti|coach|both]
               [--iters 3] [--backward fused|composed]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sg3tpu_tpu_cache")

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax


def bench_pti(iters: int) -> float:
    from stylegan3_editing_tpu.models.sg3 import Generator, sg3_r_config

    cfg = sg3_r_config(1024)
    model = Generator(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, cfg.z_dim)))
    params = variables["params"]
    # PTI trains synthesis minus the Fourier input (run_pti_images.py:111).
    trainable = {"synthesis": {k: v for k, v in params["synthesis"].items()
                               if k != "input"}}
    frozen = {"mapping": params["mapping"],
              "synthesis": {"input": params["synthesis"]["input"]}}
    rest = {k: v for k, v in variables.items() if k != "params"}
    tx = optax.adam(3e-4)
    opt_state = tx.init(trainable)

    ws = jax.jit(lambda v, z: model.apply(v, z, method=model.map))(
        variables, jax.random.normal(jax.random.PRNGKey(1), (1, cfg.z_dim)))
    target = jnp.zeros((1, 1024, 1024, 3), jnp.float32)

    def merge(tr):
        syn = dict(tr["synthesis"])
        syn["input"] = frozen["synthesis"]["input"]
        return {"mapping": frozen["mapping"], "synthesis": syn}

    def loss_fn(tr):
        img = model.apply({**rest, "params": merge(tr)}, ws,
                          method=model.synthesize)
        return jnp.mean(jnp.square(img - target))

    def body(tr, opt_state, seed):
        def step(i, carry):
            tr, opt_state, acc = carry
            loss, grads = jax.value_and_grad(loss_fn)(tr)
            updates, opt_state = tx.update(grads, opt_state, tr)
            tr = optax.apply_updates(tr, updates)
            return tr, opt_state, acc + loss
        tr, opt_state, acc = lax.fori_loop(
            0, iters, step, (tr, opt_state, jnp.float32(seed) * 0))
        return acc

    run = jax.jit(body)
    t0 = time.perf_counter()
    float(run(trainable, opt_state, 0))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(trainable, opt_state, 1))
    per_step = (time.perf_counter() - t0) / iters
    print(f"PTI 1024^2: {per_step:.2f} s/step post-compile "
          f"(compile+first {compile_s:.0f} s, {iters} chained steps)")
    return per_step


def bench_coach(iters: int) -> float:
    """Encoder step: IR-SE encoder forward/backward + frozen 1024² decode."""
    from stylegan3_editing_tpu.models.encoders.backbones import (
        BackboneEncoder)
    from stylegan3_editing_tpu.models.sg3 import Generator, sg3_r_config

    cfg = sg3_r_config(1024)
    dec = Generator(cfg)
    dec_vars = jax.jit(dec.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, cfg.z_dim)))
    enc = BackboneEncoder(n_styles=cfg.num_ws)
    x6 = jnp.zeros((1, 256, 256, 6))
    enc_vars = jax.jit(enc.init)(jax.random.PRNGKey(1), x6)
    latent_avg = dec_vars["ema"]["mapping"]["w_avg"]
    tx = optax.adam(1e-4)
    opt_state = tx.init(enc_vars["params"])
    target = jnp.zeros((1, 1024, 1024, 3), jnp.float32)

    def loss_fn(ep, x):
        codes = enc.apply({**enc_vars, "params": ep}, x)
        codes = codes + latent_avg[None, None]
        img = dec.apply(dec_vars, codes, method=dec.synthesize)
        return jnp.mean(jnp.square(img - target))

    def body(ep, opt_state, seed):
        def step(i, carry):
            ep, opt_state, acc = carry
            x = jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(2), i), (1, 256, 256, 6))
            loss, grads = jax.value_and_grad(loss_fn)(ep, x)
            updates, opt_state = tx.update(grads, opt_state, ep)
            ep = optax.apply_updates(ep, updates)
            return ep, opt_state, acc + loss
        ep, opt_state, acc = lax.fori_loop(
            0, iters, step, (ep, opt_state, jnp.float32(seed) * 0))
        return acc

    run = jax.jit(body)
    t0 = time.perf_counter()
    float(run(enc_vars["params"], opt_state, 0))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(enc_vars["params"], opt_state, 1))
    per_step = (time.perf_counter() - t0) / iters
    print(f"coach-encoder 1024^2: {per_step:.2f} s/step post-compile "
          f"(compile+first {compile_s:.0f} s, {iters} chained steps)")
    return per_step


def bench_setgan(iters: int, batch: int = 4,
                 remat_features: bool = False,
                 remat_encoder: bool = False) -> float:
    """Full SetGAN G+D train step at the reference's canonical stem recipe.

    Reference scripts/train_setgan_stem.sh:35-66 trains the stylegan3-t stem
    at low res with cbase 16384 / cmax 256, batch 4/GPU, reference sets 4-7,
    candidates 1-4, DeiT-base-distilled + EfficientNet-lite0 projected D.
    This benches the per-chip shard of that recipe (batch 4 candidate sets,
    ref 7, cand 4, 256² decode) and reports post-compile sec/step and
    sec/kimg (the reference's tick metric, setgan/training_loop.py:499-513).
    """
    from stylegan3_editing_tpu.models.sg3 import sg3_t_config
    from stylegan3_editing_tpu.setgan.training_loop import (
        SetGANTrainConfig, SetGANTrainer)

    n_ref, n_cand = 7, 4
    # syn_layers 7 per the recipe (train_setgan_stem.sh:43) — the SG3Config
    # default of 14 layers doubles G (and its EMA + Adam copies) vs recipe.
    dec = sg3_t_config(256, channel_base=16384, channel_max=256,
                       num_layers=7)
    cfg = SetGANTrainConfig(batch_size=batch,
                            d_remat_features=remat_features,
                            g_remat_encoder=remat_encoder)
    trainer = SetGANTrainer(cfg, dec)
    rng = np.random.default_rng(0)
    def make_batch():
        return {
            "reference": rng.standard_normal(
                (batch, n_ref, 256, 256, 3)).astype(np.float32) * 0.1,
            "candidate": rng.standard_normal(
                (batch, n_cand, 256, 256, 3)).astype(np.float32) * 0.1,
            "ref_mask": np.ones((batch, n_ref), bool),
            "cand_mask": np.ones((batch, n_cand), bool),
        }
    # Chain the steps inside ONE jitted fori_loop (same pattern as
    # bench_pti/bench_coach): under the axon remote platform each discrete
    # executable call re-ships its arguments through the tunnel (measured:
    # 159 s/step discrete vs in-graph steady state), so the honest
    # steady-state number must keep params in the loop carry.
    b = {k: jnp.asarray(v) for k, v in make_batch().items()}
    blur_sigma = 2.0  # reference blur_init_sigma at nimg=0
    ada_p = jnp.asarray(0.0, jnp.float32)
    beta = jnp.asarray(0.5 ** (batch / 10_000.0))

    def one_step(i, carry):
        g_params, g_opt, d_params, d_opt, g_ema, pl_mean, acc = carry
        z = jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(5), i),
            (batch, n_cand, dec.z_dim))
        kd = jax.random.fold_in(jax.random.PRNGKey(6), i)
        kg = jax.random.fold_in(jax.random.PRNGKey(7), i)
        d_params, d_opt, d_stats = trainer._d_step_impl(
            d_params, d_opt, g_params, b, z, kd, ada_p,
            blur_sigma=blur_sigma)
        g_params, g_opt, g_stats, pl_mean = trainer._g_step_impl(
            g_params, g_opt, d_params, b, z, kg, pl_mean, ada_p,
            blur_sigma=blur_sigma, do_pl=False)
        g_ema = trainer._ema_impl(g_ema, g_params, beta)
        acc = acc + d_stats["Loss/D/loss"] + g_stats["Loss/G/loss"]
        return (g_params, g_opt, d_params, d_opt, g_ema, pl_mean, acc)

    def body(carry, seed):
        carry = (*carry[:-1], carry[-1] + jnp.float32(seed) * 0)
        return lax.fori_loop(0, iters, one_step, carry)[-1]

    carry0 = (trainer.g_vars["params"], trainer.g_opt,
              trainer.d_vars["params"], trainer.d_opt,
              trainer.g_ema_params, trainer.pl_mean, jnp.float32(0))
    run = jax.jit(body)
    t0 = time.perf_counter()
    float(run(carry0, 0))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(carry0, 1))
    per_step = (time.perf_counter() - t0) / iters
    imgs = batch * n_cand
    print(f"SetGAN stem 256^2 (b{batch} r{n_ref} c{n_cand}, DeiT+EffNet D): "
          f"{per_step:.2f} s/step post-compile = "
          f"{per_step / imgs * 1000:.1f} s/kimg "
          f"(compile+first {compile_s:.0f} s, {iters} chained steps)")
    return per_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="both",
                    choices=("pti", "coach", "both", "setgan"))
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--backward", default="fused",
                    choices=("fused", "composed"))
    ap.add_argument("--d_remat_features", action="store_true",
                    help="remat the frozen D feature trunks — the memory "
                         "lever for batch 4 on a 16GB chip")
    ap.add_argument("--g_remat_encoder", action="store_true",
                    help="remat the reference-set encoder trunk — the "
                         "measured batch-4 HBM floor (round-5g breakdown) "
                         "is its B*R x 256^2 IR-SE activations")
    ap.add_argument("--batch", type=int, default=2,
                    help="setgan candidate sets per step. Default 2 = the "
                         "largest that fit one 16GB v5e chip in round 4; "
                         "the canonical recipe is 4/GPU on 48GB A40s — "
                         "opt up explicitly on bigger chips")
    args = ap.parse_args()
    if args.backward == "composed":
        os.environ["SG3TPU_FLRELU_IMPL"] = "xla"
    if args.what in ("pti", "both"):
        bench_pti(args.iters)
    if args.what in ("coach", "both"):
        bench_coach(args.iters)
    if args.what == "setgan":
        bench_setgan(args.iters, args.batch,
                     remat_features=args.d_remat_features,
                     remat_encoder=args.g_remat_encoder)


if __name__ == "__main__":
    main()
