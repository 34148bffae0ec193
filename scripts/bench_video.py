"""End-to-end video inversion+edit throughput on the TPU chip (frames/sec).

SURVEY §6 names "frames/sec video inversion+edit end-to-end" a north-star
metric (reference pipeline: inversion/video/inference_on_video.py — per-frame
ReStyle iterations + landmark-transform decode + InterFaceGAN edit render;
the reference records no number of its own, README.md:507 only cites
"~30 seconds per image" for an animation variant).

Measures, per frame batch, the device-side pipeline exactly as
`scripts/inference_on_video.py` runs it:
  3 ReStyle iterations (encoder 256² + batched aligned+unaligned 1024²
  decode) + 1 edited 1024² render from shifted codes.
Random-init weights (no pretrained assets in this env) — throughput is
weight-independent. bf16 flagship synthesis (the TPU default at ≥1024²).

Timing: chained fori_loop + forced scalar transfer (block_until_ready is a
no-op under axon). Usage: python scripts/bench_video.py [--batch 2 --iters 2]
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
from jax import lax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=2,
                    help="timed pipeline repetitions (chained)")
    ap.add_argument("--n_restyle", type=int, default=3)
    ap.add_argument("--dry", action="store_true",
                    help="trace-only (jax.eval_shape) — validates wiring "
                         "without device compute; for CPU CI")
    ap.add_argument("--stages", action="store_true",
                    help="also time the pipeline's stages separately "
                         "(encoder / single decode / dual decode) and print "
                         "the per-frame ms split")
    ap.add_argument("--split", action="store_true",
                    help="skip the one-program pipeline and report fps from "
                         "the stage sum — the shape production "
                         "(inference_on_video.py) actually runs (separate "
                         "jitted calls), and the only shape that fits HBM "
                         "past frame-batch 2 at 1024² (the single program "
                         "needs 19.35G at frame-batch 4 — measured round-5c)")
    ap.add_argument("--bf16-decode", action="store_true",
                    help="decode ReStyle iterations + edit render with the "
                         "generator's bf16 layers (VideoConfig.bf16_decode; "
                         "the reference protocol is force_fp32 — see "
                         "run_restyle_iterations docstring)")
    args = ap.parse_args()

    from stylegan3_editing_tpu.models.encoders.restyle import (
        RestyleNet, get_average_image, run_restyle_iterations)
    from stylegan3_editing_tpu.models.sg3 import sg3_r_config

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    if on_tpu:
        res_label, cfg = "1024²", sg3_r_config(1024)
    else:  # CPU smoke mode so the script is runnable anywhere
        res_label = "64² (CPU smoke)"
        cfg = sg3_r_config(64, channel_base=2048, channel_max=64,
                           num_layers=6, use_bf16=False)
    model = RestyleNet(decoder_cfg=cfg, n_styles=cfg.num_ws)
    x0 = jnp.zeros((args.batch, 256, 256, 3))
    # A fixed editing direction (InterFaceGAN-style linear shift in W).
    direction = jax.random.normal(jax.random.PRNGKey(1), (512,)) * 0.05
    lt = jnp.eye(3, dtype=jnp.float32)

    f32 = not args.bf16_decode

    def pipeline(variables, avg_image, latent_avg, x):
        results = run_restyle_iterations(
            model, variables, x, avg_image, latent_avg,
            n_iters=args.n_restyle, landmarks_transform=lt, resize=True,
            force_fp32=f32)
        _, unaligned, codes = results[-1]
        edited, _ = model.apply(
            variables, codes + direction[None, None], input_code=True,
            landmarks_transform=lt, return_aligned_and_unaligned=False,
            resize=False, force_fp32=f32, method=model.__call__)
        return unaligned, edited

    def body(variables, avg_image, latent_avg, seed):
        def step(i, acc):
            x = jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(2), i + seed),
                (args.batch, 256, 256, 3))
            unaligned, edited = pipeline(variables, avg_image, latent_avg, x)
            return (acc + jnp.sum(edited, dtype=jnp.float32)
                    + jnp.sum(unaligned, dtype=jnp.float32))
        return lax.fori_loop(0, args.iters, step, jnp.float32(0))

    if args.dry:  # fully abstract — no weight materialization or compute
        vars_abs = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.concatenate([x0, x0], axis=-1),
            latent_avg=jnp.zeros((512,)))
        avg_abs = jax.ShapeDtypeStruct((256, 256, 3), jnp.float32)
        lat_abs = jax.ShapeDtypeStruct((512,), jnp.float32)
        out = jax.eval_shape(body, vars_abs, avg_abs, lat_abs, 0)
        print(f"dry OK: pipeline traces, result {out.shape} {out.dtype}")
        return

    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.concatenate([x0, x0], axis=-1),
        latent_avg=jnp.zeros((512,)))
    avg_image, latent_avg = get_average_image(model, variables)
    # Weights must be jit ARGUMENTS: a closure-captured variables tree is
    # inlined into the HLO as constants, and the serialized program then
    # exceeds the axon remote-compile helper's request-size cap (HTTP 413).
    fps = None
    if not args.split:
        try:
            run = jax.jit(body)
            t0 = time.perf_counter()
            float(run(variables, avg_image, latent_avg, 0))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(run(variables, avg_image, latent_avg, 1))
            dt = time.perf_counter() - t0
            fps = args.batch * args.iters / dt
            print(f"video inversion+edit: {fps:.3f} frames/s "
                  f"({args.n_restyle} ReStyle iters + edit render at "
                  f"{res_label}, batch {args.batch}; compile+first "
                  f"{compile_s:.0f} s)", flush=True)
        except Exception as e:  # HBM OOM past frame-batch 2 → stage sum
            print(f"one-program pipeline failed ({type(e).__name__}: "
                  f"{str(e)[:200]}) — falling back to stage-sum timing",
                  flush=True)
            args.stages = True

    if args.stages or fps is None:
        # Per-stage timings (VERDICT r4 weak #5): where does a frame's time
        # go? Chained loops per stage; per-frame pipeline counts are
        # n ReStyle iters × (encode + dual decode) + 1 edit render.
        reps = max(args.iters * args.n_restyle, 2)

        def time_chained(fn, *fn_args):
            loop = jax.jit(lambda *a: lax.fori_loop(
                0, reps, lambda i, acc: acc + fn(i, *a), jnp.float32(0)))
            float(loop(*fn_args))  # compile
            t = time.perf_counter()
            float(loop(*fn_args))
            return (time.perf_counter() - t) / reps * 1e3  # ms/call

        x6 = jnp.zeros((args.batch, 256, 256, 6))

        def enc_call(i, v, avg, lat):
            codes = model.apply(v, x6 * (1 + 1e-6 * i), latent_avg=lat,
                                method=model.encode)
            return jnp.sum(codes, dtype=jnp.float32)

        codes0 = jnp.zeros((args.batch, cfg.num_ws, 512))

        def dec1_call(i, v):
            img, _ = model.apply(v, codes0 * (1 + 1e-6 * i),
                                 landmarks_transform=None, resize=False,
                                 force_fp32=f32, method=model.decode)
            return jnp.sum(img, dtype=jnp.float32)

        def dec2_call(i, v):
            img, un = model.apply(v, codes0 * (1 + 1e-6 * i),
                                  landmarks_transform=lt, resize=True,
                                  force_fp32=f32, method=model.decode)
            return jnp.sum(img, dtype=jnp.float32) + jnp.sum(
                un, dtype=jnp.float32)

        enc_ms = time_chained(enc_call, variables, avg_image, latent_avg)
        dec1_ms = time_chained(dec1_call, variables)
        dec2_ms = time_chained(dec2_call, variables)
        n = args.n_restyle
        acc = n * (enc_ms + dec2_ms) + dec1_ms
        print(f"stage split (ms per batch-{args.batch} call): "
              f"encoder256 {enc_ms:.1f} | dual-decode{res_label} "
              f"{dec2_ms:.1f} | single-decode/edit {dec1_ms:.1f}")
        if fps is None:
            fps = args.batch * 1e3 / acc
            print(f"video inversion+edit (split-program): {fps:.3f} "
                  f"frames/s ({n} ReStyle iters + edit render at "
                  f"{res_label}, batch {args.batch}, stage-sum "
                  f"{acc:.0f} ms)", flush=True)
        else:
            frame_ms = args.batch * 1e3 / fps
            print(f"per frame-batch: {n}x(enc+dual) + edit = {acc:.0f} ms "
                  f"vs measured pipeline {frame_ms:.0f}"
                  f" ms (residual = fusion/overhead)", flush=True)


if __name__ == "__main__":
    main()
