"""Benchmark: flagship SG3-R 1024² synthesis throughput on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no quantitative baseline (BASELINE.md), so
vs_baseline is null until a reference-hardware number exists.

Timing note: under the axon remote platform `block_until_ready()` does not
actually wait, so iterations run CHAINED inside one jitted fori_loop and a
scalar reduction forces completion — wall time is honest end-to-end compute.
"""

from __future__ import annotations

import json
import os
import time

# Default path: the fused one-kernel Pallas filtered_lrelu on every layer
# (ops/pallas_flrelu.py) — measured fastest end-to-end (BASELINE.md).
os.environ.setdefault("SG3TPU_FLRELU_IMPL", "fused")
# Pallas kernels compile slowly through this env's remote-compile tunnel
# (~1-4 min each); a persistent cache keeps repeat runs honest-fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sg3tpu_tpu_cache")

import jax
import jax.numpy as jnp
from jax import lax


def _tpu_available(timeout_s: float = 180.0) -> bool:
    """Probe TPU backend init in a SUBPROCESS with a hard timeout.

    The axon tunnel can wedge (a killed client's server-side compile blocks
    every subsequent backend init — see the verify skill's gotchas); probing
    in-process would hang this bench forever. On probe failure the bench
    falls back to the clearly-labeled CPU smoke mode instead of hanging."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, sys; sys.exit(0 if any(d.platform == 'tpu' "
             "for d in jax.devices()) else 1)"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except Exception:
        return False


def main():
    from stylegan3_editing_tpu.models.sg3 import Generator, sg3_r_config

    on_tpu = _tpu_available()
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")  # env var alone is ignored
    if on_tpu:
        res, batch, iters = 1024, int(os.environ.get("SG3TPU_BENCH_BATCH", "8")), 10
        cfg = sg3_r_config(res)
    else:  # CPU smoke mode (slim channels) so the bench is runnable anywhere
        res, batch, iters = 64, 1, 2
        cfg = sg3_r_config(res, channel_base=2048, channel_max=64,
                           num_layers=6, use_bf16=False)

    model = Generator(cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, cfg.z_dim), jnp.float32))

    def body(_):
        def step(i, acc):
            z = jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(1), i),
                (batch, cfg.z_dim))
            img = model.apply(variables, z, truncation_psi=0.7)
            return acc + jnp.sum(img, dtype=jnp.float32)
        return lax.fori_loop(0, iters, step, 0.0)

    run = jax.jit(body)
    float(run(0))  # compile + warm
    t0 = time.perf_counter()
    float(run(1))
    dt = time.perf_counter() - t0

    images_per_sec = batch * iters / dt
    record = {
        "metric": f"sg3_r_{res}x{res}_synthesis_throughput",
        "value": round(images_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": None,
    }
    if on_tpu:
        # Distance to the measured VPU roofline for this op mix on one v5e
        # chip (~13 img/s — BASELINE.md round-2 analysis: ~240 Gflop of
        # up-grid work per batch-2 step at the measured ~1.6 Tflop/s VPU
        # MAC-sweep throughput). Tracked so every round's BENCH artifact
        # shows distance-to-ceiling, not just a number (VERDICT r4 #7).
        record["roofline_img_s"] = 13.0
        record["roofline_frac"] = round(images_per_sec / 13.0, 4)
    if not on_tpu:
        record["note"] = (
            "TPU tunnel unavailable (backend init probe timed out) — this is "
            "the CPU smoke fallback at 64², NOT the flagship metric. Last "
            "real-chip measurement: 8.3115 img/s/chip, SG3-R 1024², batch 8, "
            "auto engines (MXU down-pass on up=2 layers), 2026-08-19 "
            "(BASELINE.md round-4 MXU shootout section).")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
