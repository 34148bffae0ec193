"""Per-device memory of the sharding strategies, measured from XLA.

A 1-chip environment cannot produce multi-chip step times, but the
partitioner's per-device allocations ARE measurable: XLA's
``compiled.memory_analysis()`` reports argument / output / temp bytes per
device for the exact executable each sharding produces. This quantifies
what tensor-parallel weight sharding (`parallel/mesh.py`) and spatial H/W
activation sharding (`parallel/spatial.py`) buy — the reference has no
analogue (its only parallelism is NCCL data-parallel replication,
/root/reference/train_setgan.py:38-58).

Run on the virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/measure_sharding_memory.py [--res 128] [--batch 8]

Prints a table + one JSON line; paste into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # axon plugin ignores the env var

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def mem_stats(compiled):
    """memory_analysis() → dict of the per-device byte counters (or None)."""
    try:
        ma = compiled.memory_analysis()
    except Exception:
        return None
    if ma is None:
        return None
    out = {}
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            out[k] = int(v)
    return out or None


def fmt(b):
    return f"{b / 2**20:8.1f} MiB" if b is not None else "      n/a"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--channel_base", type=int, default=32768,
                    help="SG3-R width knob (flagship=65536; default halves "
                    "it so the CPU compile stays in minutes)")
    args = ap.parse_args()

    from stylegan3_editing_tpu.models.sg3 import Generator, sg3_r_config
    from stylegan3_editing_tpu.parallel import create_mesh, shard_params
    from stylegan3_editing_tpu.parallel.spatial import spatial_synthesis

    cfg = sg3_r_config(args.res, channel_base=args.channel_base,
                       use_bf16=False)
    model = Generator(cfg)
    z = jax.random.normal(jax.random.PRNGKey(0), (args.batch, cfg.z_dim))
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), z[:1])
    ws = model.apply(variables, z, method=model.map)

    n = len(jax.devices())
    rows = []
    results = {}

    # --- data-parallel baseline: batch sharded, weights replicated -------
    mesh = create_mesh(shape=(n, 1))
    v_rep = jax.device_put(variables, NamedSharding(mesh, P()))
    ws_dp = jax.device_put(ws, NamedSharding(mesh, P("data")))
    fn = jax.jit(lambda v, w: model.apply(v, w, method=model.synthesize))
    stats = mem_stats(fn.lower(v_rep, ws_dp).compile())
    rows.append((f"dp={n} (batch-sharded, weights replicated)", stats))
    results["dp"] = stats

    # --- tensor parallel: weights sharded over 'model' -------------------
    for tp in (2, 4):
        if n % tp:
            continue
        mesh = create_mesh(shape=(n // tp, tp))
        v_tp = shard_params(variables, mesh)
        ws_tp = jax.device_put(ws, NamedSharding(mesh, P("data")))
        stats = mem_stats(fn.lower(v_tp, ws_tp).compile())
        rows.append((f"dp={n // tp} tp={tp} (weight-sharded)", stats))
        results[f"tp{tp}"] = stats

    # --- spatial H-sharding: activations sharded, batch replicated -------
    # (the >one-chip-canvas story: per-device TEMP bytes must fall ~1/sp).
    # One sample: spatial sharding is for when a single canvas outgrows a
    # chip, so the batch axis is not doing the sharding work here.
    ws1 = ws[:1]
    for sp in (1, 2, 4):
        if n % sp:
            continue
        mesh = create_mesh(shape=(n // sp, 1, sp),
                           axis_names=("data", "model", "space"))
        ws_sp = jax.device_put(ws1, NamedSharding(mesh, P()))
        v_sp = jax.device_put(variables, NamedSharding(mesh, P()))
        sp_fn = jax.jit(lambda v, w, _mesh=mesh: spatial_synthesis(
            cfg, v, w, _mesh, axis="space"))
        stats = mem_stats(sp_fn.lower(v_sp, ws_sp).compile())
        rows.append((f"spatial space={sp} (activation H-sharded)", stats))
        results[f"spatial{sp}"] = stats

    hdr = f"{'case':44s} {'args':>12s} {'temp':>12s} {'output':>12s}"
    print(hdr)
    print("-" * len(hdr))
    for name, stats in rows:
        if stats is None:
            print(f"{name:44s}  memory_analysis unavailable on this backend")
            continue
        print(f"{name:44s} {fmt(stats.get('argument_size_in_bytes'))} "
              f"{fmt(stats.get('temp_size_in_bytes'))} "
              f"{fmt(stats.get('output_size_in_bytes'))}")
    print(json.dumps({"res": args.res, "batch": args.batch,
                      "channel_base": args.channel_base,
                      "devices": n, "stats": results}))


if __name__ == "__main__":
    main()
