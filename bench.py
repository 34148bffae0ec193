"""Benchmark: flagship SG3-R 1024² synthesis throughput on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no quantitative baseline (BASELINE.md), so
vs_baseline is null until a reference-hardware number exists.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    from stylegan3_editing_tpu.models.sg3 import Generator, sg3_r_config

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    if on_tpu:
        # batch > 2 at 1024² crashes the axon remote-compile helper (env
        # limitation, not a model limit); batch 2 keeps the bench robust.
        res, batch, iters = 1024, 2, 10
        cfg = sg3_r_config(res)
    else:  # CPU smoke mode (slim channels) so the bench is runnable anywhere
        res, batch, iters = 64, 1, 2
        cfg = sg3_r_config(res, channel_base=2048, channel_max=64,
                           num_layers=6, use_bf16=False)
    model = Generator(cfg)
    z0 = jnp.zeros((batch, cfg.z_dim), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), z0)

    @jax.jit
    def synth(variables, z):
        return model.apply(variables, z, truncation_psi=0.7)

    key = jax.random.PRNGKey(1)
    z = jax.random.normal(key, (batch, cfg.z_dim))
    synth(variables, z).block_until_ready()  # compile

    t0 = time.perf_counter()
    for i in range(iters):
        z = jax.random.fold_in(key, i)
        z = jax.random.normal(z, (batch, cfg.z_dim))
        out = synth(variables, z)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    images_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": f"sg3_r_{res}x{res}_synthesis_throughput",
        "value": round(images_per_sec, 4),
        "unit": "images/sec/chip",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
