"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference never tested distributed paths without real GPUs; here every
sharding test runs against 8 virtual CPU devices so multi-chip logic is
exercised in CI (SURVEY.md §4). Must be set before JAX initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env presets 'axon' (TPU tunnel)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin overrides the JAX_PLATFORMS env var; the config flag
# wins over both.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: the suite re-jits many small convs; caching
# across runs keeps `pytest -q` fast. The dir is keyed by the host's CPU
# feature set — XLA:CPU AOT blobs are machine-specific, and loading a blob
# compiled on a different host silently computes garbage (observed: cached
# kernels with AVX-512 features missing on the execution host).
import hashlib  # noqa: E402
import platform  # noqa: E402

try:
    with open("/proc/cpuinfo") as f:
        _flags = next((l for l in f if l.startswith("flags")), "")
except OSError:
    _flags = ""
# Boot id keys the cache to THIS machine instance: XLA:CPU AOT blobs encode
# compile-host CPU features (incl. tuning prefs like +prefer-no-gather that
# cpuinfo flags do NOT capture), and loading a foreign blob silently
# computes garbage or SIGILLs.
try:
    with open("/proc/sys/kernel/random/boot_id") as f:
        _boot = f.read().strip()
except OSError:
    _boot = ""
_machine_key = hashlib.sha1(
    (platform.machine() + platform.node() + _boot + _flags).encode()
).hexdigest()[:12]
jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/sg3tpu_jax_cache_{_machine_key}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
