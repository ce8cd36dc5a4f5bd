"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on `xla_force_host_platform_device_count=8`
CPU devices (no multi-chip TPU hardware in CI); the real-TPU path is exercised
by bench.py and the driver's compile checks.

Note: the environment pre-imports jax with a TPU backend (JAX_PLATFORMS is
already set in the env), so we must both overwrite the env var and update
jax.config — `os.environ.setdefault` would silently leave the TPU selected.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# NO persistent compile cache for the suite (tried in round 3, reverted):
# executing persistent-cache-served XLA-CPU SPMD executables aborts the
# process on this jax version ("Fatal Python error: Aborted" at result
# materialization in test_sharding) — both when sharing a cache directory
# across runtime contexts (TPU / multi-process gloo / single-process) AND
# with a fresh isolated directory once several sharded programs cache in
# one run. Compile-only users (scripts/collective_bytes.py) are safe;
# anything that EXECUTES on the virtual CPU mesh must compile fresh.

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
