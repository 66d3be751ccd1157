"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The ambient environment registers a remote-TPU ("axon") PJRT plugin from
sitecustomize and pins ``JAX_PLATFORMS=axon`` before any conftest runs, so a
plain env-var override is too late.  ``jax.config.update`` still works as long
as no backend has been initialized, which is the case at collection time.

Multi-chip sharding paths are validated on this CPU mesh (the driver
separately dry-runs them via __graft_entry__.dryrun_multichip); real-TPU
benchmarking happens in bench.py only.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: repeated test runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
