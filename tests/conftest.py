"""Test configuration: force CPU with 8 virtual devices.

The 8-device CPU mesh stands in for the reference's ``mpirun -np 8``
smoke run (reference test.sh:9) — multi-device sharding tests run on it
exactly as they would on an 8-chip TPU slice.

Note: this environment's sitecustomize force-registers the 'axon' TPU
platform and overrides JAX_PLATFORMS, so the switch must happen via
jax.config *after* import (env vars are not honored).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Scope the cache by host CPU fingerprint: XLA's cache key omits host CPU
# features, so /tmp surviving a VM migration otherwise serves AOT'd CPU
# executables the new host can't run (SIGILL risk; observed worker failure).
from mfem_ad_tpu import _host_fingerprint  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    f"/tmp/mfem_ad_tpu_jax_cache_{_host_fingerprint()}",
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
