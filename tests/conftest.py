"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip hardware is not available in CI; sharding tests run over a virtual
8-device CPU mesh exactly as the driver's ``dryrun_multichip`` does. These env
vars must be set before the first ``import jax`` anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Cache compiled XLA programs across test runs (kmeans while_loops are slow to
# compile on the CPU backend).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# The axon sitecustomize registers the TPU plugin at interpreter start and
# pins JAX_PLATFORMS=axon before this file runs; the env var alone is not
# enough. Override through the config API as well (lazy — applied at first
# backend init).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
