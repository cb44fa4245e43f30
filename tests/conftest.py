"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container's interpreter boot hook (sitecustomize) registers a remote TPU
PJRT plugin and pins JAX_PLATFORMS=axon, which would route every tiny test
compile through the remote-compile tunnel. Tests instead run on a virtual
8-device CPU mesh (mirrors the driver's multi-chip dry-run environment).
The plugin is only *registered* at boot — backends initialize lazily — so
overriding the platform here, before any test touches jax, is sufficient.
"""

import os

import jax

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
jax.config.update("jax_platforms", "cpu")
# cache compiled programs across test runs (renders are compile-heavy)
jax.config.update("jax_compilation_cache_dir", "/tmp/pbrt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# The XLA CPU client segfaults inside backend_compile_and_load after ~145
# compile-heavy tests in one process (reproduced r1+r2; machine has >100 GB
# free, so it is client state, not system OOM). Dropping the executable
# caches between modules keeps the client small; the on-disk persistent
# cache makes any recompiles cheap.
import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()
    gc.collect()
