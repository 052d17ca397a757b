"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference has no distributed tests at all (SURVEY.md §4); JAX lets us
test multi-device sharding on one host, so every test here runs against
8 virtual CPU devices.
"""

import os

# Must be set before jax initializes its backends.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("SYLPH_TEST_MODE", "1")

import jax  # noqa: E402
import pytest  # noqa: E402

# The environment's TPU plugin (axon) re-sets jax_platforms at interpreter
# startup via sitecustomize; override it back to CPU for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module.

    A full-suite run accumulates hundreds of XLA:CPU executables in one
    process and has (twice) died with a hard SIGABRT inside the runtime
    near the end of the run — each crashing test passes in isolation.
    Releasing the compilation caches at module boundaries bounds the
    live-executable footprint; cross-module recompiles are cheap
    because fixtures (and therefore graph shapes) are module-scoped
    anyway.
    """
    yield
    jax.clear_caches()
