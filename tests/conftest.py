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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # XLA:CPU aborts the process when a collective participant is >40 s
    # late to a rendezvous (rendezvous.cc warn=20s/terminate=40s). On a
    # 1-core host 8 virtual device threads share one CPU and routinely
    # skew past that while faulting pages (this VM's first-touch faults
    # run at ~7-30 MB/s) — the cause of the intermittent mid-suite
    # SIGABRTs. Raise both; a genuine deadlock still dies, just slower.
    flags = (flags + " --xla_cpu_collective_call_warn_stuck_timeout_seconds"
             "=300 --xla_cpu_collective_call_terminate_timeout_seconds"
             "=1200").strip()
os.environ["XLA_FLAGS"] = flags
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


@pytest.fixture(autouse=True)
def _clear_jax_caches_after_slow(request):
    """Slow tests compile the largest executables (full train steps,
    whole-runner flows); release them eagerly — the slow suite has also
    SIGABRT'd mid-module, which module-scope clearing can't bound."""
    yield
    if request.node.get_closest_marker("slow") is not None:
        import gc

        jax.clear_caches()
        gc.collect()
