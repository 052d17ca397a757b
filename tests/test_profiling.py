"""Profiling utility tests."""

import jax.numpy as jnp
import numpy as np

from sylph_tpu.utils.profiling import flop_count, latency


def test_flop_count_matmul():
    a = jnp.zeros((128, 256), jnp.float32)
    b = jnp.zeros((256, 128), jnp.float32)
    cost = flop_count(lambda x, y: x @ y, a, b)
    # 2*M*N*K = 8.4 MFLOPs (XLA may report exactly or -1 when unknown)
    if cost["flops"] > 0:
        assert 0.5 * 2 * 128 * 128 * 256 <= cost["flops"] \
            <= 2 * 2 * 128 * 128 * 256


def test_latency_measures_positive():
    import jax
    f = jax.jit(lambda x: jnp.sin(x).sum())
    t = latency(f, jnp.ones((64, 64)), iters=3, warmup=1)
    assert t > 0
