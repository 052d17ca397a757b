"""Profiling: FLOP counting + latency harness + device traces.

Replaces the reference's fvcore FLOP-count callback
(add_print_flops_callback, meta_fcos_runner.py:297,475) and its
hand-rolled cuda-synchronized latency meters with:

  * ``flop_count`` — XLA's own cost analysis of the compiled graph
    (exact for the lowered computation, unlike operator-table counting);
  * ``latency`` — warmup-aware wall time with ``block_until_ready``;
  * ``trace`` — context manager around ``jax.profiler`` for perfetto/
    tensorboard traces on TPU.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


def flop_count(fn: Callable, *args) -> Dict[str, float]:
    """FLOPs / bytes of the jitted fn at these example args."""
    lowered = jax.jit(fn).lower(*args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns a per-device list
        cost = cost[0]
    cost = cost or {}
    return {"flops": float(cost.get("flops", -1)),
            "bytes_accessed": float(cost.get("bytes accessed", -1))}


def fence(out):
    """Force completion of ``out`` with a tiny host fetch.

    On remote-attached TPUs (the axon tunnel) ``block_until_ready`` is
    unreliable until the process has performed at least one real
    device->host fetch — dispatches enqueue asynchronously and "block"
    returns immediately, which silently turns a latency measurement into
    a dispatch-rate measurement. Fetching one element of a computation
    that depends on ``out`` is a correct fence everywhere, and transfers
    only a scalar.
    """
    import numpy as np

    leaf = jax.tree.leaves(out)[0]
    if getattr(leaf, "is_fully_addressable", True) is False:
        # multi-host global array: elements on other processes can't be
        # fetched — fence through this process's first local shard
        leaf = leaf.addressable_shards[0].data
    # index one element rather than ravel()[0]: reshaping an N-d array
    # to 1-d can force XLA to materialize a relaid-out copy of the WHOLE
    # array (a (128,1024²,3) u8 batch lane-pads C=3 -> 128 = 16 GB and
    # OOMs the chip at compile time); a single-element slice works on
    # any layout without copying.
    idx = (0,) * getattr(leaf, "ndim", 0)
    return np.asarray(leaf[idx] if idx else leaf)


def fence_large_leaves(tree, threshold: int = 1 << 20) -> None:
    """``fence`` every leaf of ``tree`` larger than ``threshold`` bytes.

    The shared fence-at-transfer policy for prefetch threads (train
    runner ``groups()`` and eval ``_device_prefetch``): through the
    remote-TPU tunnel, deferred transfers execute lazily on the device
    stream at dispatch time — serializing H2D with compute — so large
    transfers are forced to completion on the prefetch thread where
    they overlap the running step. A fence is a ~1-3 ms round trip;
    at the fenced ~300 MB/s tunnel rate ~1 MB is the break-even, so
    smaller leaves stay lazy.
    """
    for leaf in jax.tree.leaves(tree):
        if getattr(leaf, "nbytes", 0) > threshold:
            fence(leaf)


def latency(fn: Callable, *args, iters: int = 20, warmup: int = 5) -> float:
    """Mean seconds per call (device-synchronized via ``fence``)."""
    for _ in range(warmup):
        out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace around a code block (view in tensorboard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def memory_report(lowered) -> Dict[str, float]:
    """HBM accounting for a lowered jax computation, in GB.

    Uses XLA's compile-time memory analysis (exact, device-independent
    of runtime stats — the remote-attached PJRT client returns None
    from ``device.memory_stats()``, so runtime polling is not an option
    on this tunnel). The reference logs torch.cuda.max_memory_allocated
    via d2go's CommonMetricPrinter; this is the TPU equivalent taken
    from the compiler instead of the allocator.
    """
    ma = lowered.compile().memory_analysis()
    gb = 1.0 / 1e9
    out = {}
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "generated_code_size_in_bytes",
              "alias_size_in_bytes"):
        v = getattr(ma, k, None)
        if v is not None:
            out[k.replace("_in_bytes", "_gb")] = round(v * gb, 3)
    args = out.get("argument_size_gb", 0.0)
    alias = out.get("alias_size_gb", 0.0)
    out["peak_estimate_gb"] = round(
        args - alias + out.get("output_size_gb", 0.0)
        + out.get("temp_size_gb", 0.0), 3)
    return out
