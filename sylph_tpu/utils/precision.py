"""Residency-precision helpers.

The query path is HBM-bandwidth-bound in the R-50 backbone
(ARCHITECTURE.md perf breakdown: AI ~ 74 FLOP/B vs the ~240 v5e balance
point), so halving every weight read by storing eval-time parameters in
bf16 buys measurable throughput: 202 -> 254 img/s fenced on the real
chip (tools/bench_backbone_exp.py). It is numerically free for the conv
kernels — XLA's default TPU conv/matmul precision already multiplies in
bf16 (rounding the operand beforehand is a no-op; verified exactly by
tools/bf16_fidelity_probe.py) — and only rounds elementwise params
(GN scales/biases, head biases) at ~0.4% relative, upstream of a
GroupNorm. Training state stays f32 (master weights); this is applied
to the *eval* copy only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bf16_resident(params):
    """Cast every float32 leaf of ``params`` to bfloat16 (HBM residency
    dtype). Integer / bool / already-low-precision leaves pass through."""
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)


def eval_resident_params(cfg, params):
    """Apply the ``TPU.EVAL_BF16_RESIDENT`` policy to an eval param tree.

    Active on accelerators only: XLA:CPU gains nothing from bf16
    residency (no HBM) and can hit slow emulated-bf16 kernels, and the
    CPU-mesh test suite should keep exercising the f32 reference
    numerics."""
    if not cfg.TPU.get("EVAL_BF16_RESIDENT", False):
        return params
    if jax.default_backend() == "cpu":
        return params
    return bf16_resident(params)
