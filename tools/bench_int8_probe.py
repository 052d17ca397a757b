#!/usr/bin/env python3
"""int8 weight-residency probe for the HBM-bound backbone.

The adopted bf16-resident policy halves weight reads; this probe asks
whether halving them AGAIN (int8 + per-output-channel scales,
dequantized to bf16 inside the jitted graph) buys anything at the
adopted batch-48 operating point — and what it costs numerically.
Expectation (ARCHITECTURE.md round-5 breakdown): small, because at
batch 48 activations dominate backbone traffic; recorded
adopt-or-neutral either way. The A/B runs both variants in ONE process
back-to-back so tunnel-hour contention cancels.

Fidelity is reported as max |logit delta| vs the bf16-resident graph on
the same inputs (per-channel symmetric int8 on conv kernels only;
biases/norm params stay bf16).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=48)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import sylph_tpu
    sylph_tpu.enable_compilation_cache()
    from sylph_tpu.models.meta_arch import MetaOneStageDetector
    from sylph_tpu.utils.precision import bf16_resident
    from sylph_tpu.utils.profiling import fence

    canvas = (768, 1280)
    batch = args.batch
    model = MetaOneStageDetector(depth=50, num_classes=60)
    images = jnp.asarray(np.random.RandomState(0).rand(
        batch, *canvas, 3).astype(np.float32))
    params = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 128, 128, 3)),
        method=MetaOneStageDetector.forward_base))(
        jax.random.PRNGKey(0))["params"]

    # ---- variant A: bf16-resident (production default)
    p_bf16 = bf16_resident(params)

    # ---- variant B: int8-packed conv kernels + bf16 everything else
    def pack(x):
        x = jnp.asarray(x)
        if x.ndim == 4 and x.shape[-1] >= 8:     # conv kernels HWIO
            s = jnp.max(jnp.abs(x), axis=(0, 1, 2), keepdims=True)
            s = jnp.maximum(s, 1e-8) / 127.0
            q = jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)
            return {"_q": q, "_s": s.astype(jnp.float32)}
        return x.astype(jnp.bfloat16)

    def unpack(x):
        if isinstance(x, dict) and "_q" in x:
            return (x["_q"].astype(jnp.bfloat16)
                    * x["_s"].astype(jnp.bfloat16))
        return x

    p_int8 = jax.tree.map(pack, params)

    def unpack_tree(t):
        if isinstance(t, dict) and "_q" in t:
            return unpack(t)
        if isinstance(t, dict):
            return {k: unpack_tree(v) for k, v in t.items()}
        return t

    @jax.jit
    def fwd_bf16(p, images):
        out = model.apply({"params": p}, images,
                          method=MetaOneStageDetector.forward_base)
        return out.logits

    @jax.jit
    def fwd_int8(pq, images):
        p = unpack_tree(pq)
        out = model.apply({"params": p}, images,
                          method=MetaOneStageDetector.forward_base)
        return out.logits

    def bench(fn, p):
        for _ in range(5):
            out = fn(p, images)
        fence(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(p, images)
        fence(out)
        return (time.perf_counter() - t0) / args.iters, out

    t_bf16, logits_bf16 = bench(fwd_bf16, p_bf16)
    t_int8, logits_int8 = bench(fwd_int8, p_int8)
    # interleave a second bf16 run to bound within-process drift
    t_bf16b, _ = bench(fwd_bf16, p_bf16)

    delta = float(jnp.max(jnp.abs(
        logits_int8.astype(jnp.float32)
        - logits_bf16.astype(jnp.float32))))
    rng = float(jnp.max(logits_bf16) - jnp.min(logits_bf16))
    print(json.dumps({
        "batch": batch,
        "bf16_ms": round(t_bf16 * 1e3, 2),
        "bf16_ms_repeat": round(t_bf16b * 1e3, 2),
        "int8_ms": round(t_int8 * 1e3, 2),
        "bf16_img_s": round(batch / t_bf16, 1),
        "int8_img_s": round(batch / t_int8, 1),
        "max_logit_delta": round(delta, 4),
        "logit_range": round(rng, 2),
    }))


if __name__ == "__main__":
    main()
