#!/usr/bin/env python3
"""Backbone-bandwidth experiments on the flagship query path.

The fenced breakdown (ARCHITECTURE.md perf section) shows the query
path's ceiling is the HBM-bound R-50 backbone (AI≈74 vs the ~240 v5e
balance point). This driver measures the full conditioned query path
(backbone → towers → cond head → decode → NMS) under one variant per
process invocation, so XLA_FLAGS-style experiments get a clean runtime:

  --variant baseline          f32-resident params (current default)
  --variant bf16_params       backbone/head params stored in bf16 in HBM
                              (halves the weight-read traffic; compute
                              already runs bf16 via compute_dtype)
  --variant lhs               baseline + XLA latency-hiding scheduler
                              flags (set via env; this just labels it)

Run each and record the fenced img/s in ARCHITECTURE.md either way
(VERDICT r3 weak #4: only one bandwidth lever was ever tried).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="baseline",
                   choices=["baseline", "bf16_params", "lhs"])
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import sylph_tpu
    sylph_tpu.enable_compilation_cache()
    from sylph_tpu.models.meta_arch import MetaOneStageDetector
    from sylph_tpu.ops.decode import DecodeCfg, decode_proposals
    from sylph_tpu.ops.locations import build_location_grid
    from sylph_tpu.utils.profiling import fence

    canvas = (768, 1280)
    strides = (8, 16, 32, 64, 128)
    n_classes = 20
    batch = args.batch

    model = MetaOneStageDetector(depth=50, num_classes=60,
                                 code_generator_name="CodeGenerator")
    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(
        np.random.RandomState(0).rand(batch, *canvas, 3).astype(np.float32))
    variables = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 4)),
        jnp.ones((1,), bool), jnp.zeros((1, 128, 128, 3)), 1,
        method=MetaOneStageDetector.forward_episodic_train))(rng)
    params = variables["params"]
    if args.variant == "bf16_params":
        # bf16-resident weights: halve every weight read from HBM. The
        # compute path already multiplies in bf16 (XLA default conv
        # precision on TPU), so only the storage dtype changes.
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)

    bank = {
        "cls_conv": jnp.asarray(np.random.RandomState(7).rand(
            n_classes, 256).astype(np.float32)),
        "cls_bias": jnp.zeros((n_classes,), jnp.float32),
    }
    grid = build_location_grid(canvas, strides, [64, 128, 256, 512])
    grid_args = (jnp.asarray(grid.locations), jnp.asarray(grid.strides),
                 jnp.asarray(grid.level_ids))
    level_splits = tuple(h * w for h, w in grid.level_sizes)
    dcfg = DecodeCfg()
    sizes = jnp.tile(jnp.asarray([[canvas[0], canvas[1]]]), (batch, 1))

    @jax.jit
    def query_path(params, images):
        out = model.apply({"params": params}, images, bank,
                          method=MetaOneStageDetector.forward_instances)
        return decode_proposals(out.logits, out.reg, out.ctrness, out.iou,
                                *grid_args, sizes, dcfg, level_splits)

    for _ in range(5):
        out = query_path(params, images)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = query_path(params, images)
    fence(out)
    sec = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "variant": args.variant, "batch": batch,
        "img_per_sec": round(batch / sec, 2),
        "ms_per_batch": round(sec * 1000, 2),
        "xla_flags": os.environ.get("LIBTPU_INIT_ARGS", "")
        + " | " + os.environ.get("XLA_FLAGS", ""),
    }))


if __name__ == "__main__":
    main()
