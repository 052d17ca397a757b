#!/usr/bin/env python3
"""Fenced per-stage breakdown of the conditioned query path.

Re-measures the round-1 breakdown (backbone+FPN / towers+cond head /
decode+NMS — ARCHITECTURE.md perf section) under the current production
residency policy (bf16-resident params, TPU.EVAL_BF16_RESIDENT) so the
"what is the bottleneck now" narrative stays current after each adopted
optimization. Stages are timed as nested jitted graphs (each includes
the previous — the delta is the stage cost), batch 16 @768x1280 like
bench.py.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--f32", action="store_true",
                   help="keep f32-resident params (baseline comparison)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import sylph_tpu
    sylph_tpu.enable_compilation_cache()
    from sylph_tpu.models.meta_arch import MetaOneStageDetector
    from sylph_tpu.ops.decode import DecodeCfg, decode_proposals
    from sylph_tpu.ops.locations import build_location_grid
    from sylph_tpu.utils.precision import bf16_resident
    from sylph_tpu.utils.profiling import fence

    canvas = (768, 1280)
    batch, n_classes = args.batch, 20
    model = MetaOneStageDetector(depth=50, num_classes=60)
    images = jnp.asarray(np.random.RandomState(0).rand(
        batch, *canvas, 3).astype(np.float32))
    params = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 128, 128, 3)),
        method=MetaOneStageDetector.forward_base))(
        jax.random.PRNGKey(0))["params"]
    if not args.f32:
        params = bf16_resident(params)

    bank = {"cls_conv": jnp.asarray(np.random.RandomState(7).rand(
                n_classes, 256).astype(np.float32)),
            "cls_bias": jnp.zeros((n_classes,), jnp.float32)}
    grid = build_location_grid(canvas, (8, 16, 32, 64, 128),
                               [64, 128, 256, 512])
    grid_args = (jnp.asarray(grid.locations), jnp.asarray(grid.strides),
                 jnp.asarray(grid.level_ids))
    level_splits = tuple(h * w for h, w in grid.level_sizes)
    sizes = jnp.tile(jnp.asarray([[canvas[0], canvas[1]]]), (batch, 1))
    dcfg = DecodeCfg()

    @jax.jit
    def backbone_only(params, images):
        return model.apply({"params": params}, images,
                           method=MetaOneStageDetector.extract_features)

    @jax.jit
    def through_head(params, images):
        return model.apply({"params": params}, images, bank,
                           method=MetaOneStageDetector.forward_instances)

    @jax.jit
    def full(params, images):
        out = model.apply({"params": params}, images, bank,
                          method=MetaOneStageDetector.forward_instances)
        return decode_proposals(out.logits, out.reg, out.ctrness, out.iou,
                                *grid_args, sizes, dcfg, level_splits)

    def t(fn):
        fence(fn(params, images))            # compile + warm
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            fence(fn(params, images))
            best = min(best, time.perf_counter() - t0)
        return best * 1000

    bb = t(backbone_only)
    hd = t(through_head)
    fl = t(full)
    print(json.dumps({
        "residency": "f32" if args.f32 else "bf16",
        "batch": batch, "canvas": list(canvas),
        "backbone_fpn_ms": round(bb, 1),
        "towers_cond_head_ms": round(hd - bb, 1),
        "decode_nms_ms": round(fl - hd, 1),
        "total_ms": round(fl, 1),
        "img_per_sec": round(batch / (fl / 1000), 1),
    }))


if __name__ == "__main__":
    main()
