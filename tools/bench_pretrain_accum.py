#!/usr/bin/env python3
"""Sweep TPU.GRAD_ACCUM for the reference pretrain step shape.

`auto_scale_world_size` emulates the reference pretrain world
(REFERENCE_WORLD_SIZE=64, batch 128 — Meta-FCOS-pretrain.yaml SOLVER)
with GRAD_ACCUM=64, i.e. 2-image micro-ranks. For NON-episodic training
the micro-batch size is purely a reduction order: gradients are
identical for any m (tests/test_train.py::
test_grad_accum_matches_full_batch_pretrain), unlike the episodic stage
where each micro-group IS a rank's "way" (ARCHITECTURE.md auto-scale
diagnosis). So the only question is throughput vs memory: a 2-image
1024x1024 conv batch underutilizes the v5e MXU, while smaller m raises
activation memory roughly linearly.

This driver builds the REAL production step (make_pretrain_train_step,
packed-state boundary, loss cfg from defaults) at batch 128 @ 1024^2
with device-resident synthetic data — no dataset, no loader — and for
each m in the sweep reports XLA's compile-time HBM accounting plus the
fenced steady-state sec/iter. Results recorded in ARCHITECTURE.md; the
winner sets TPU.PRETRAIN_MICRO_BATCH's default.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--canvas", type=int, nargs=2, default=(1024, 1024))
    p.add_argument("--accum", type=int, nargs="+",
                   default=(64, 32, 16, 8))
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the backbone (TPU.REMAT_BACKBONE) "
                        "— trades FLOPs for the activation memory that "
                        "caps the micro-batch size")
    p.add_argument("--iters", type=int, default=6)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import sylph_tpu
    sylph_tpu.enable_compilation_cache()
    from sylph_tpu.config import get_default_cfg
    from sylph_tpu.models.meta_arch import MetaOneStageDetector
    from sylph_tpu.ops.locations import build_location_grid
    from sylph_tpu.runner.meta_fcos_runner import _loss_cfg
    from sylph_tpu.train.optimizer import build_optimizer
    from sylph_tpu.train.packing import pack_state
    from sylph_tpu.train.steps import make_pretrain_train_step
    from sylph_tpu.train.train_state import create_train_state
    from sylph_tpu.utils.profiling import fence, memory_report

    cfg = get_default_cfg()
    canvas = tuple(args.canvas)
    B, M = args.batch, 100

    model = MetaOneStageDetector(depth=50, num_classes=60,
                                 remat_backbone=args.remat)
    init_img = jnp.zeros((1, *canvas, 3), jnp.uint8)
    params = jax.jit(lambda r: model.init(
        r, init_img, method=MetaOneStageDetector.forward_base))(
        jax.random.PRNGKey(0))["params"]
    tx, _ = build_optimizer(params, base_lr=0.01)

    rs = np.random.RandomState(0)
    # a plausible GT population: ~20 valid boxes/img across scales
    cx = rs.uniform(64, canvas[1] - 64, (B, M))
    cy = rs.uniform(64, canvas[0] - 64, (B, M))
    w = rs.uniform(16, 300, (B, M))
    h = rs.uniform(16, 300, (B, M))
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     -1).astype(np.float32)
    batch = {
        "images": jnp.asarray(rs.randint(0, 256, (B, *canvas, 3),
                                         dtype=np.uint8)),
        "gt_boxes": jnp.asarray(boxes),
        "gt_labels": jnp.asarray(rs.randint(0, 60, (B, M), dtype=np.int64)
                                 .astype(np.int32)),
        "gt_valid": jnp.asarray(np.arange(M)[None, :]
                                < rs.randint(5, 40, (B, 1))),
    }
    fence(batch["images"])  # land H2D before timing anything

    grid = build_location_grid(canvas, tuple(cfg.MODEL.FCOS.FPN_STRIDES),
                               list(cfg.MODEL.FCOS.SIZES_OF_INTEREST))
    results = []
    for m in args.accum:
        if B % m:
            continue
        step = make_pretrain_train_step(
            model, tx, grid, _loss_cfg(cfg), mesh=None, grad_accum=m)
        # fresh packed state per variant: the step donates its state
        # argument, so a shared one would be deleted after variant 1
        ps = pack_state(create_train_state(params, tx))
        row = {"grad_accum": m, "micro_batch": B // m,
               "remat": args.remat}
        try:
            lowered = jax.jit(step).lower(ps, batch)
            row["memory"] = memory_report(lowered)
            t0 = time.perf_counter()
            st, metrics = step(ps, batch)
            fence(metrics)
            row["compile_plus_first_s"] = round(time.perf_counter() - t0, 1)
            times = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                st, metrics = step(st, batch)
                fence(metrics)
                times.append(time.perf_counter() - t0)
            row["sec_per_iter"] = round(min(times), 2)
            row["sec_per_iter_median"] = round(sorted(times)[len(times) // 2], 2)
            row["img_per_sec"] = round(B / min(times), 1)
            row["loss_cls"] = round(float(np.asarray(
                jax.tree.leaves(metrics)[0], np.float32)), 4)
        except Exception as e:  # OOM etc: record and keep sweeping
            row["error"] = f"{type(e).__name__}: {str(e)[:300]}"
        print(json.dumps(row), flush=True)
        results.append(row)
    print(json.dumps({"sweep": results}))


if __name__ == "__main__":
    main()
