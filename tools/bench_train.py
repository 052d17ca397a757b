#!/usr/bin/env python3
"""Episodic meta-training throughput benchmark (single chip or mesh).

  python tools/bench_train.py [--episodes 8] [--shot 5] [--canvas 512]

Prints episodes/sec and support+query images/sec for the full jitted
shard_map training step (backbone fwd+bwd on support+query, code
generation, conditioned episodic loss, SGD update).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--episodes", type=int, default=8)
    p.add_argument("--shot", type=int, default=5)
    p.add_argument("--query", type=int, default=1)
    p.add_argument("--canvas", type=int, default=512)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="K>1 scans K optimizer steps per dispatch "
                   "(TPU.STEPS_PER_CALL) — amortizes launch overhead")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from sylph_tpu.models.meta_arch import MetaOneStageDetector
    from sylph_tpu.ops.fcos_losses import FCOSLossCfg
    from sylph_tpu.ops.locations import build_location_grid
    from sylph_tpu.parallel.mesh import create_mesh, shard_batch
    from sylph_tpu.train.optimizer import build_optimizer
    from sylph_tpu.train.steps import make_episodic_train_step
    from sylph_tpu.train.train_state import create_train_state

    import sylph_tpu
    sylph_tpu.enable_compilation_cache()

    canvas = (args.canvas, args.canvas)
    e, shot, q = args.episodes, args.shot, args.query
    mesh = create_mesh()
    model = MetaOneStageDetector(depth=50, num_classes=60,
                                 stop_backbone_grad=True)
    # init at tiny shapes under jit (conv params are shape-independent;
    # unjitted eager init crawls through the remote-TPU tunnel)
    params = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 4)),
        jnp.ones((1,), bool), jnp.zeros((1, 128, 128, 3)), 1,
        method=MetaOneStageDetector.forward_episodic_train))(
            jax.random.PRNGKey(0))["params"]
    tx, _ = build_optimizer(
        params, base_lr=5e-4, warmup_iters=0, clip_grad_norm=1.0,
        freeze_cfg={"backbone": True, "episodic": True,
                    "bbox_branch": True})
    state = create_train_state(params, tx)
    grid = build_location_grid(canvas, (8, 16, 32, 64, 128),
                               [64, 128, 256, 512])
    k = args.steps_per_call
    step = make_episodic_train_step(model, tx, grid, FCOSLossCfg(), mesh,
                                    num_shots=shot, steps_per_call=k)

    rng = np.random.RandomState(0)
    batch = {
        "support_images": rng.rand(e * shot, *canvas, 3)
        .astype(np.float32),
        "support_boxes": np.tile(
            np.array([[20, 20, 300, 320.0]], np.float32), (e * shot, 1)),
        "support_box_valid": np.ones((e * shot,), bool),
        "query_images": rng.rand(e * q, *canvas, 3).astype(np.float32),
        "query_gt_boxes": np.tile(
            np.array([[[24, 24, 280, 300.0]]], np.float32), (e * q, 4, 1)),
        "query_gt_labels": np.tile(np.array([[3, 0, 0, 0]], np.int32),
                                   (e * q, 1)),
        "query_gt_valid": np.tile(np.array([[True, False, False, False]]),
                                  (e * q, 1)),
        "episode_class_ids": (np.arange(e) % 60).astype(np.int32),
    }
    from sylph_tpu.utils.profiling import fence
    key = jax.random.PRNGKey(0)
    if k > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = (NamedSharding(mesh, P(None, "data"))
                    if mesh.size > 1 else None)
        sb = jax.tree.map(
            lambda x: jax.device_put(
                np.stack([np.asarray(x)] * k), sharding), batch)
        keys = jnp.stack([jax.random.fold_in(key, i) for i in range(k)])
        state, _ = step(state, sb, keys)   # compile
        fence(state.params)
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, metrics = step(state, sb, keys)
        fence(state.params)
        dt = (time.perf_counter() - t0) / (args.iters * k)
    else:
        sb = shard_batch(mesh, batch)
        state, _ = step(state, sb, key)   # compile
        fence(state.params)
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, metrics = step(state, sb, jax.random.fold_in(key, i))
        fence(state.params)
        dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "metric": "episodic_train_episodes_per_sec",
        "value": round(e / dt, 2), "unit": "episodes/sec",
        "extra": {
            "sec_per_step": round(dt, 4),
            "images_per_step": e * (shot + q),
            "images_per_sec": round(e * (shot + q) / dt, 1),
            "canvas": args.canvas, "shot": shot,
            "steps_per_call": k,
            "devices": jax.device_count(),
        },
    }))


if __name__ == "__main__":
    main()
