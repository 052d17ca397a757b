#!/usr/bin/env python3
"""Quantify the numerical cost of bf16-resident weights on the chip.

Runs the full conditioned query path (backbone -> towers -> cond head)
twice with the SAME model and inputs — once with f32-resident params,
once with the params rounded to bf16 in HBM — and prints the logit /
box-regression deltas plus the decoded score delta. Companion to
tools/bench_backbone_exp.py (which measures the 26% throughput win);
this is the accuracy side of the trade recorded in ARCHITECTURE.md.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
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
    batch = 4

    model = MetaOneStageDetector(depth=50, num_classes=60,
                                 code_generator_name="CodeGenerator")
    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(
        np.random.RandomState(0).rand(batch, *canvas, 3).astype(np.float32))
    variables = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 4)),
        jnp.ones((1,), bool), jnp.zeros((1, 128, 128, 3)), 1,
        method=MetaOneStageDetector.forward_episodic_train))(rng)
    params32 = variables["params"]
    params16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16).astype(jnp.float32)
        if x.dtype == jnp.float32 else x, params32)

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
        det = decode_proposals(out.logits, out.reg, out.ctrness, out.iou,
                               *grid_args, sizes, dcfg, level_splits)
        return out.logits, out.reg, det

    lg32, rg32, det32 = query_path(params32, images)
    lg16, rg16, det16 = query_path(params16, images)
    fence(det16)

    def stats(a, b):
        d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
        return {"max": round(float(d.max()), 4),
                "rms": round(float(np.sqrt((d ** 2).mean())), 5)}

    p32 = jax.nn.sigmoid(lg32)
    p16 = jax.nn.sigmoid(lg16)
    print(json.dumps({
        "logit_delta": stats(lg32, lg16),
        "prob_delta": stats(p32, p16),
        "reg_delta_px": stats(rg32, rg16),
        "decoded_score_delta": stats(det32.scores, det16.scores),
        "logit_range": [round(float(np.asarray(lg32).min()), 2),
                        round(float(np.asarray(lg32).max()), 2)],
    }))


if __name__ == "__main__":
    main()
