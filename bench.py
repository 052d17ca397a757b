"""Benchmark: Meta-FCOS R-50 few-shot inference throughput on one chip.

Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline metric mirrors BASELINE.json: images/sec/chip for the
flagship query path (conditioned R-50 FCOS + decode + NMS, 20-class
bank) at the COCO eval canvas, plus code-gen ms/class as a secondary
field. ``vs_baseline`` is measured against the driver north-star of
4x a Detectron2-GPU reference throughput (~25 img/s for R-50 FCOS on a
V100-class GPU => target 100 img/s/chip); >1.0 beats the target.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _bench_fn(fn, args, iters=30, warmup=5):
    from sylph_tpu.utils.profiling import fence
    for _ in range(warmup):
        out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


def main():
    import sylph_tpu
    sylph_tpu.enable_compilation_cache()
    from sylph_tpu.models.meta_arch import MetaOneStageDetector
    from sylph_tpu.ops.decode import DecodeCfg, decode_proposals
    from sylph_tpu.ops.locations import build_location_grid

    canvas = (768, 1280)  # fits 800x1333 shortest-edge eval resize, /128
    strides = (8, 16, 32, 64, 128)
    n_classes = 20
    # Round-5 sweep under bf16-resident params (tools/
    # bench_stage_breakdown.py, same contended hour): 16→177, 32→213,
    # 48→233, 64→240 img/s — the f32-era "flat above 16" conclusion no
    # longer holds once weight/activation traffic halves; the knee is
    # ~48 (backbone amortizes 3.98→2.64 ms/img, towers stay flat at
    # ~1.1 ms/img = MXU-bound).
    batch = 48
    shots = 10

    model = MetaOneStageDetector(depth=50, num_classes=60,
                                 code_generator_name="CodeGenerator")
    rng = jax.random.PRNGKey(0)
    images = jnp.asarray(
        np.random.RandomState(0).rand(batch, *canvas, 3).astype(np.float32))
    # init through the episodic path at tiny shapes so ALL submodules
    # (incl. the code generator) get parameters; conv params are
    # shape-independent, so they serve every canvas below.
    variables = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 128, 128, 3)), jnp.zeros((1, 4)),
        jnp.ones((1,), bool), jnp.zeros((1, 128, 128, 3)), 1,
        method=MetaOneStageDetector.forward_episodic_train))(rng)
    params = variables["params"]

    # Realistic code bank: generate + normalize codes from random
    # support crops (NOT zeros — a zero bank makes every location pass
    # the score threshold and inflates the NMS load unrealistically;
    # normalized random-weight codes give the focal-prior logit floor).
    bank_rng = np.random.RandomState(7)
    bank_sup = jnp.asarray(
        bank_rng.rand(n_classes, 192, 192, 3).astype(np.float32) * 255)
    bank_boxes = jnp.asarray(
        bank_rng.rand(n_classes, 4).astype(np.float32) * 60
        + np.array([10, 10, 100, 100], np.float32))

    @jax.jit
    def make_bank(params, sup, boxes):
        raw = model.apply(
            {"params": params}, sup, boxes,
            jnp.ones((n_classes,), bool), 1, False,
            method=MetaOneStageDetector.forward_class_code)
        return model.apply({"params": params},
                           {"cls_conv": raw["cls_conv"],
                            "cls_bias": raw["cls_bias"]},
                           method=MetaOneStageDetector.normalize_code)

    bank = jax.tree.map(jnp.asarray,
                        make_bank(params, bank_sup, bank_boxes))

    # Production residency policy (TPU.EVAL_BF16_RESIDENT, default on):
    # bf16-resident weights halve the HBM weight-read traffic of the
    # bandwidth-bound backbone — 202 -> 254 img/s measured on v5e, exact
    # for conv kernels (XLA already multiplies convs in bf16; see
    # tools/bf16_fidelity_probe.py). Applied on accelerators only, like
    # runner.do_test / SylphPredictor do.
    if jax.default_backend() != "cpu":
        from sylph_tpu.utils.precision import bf16_resident
        params = bf16_resident(params)

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

    sec = _bench_fn(query_path, (params, images))
    images_per_sec = batch / sec

    # Secondary: code generation ms/class (10-shot support at 384x384).
    sup_canvas = (384, 384)
    sup = jnp.asarray(np.random.RandomState(1).rand(
        shots, *sup_canvas, 3).astype(np.float32))
    boxes = jnp.tile(jnp.asarray([[30.0, 40.0, 350.0, 360.0]]), (shots, 1))
    valid = jnp.ones((shots,), bool)

    @jax.jit
    def code_path(params, sup):
        return model.apply({"params": params}, sup, boxes, valid, shots,
                           False,
                           method=MetaOneStageDetector.forward_class_code)

    code_sec = _bench_fn(code_path, (params, sup))

    # Production registration path: D classes per dispatch via vmap
    # (TPU.CLASS_BATCH, evaluation/meta_eval.py) — the amortized
    # ms/class that LVIS-scale (1203-class) registration actually pays.
    cb = 8
    sup_b = jnp.asarray(np.random.RandomState(2).rand(
        cb, shots, *sup_canvas, 3).astype(np.float32))
    boxes_b = jnp.tile(boxes[None], (cb, 1, 1))
    valid_b = jnp.ones((cb, shots), bool)

    @jax.jit
    def code_path_batched(params, sup_b):
        return jax.vmap(
            lambda s, bx, v: model.apply(
                {"params": params}, s, bx, v, shots, False,
                method=MetaOneStageDetector.forward_class_code),
        )(sup_b, boxes_b, valid_b)

    code_sec_b = _bench_fn(code_path_batched, (params, sup_b), iters=10) / cb

    target_img_s = 100.0  # 4x a ~25 img/s D2-GPU R-50 FCOS baseline
    print(json.dumps({
        "metric": "meta_fcos_r50_query_images_per_sec_per_chip",
        "value": round(images_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / target_img_s, 3),
        "extra": {
            "canvas": list(canvas), "batch": batch,
            # headline code-gen latency = the DEFAULT production path
            # (TPU.CLASS_BATCH=8 vmapped registration); single-dispatch
            # kept as a secondary series (VERDICT r3 weak #3)
            "codegen_ms_per_class": round(code_sec_b * 1000, 2),
            "codegen_ms_per_class_single_dispatch":
                round(code_sec * 1000, 2),
            "device": str(jax.devices()[0].platform),
        },
    }))


if __name__ == "__main__":
    main()
