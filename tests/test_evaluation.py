"""Evaluator oracle tests + end-to-end meta-test on the synthetic set.

Mirrors the reference's self-consistency pattern: feeding ground truth
as predictions must score AP=100 (evaluation_meta_learn_evaluation_test
.py:129-225).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from sylph_tpu.evaluation.coco_eval_np import COCOEval, DetEvalInputs
from sylph_tpu.evaluation.evaluators import (AREvaluator, COCOMetaEvaluator,
                                             COCOOWDEvaluator)

from fixtures import make_synthetic_coco, NOVEL_IDS


def _toy_gts():
    return [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 40, 40],
         "area": 1600, "iscrowd": 0},
        {"image_id": 1, "category_id": 2, "bbox": [60, 10, 30, 50],
         "area": 1500, "iscrowd": 0},
        {"image_id": 2, "category_id": 1, "bbox": [5, 5, 100, 100],
         "area": 10000, "iscrowd": 0},
    ]


def test_gt_as_dets_gives_perfect_ap():
    gts = _toy_gts()
    dets = [{**g, "score": 0.9} for g in gts]
    res = COCOEval(DetEvalInputs(gts, dets, [1, 2], [1, 2])).results()
    assert abs(res["AP"] - 100.0) < 1e-6
    assert abs(res["AP50"] - 100.0) < 1e-6
    assert abs(res["AR@100"] - 100.0) < 1e-6


def test_missed_detection_lowers_ap():
    gts = _toy_gts()
    dets = [{**g, "score": 0.9} for g in gts[:2]]  # miss image 2's gt
    res = COCOEval(DetEvalInputs(gts, dets, [1, 2], [1, 2])).results()
    # cat 1: recall 1/2 -> AP ~50; cat 2 perfect -> mean 75
    assert 70.0 < res["AP"] < 80.0


def test_false_positive_lowers_precision():
    gts = _toy_gts()
    dets = [{**g, "score": 0.9} for g in gts]
    dets.append({"image_id": 2, "category_id": 2,
                 "bbox": [0, 0, 10, 10], "score": 0.95})
    res = COCOEval(DetEvalInputs(gts, dets, [1, 2], [1, 2])).results()
    assert res["AP"] < 100.0
    assert res["AP"] > 50.0


def test_localization_quality_gradient():
    gts = _toy_gts()[:1]
    # IoU ~0.58 box: counts at low thresholds only
    dets = [{"image_id": 1, "category_id": 1, "bbox": [15, 15, 40, 40],
             "score": 0.9}]
    res = COCOEval(DetEvalInputs(gts, dets, [1], [1])).results()
    assert res["AP50"] > 99.0
    assert res["AP75"] < 1.0
    assert 0 < res["AP"] < 100


def test_crowd_gt_is_ignore_region():
    gts = [{"image_id": 1, "category_id": 1, "bbox": [0, 0, 100, 100],
            "area": 10000, "iscrowd": 1}]
    dets = [{"image_id": 1, "category_id": 1, "bbox": [10, 10, 20, 20],
             "score": 0.9}]
    res = COCOEval(DetEvalInputs(gts, dets, [1], [1])).results()
    # no real GT -> AP undefined (nan), det matched to crowd is ignored
    assert np.isnan(res["AP"])


def test_meta_evaluator_novel_base_split():
    recs = [{"image_id": 1, "height": 100, "width": 100,
             "annotations": [
                 {"bbox": [10, 10, 40, 40], "category_id": 0, "iscrowd": 0},
                 {"bbox": [50, 50, 30, 30], "category_id": 1, "iscrowd": 0},
             ]}]
    meta = {"thing_classes": ["a", "b"],
            "thing_dataset_id_to_contiguous_id": {1: 0, 8: 1}}
    ev = COCOMetaEvaluator(recs, meta, novel_dataset_ids=[1])
    ev.process([
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 40, 40],
         "score": 0.9},
        {"image_id": 1, "category_id": 8, "bbox": [50, 50, 30, 30],
         "score": 0.8},
    ])
    out = ev.evaluate()["bbox"]
    assert abs(out["nAP"] - 100.0) < 1e-6
    assert abs(out["bAP"] - 100.0) < 1e-6
    assert "AP-a" in out and "AP-b" in out


def test_owd_evaluator_class_agnostic():
    recs = [{"image_id": 1, "height": 100, "width": 100,
             "annotations": [
                 {"bbox": [10, 10, 40, 40], "category_id": 0, "iscrowd": 0}]}]
    meta = {"thing_classes": ["a"],
            "thing_dataset_id_to_contiguous_id": {1: 0}}
    ev = COCOOWDEvaluator(recs, meta)
    # detection with WRONG class but right box still scores (class-agnostic)
    ev.process([{"image_id": 1, "category_id": 99,
                 "bbox": [10, 10, 40, 40], "score": 0.9}])
    out = ev.evaluate()["bbox"]
    assert abs(out["AP"] - 100.0) < 1e-6


@pytest.mark.slow
def test_end_to_end_meta_test(tmp_path):
    """Full two-phase meta-test with a tiny model on synthetic COCO."""
    import jax
    from sylph_tpu.data.catalog import (DatasetCatalog, MetadataCatalog,
                                        register_all_coco)
    from sylph_tpu.data.mapper import EpisodicMapper
    from sylph_tpu.evaluation.meta_eval import MetaTestDriver
    from sylph_tpu.models.meta_arch import MetaOneStageDetector
    from sylph_tpu.ops.decode import DecodeCfg
    from sylph_tpu.ops.locations import build_location_grid

    root = str(tmp_path / "coco")
    make_synthetic_coco(root)
    DatasetCatalog.clear()
    MetadataCatalog.clear()
    register_all_coco(root)
    d = DatasetCatalog.get("coco_meta_val_novel")

    model = MetaOneStageDetector(
        depth=18, num_classes=8, num_cls_convs=1, num_box_convs=1,
        compute_dtype=jnp.float32,
        code_generator_kwargs={"tower_layers": (("GN", "ReLU"),)})
    shot = 2
    sup = jnp.zeros((shot, 64, 64, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), sup, jnp.zeros((shot, 4)),
        jnp.ones((shot,), bool), jnp.zeros((1, 128, 160, 3)), shot,
        method=MetaOneStageDetector.forward_episodic_train)["params"]

    mapper = EpisodicMapper(
        train_canvas=(128, 128), eval_canvas=(128, 160),
        support_canvas=(64, 64), max_gt_boxes=10, min_size_test=96,
        max_size_test=160, rand_augment=False)
    grid = build_location_grid((128, 160), (8, 16, 32, 64, 128),
                               [64, 128, 256, 512])
    driver = MetaTestDriver(
        model, params, d, mapper, grid,
        DecodeCfg(pre_nms_topk=50, post_nms_topk=10), eval_shot=shot,
        evaluator_factory=lambda recs, meta: AREvaluator(recs, meta),
        save_dir=str(tmp_path / "codes"))
    res = driver.run_once(0)
    assert "AP" in res["bbox"]
    # untrained model -> low AP, but the pipeline must be finite & complete
    assert np.isfinite(res["bbox"]["AP"]) or np.isnan(res["bbox"]["AP"])
    # code files saved per class
    import os
    assert len(os.listdir(tmp_path / "codes")) == len(NOVEL_IDS)


@pytest.mark.slow
def test_repeat_test_and_sharded_registration(tmp_path):
    """REPEAT_TEST=2 full two-phase driver: mean/std aggregation keys,
    and mesh-sharded phase-1 registration producing codes identical to
    the serial path (reference rank-sharded registration,
    meta_fcos_runner.py:381-439 + REPEAT_TEST :597-631)."""
    import jax
    from sylph_tpu.data.catalog import (DatasetCatalog, MetadataCatalog,
                                        register_all_coco)
    from sylph_tpu.data.loader import build_support_set_loader
    from sylph_tpu.data.mapper import EpisodicMapper
    from sylph_tpu.data.meta_dataset import MetaDataset
    from sylph_tpu.evaluation.meta_eval import (
        MetaTestDriver, generate_class_codes, generate_class_codes_sharded)
    from sylph_tpu.models.meta_arch import MetaOneStageDetector
    from sylph_tpu.ops.decode import DecodeCfg
    from sylph_tpu.ops.locations import build_location_grid
    from sylph_tpu.parallel.mesh import create_mesh

    root = str(tmp_path / "coco")
    make_synthetic_coco(root)
    DatasetCatalog.clear()
    MetadataCatalog.clear()
    register_all_coco(root)
    d = DatasetCatalog.get("coco_meta_val_novel")

    model = MetaOneStageDetector(
        depth=18, num_classes=8, num_cls_convs=1, num_box_convs=1,
        compute_dtype=jnp.float32,
        code_generator_kwargs={"tower_layers": (("GN", "ReLU"),)})
    shot = 2
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((shot, 64, 64, 3)),
        jnp.zeros((shot, 4)), jnp.ones((shot,), bool),
        jnp.zeros((1, 128, 160, 3)), shot,
        method=MetaOneStageDetector.forward_episodic_train)["params"]
    mapper = EpisodicMapper(
        train_canvas=(128, 128), eval_canvas=(128, 160),
        support_canvas=(64, 64), max_gt_boxes=10, min_size_test=96,
        max_size_test=160, rand_augment=False)

    # sharded registration == serial registration (same raw codes)
    mesh = create_mesh()
    ds = MetaDataset(d, "episodic_test_supportset", num_shot=shot,
                     meta_test_seed=0)
    serial = generate_class_codes(
        model, params, build_support_set_loader(ds, mapper))
    sharded = generate_class_codes_sharded(
        model, params, build_support_set_loader(ds, mapper), mesh)
    assert sorted(serial) == sorted(sharded)
    for cid in serial:
        assert serial[cid]["class_name"] == sharded[cid]["class_name"]
        np.testing.assert_allclose(
            sharded[cid]["code"]["cls_conv"],
            serial[cid]["code"]["cls_conv"], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            sharded[cid]["code"]["cls_bias"],
            serial[cid]["code"]["cls_bias"], rtol=1e-5, atol=1e-5)

    # single-device class-batched registration == serial, including a
    # zero-padded tail group (3 classes, batch 2 -> tail of 1)
    batched = generate_class_codes(
        model, params, build_support_set_loader(ds, mapper),
        class_batch=2)
    assert sorted(serial) == sorted(batched)
    for cid in serial:
        np.testing.assert_allclose(
            batched[cid]["code"]["cls_conv"],
            serial[cid]["code"]["cls_conv"], rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            batched[cid]["code"]["cls_bias"],
            serial[cid]["code"]["cls_bias"], rtol=1e-5, atol=1e-5)

    # REPEAT_TEST aggregation through the full driver (mesh-sharded)
    grid = build_location_grid((128, 160), (8, 16, 32, 64, 128),
                               [64, 128, 256, 512])
    driver = MetaTestDriver(
        model, params, d, mapper, grid,
        DecodeCfg(pre_nms_topk=50, post_nms_topk=10), eval_shot=shot,
        evaluator_factory=lambda recs, meta: AREvaluator(recs, meta),
        mesh=mesh)
    res = driver.run_repeated(2)
    assert len(res["runs"]) == 2
    for k in ("AP", "AP50"):
        assert k in res["bbox"]
        assert f"{k}_std" in res["bbox"]


def test_bf16_resident_eval_driver(tmp_path):
    """The production residency policy (TPU.EVAL_BF16_RESIDENT): the
    full two-phase driver must run with every f32 param leaf stored in
    bf16 and still emit f32-safe artifacts (saved codes, detections) —
    this guards the dtype boundaries the knob crosses on real chips,
    where it buys 202 -> 254 img/s (tools/bench_backbone_exp.py)."""
    import os

    import jax
    from sylph_tpu.data.catalog import (DatasetCatalog, MetadataCatalog,
                                        register_all_coco)
    from sylph_tpu.data.mapper import EpisodicMapper
    from sylph_tpu.evaluation.meta_eval import MetaTestDriver
    from sylph_tpu.models.meta_arch import MetaOneStageDetector
    from sylph_tpu.ops.decode import DecodeCfg
    from sylph_tpu.ops.locations import build_location_grid
    from sylph_tpu.utils.precision import bf16_resident

    root = str(tmp_path / "coco")
    make_synthetic_coco(root)
    DatasetCatalog.clear()
    MetadataCatalog.clear()
    register_all_coco(root)
    d = DatasetCatalog.get("coco_meta_val_novel")

    model = MetaOneStageDetector(
        depth=18, num_classes=8, num_cls_convs=1, num_box_convs=1,
        code_generator_kwargs={"tower_layers": (("GN", "ReLU"),)})
    shot = 2
    sup = jnp.zeros((shot, 64, 64, 3), jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), sup, jnp.zeros((shot, 4)),
        jnp.ones((shot,), bool), jnp.zeros((1, 128, 160, 3)), shot,
        method=MetaOneStageDetector.forward_episodic_train)["params"]
    params = bf16_resident(params)
    assert all(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(params)
               if jnp.issubdtype(l.dtype, jnp.floating))

    mapper = EpisodicMapper(
        train_canvas=(128, 128), eval_canvas=(128, 160),
        support_canvas=(64, 64), max_gt_boxes=10, min_size_test=96,
        max_size_test=160, rand_augment=False)
    grid = build_location_grid((128, 160), (8, 16, 32, 64, 128),
                               [64, 128, 256, 512])
    driver = MetaTestDriver(
        model, params, d, mapper, grid,
        DecodeCfg(pre_nms_topk=50, post_nms_topk=10), eval_shot=shot,
        evaluator_factory=lambda recs, meta: AREvaluator(recs, meta),
        save_dir=str(tmp_path / "codes"))
    res = driver.run_once(0)
    assert "AP" in res["bbox"]
    # saved per-class codes must stay a numpy-loadable float dtype
    codes = os.listdir(tmp_path / "codes")
    assert len(codes) == len(NOVEL_IDS)
    loaded = np.load(os.path.join(tmp_path, "codes", codes[0]))
    assert loaded["cls_conv"].dtype in (np.float32, np.float16)


def test_eval_resident_params_policy():
    """eval_resident_params: no-op on CPU / when disabled; bf16_resident
    casts only f32 leaves (ints, bools, bf16 untouched)."""
    import jax
    from sylph_tpu.config import get_default_cfg
    from sylph_tpu.utils.precision import bf16_resident, eval_resident_params

    tree = {"w": jnp.ones((2, 2), jnp.float32),
            "step": jnp.zeros((), jnp.int32),
            "mask": jnp.ones((2,), bool),
            "half": jnp.ones((2,), jnp.bfloat16)}
    cast = bf16_resident(tree)
    assert cast["w"].dtype == jnp.bfloat16
    assert cast["step"].dtype == jnp.int32
    assert cast["mask"].dtype == jnp.bool_
    assert cast["half"].dtype == jnp.bfloat16

    cfg = get_default_cfg()
    assert cfg.TPU.EVAL_BF16_RESIDENT  # production default: on
    # the suite runs on the CPU backend -> policy must be a no-op there
    if jax.default_backend() == "cpu":
        out = eval_resident_params(cfg, tree)
        assert out["w"].dtype == jnp.float32
    cfg.defrost() if hasattr(cfg, "defrost") else None
    cfg.TPU.EVAL_BF16_RESIDENT = False
    out = eval_resident_params(cfg, tree)
    assert out["w"].dtype == jnp.float32
