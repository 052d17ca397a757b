"""Two-stage Meta Faster R-CNN tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sylph_tpu.models.rcnn import (FewShotRCNN, build_anchor_grid,
                                   match_anchors, rpn_proposals,
                                   sample_rois, subsample_labels)
from sylph_tpu.ops.boxes import decode_deltas, encode_deltas
from sylph_tpu.structures import GTBoxes

CANVAS = (128, 128)


def test_delta_roundtrip():
    rng = np.random.RandomState(0)
    src = np.stack([rng.uniform(0, 50, 8), rng.uniform(0, 50, 8),
                    rng.uniform(60, 100, 8), rng.uniform(60, 100, 8)], -1)
    tgt = src + rng.uniform(-5, 5, src.shape)
    tgt[:, 2:] = np.maximum(tgt[:, 2:], tgt[:, :2] + 2)
    d = encode_deltas(jnp.asarray(src), jnp.asarray(tgt))
    back = decode_deltas(jnp.asarray(src), d)
    np.testing.assert_allclose(np.asarray(back), tgt, rtol=1e-4, atol=1e-3)


def test_anchor_grid_shapes():
    grid = build_anchor_grid(CANVAS, strides=(4, 8, 16, 32, 64))
    expected = sum(3 * (-(-128 // s)) ** 2 for s in (4, 8, 16, 32, 64))
    assert grid.anchors.shape == (expected, 4)
    # anchors have correct areas per level
    a0 = grid.anchors[:3]
    areas = (a0[:, 2] - a0[:, 0]) * (a0[:, 3] - a0[:, 1])
    np.testing.assert_allclose(areas, 32.0 ** 2, rtol=1e-4)


def test_match_anchors_low_quality():
    anchors = jnp.asarray([[0, 0, 10, 10], [50, 50, 80, 80],
                           [0, 0, 100, 100]], jnp.float32)
    gt = GTBoxes.pad_from(np.array([[48, 48, 82, 82]]), np.array([3]), 2)
    idx, label = match_anchors(anchors, gt)
    lab = np.asarray(label)
    assert lab[1] == 1      # best anchor for the gt (low-quality promoted)
    assert lab[0] == 0      # far anchor is negative


def test_subsample_fraction():
    label = jnp.asarray([1] * 10 + [0] * 500 + [-1] * 20)
    w = subsample_labels(label, 64, 0.25, jax.random.PRNGKey(0))
    w = np.asarray(w)
    pos_kept = w[:10].sum()
    neg_kept = w[10:510].sum()
    assert pos_kept == 10           # fewer positives than quota -> all kept
    assert abs((pos_kept + neg_kept) - 64) <= 1
    assert w[510:].sum() == 0       # ignored never sampled


def test_sample_rois_includes_gt():
    rng = np.random.RandomState(0)
    props = jnp.asarray(rng.uniform(0, 100, (50, 4)).astype(np.float32))
    props = props.at[:, 2:].set(props[:, :2] + 20)
    gt = GTBoxes.pad_from(np.array([[10, 10, 40, 40]]), np.array([2]), 4)
    rois, midx, is_pos, is_sampled = sample_rois(
        props, jnp.ones((50,), bool), gt, jax.random.PRNGKey(1),
        batch_size=16)
    assert rois.shape == (16, 4)
    # the appended gt box guarantees at least one positive
    assert int(np.asarray(is_pos).sum()) >= 1


@pytest.mark.slow
def test_rcnn_episodic_train_and_infer():
    model = FewShotRCNN(depth=18, num_classes=6, fc_dim=128,
                        compute_dtype=jnp.float32,
                        code_generator_kwargs={
                            "tower_layers": (("GN", "ReLU"),)})
    grid = build_anchor_grid(CANVAS)
    anchors = jnp.asarray(grid.anchors)
    shot, e, q = 2, 2, 1
    rng = np.random.RandomState(0)
    sup = jnp.asarray(rng.rand(e * shot, *CANVAS, 3).astype(np.float32))
    sboxes = jnp.tile(jnp.asarray([[10.0, 10.0, 90.0, 100.0]]),
                      (e * shot, 1))
    svalid = jnp.ones((e * shot,), bool)
    qry = jnp.asarray(rng.rand(e * q, *CANVAS, 3).astype(np.float32))
    qgt = GTBoxes(
        boxes=jnp.tile(jnp.asarray([[[12.0, 12.0, 80.0, 96.0]]]),
                       (e * q, 3, 1)),
        labels=jnp.tile(jnp.asarray([[1, 0, 0]], jnp.int32), (e * q, 1)),
        valid=jnp.tile(jnp.asarray([[True, False, False]]), (e * q, 1)))
    sizes = jnp.tile(jnp.asarray([[128, 128]]), (e * q, 1))
    eps_ids = jnp.asarray([1, 4], jnp.int32)

    args = (sup, sboxes, svalid, qry, qgt, eps_ids,
            jax.random.PRNGKey(0), anchors, grid.level_splits, sizes, shot)
    variables = model.init({"params": jax.random.PRNGKey(0)}, *args,
                           method=FewShotRCNN.forward_episodic_train)
    losses = model.apply(variables, *args,
                         method=FewShotRCNN.forward_episodic_train)
    assert set(losses) == {"loss_rpn_cls", "loss_rpn_loc", "loss_cls",
                           "loss_box_reg"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    # gradient flows end to end
    def total(p):
        return sum(model.apply(
            {"params": p}, *args,
            method=FewShotRCNN.forward_episodic_train).values())
    g = jax.grad(total)(variables["params"])
    gnorm = float(jax.tree.reduce(
        lambda a, b: a + float(jnp.sum(jnp.abs(b))), g, 0.0))
    assert np.isfinite(gnorm) and gnorm > 0

    # conditioned inference with a 3-class bank
    code = {"cls_conv": jnp.asarray(rng.randn(3, 128).astype(np.float32)),
            "cls_bias": jnp.zeros((3,))}
    det = model.apply(variables, qry, code, anchors, grid.level_splits,
                      sizes, method=FewShotRCNN.forward_instances,
                      rpn_post_nms=64, max_dets=10)
    assert det.boxes.shape == (e * q, 10, 4)
    cls = np.asarray(det.classes)[np.asarray(det.valid)]
    assert (cls < 3).all()


def test_cosine_output_layer_matches_manual():
    """TFA CosineSimOutputLayers (reference tfa_fast_rcnn.py:22-86):
    scores = scale * cos(x, w) with 1e-5-stabilized L2 norms."""
    from sylph_tpu.models.rcnn import ROIBoxHead

    head = ROIBoxHead(fc_dim=32, num_classes=4, cosine_sim=True,
                      cosine_scale=20.0)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(6, 7, 7, 8).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), feats)
    scores, deltas = head.apply(variables, feats)
    assert scores.shape == (6, 5) and deltas.shape == (6, 4)
    # reproduce manually from the params
    p = variables["params"]
    x = np.asarray(feats).reshape(6, -1)
    for i in (1, 2):
        x = np.maximum(
            x @ np.asarray(p[f"fc{i}"]["kernel"])
            + np.asarray(p[f"fc{i}"]["bias"]), 0)
    w = np.asarray(p["cosine_weight"])
    xn = x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-5)
    wn = w / (np.linalg.norm(w, axis=-1, keepdims=True) + 1e-5)
    np.testing.assert_allclose(np.asarray(scores), 20.0 * xn @ wn.T,
                               rtol=1e-4, atol=1e-4)
    # learnable scale variant creates the parameter at init value 20
    head2 = ROIBoxHead(fc_dim=32, num_classes=4, cosine_sim=True,
                       cosine_scale=-1.0)
    v2 = head2.init(jax.random.PRNGKey(0), feats)
    assert float(v2["params"]["cosine_scale_param"]) == 20.0


def test_tfa_rcnn_freeze_mask():
    """TFA-RCNN surgical freezing: ROI_HEADS.FREEZE_FEAT freezes only
    the box-head FCs, predictors stay trainable (tfa_rcnn.py:30-34)."""
    from sylph_tpu.train.optimizer import build_freeze_mask

    params = {
        "backbone": {"conv": {"kernel": np.zeros((1, 1, 2, 2))}},
        "rpn_head": {"conv": {"kernel": np.zeros((1, 1, 2, 2))}},
        "box_head": {"fc1": {"kernel": np.zeros((2, 2))},
                     "fc2": {"kernel": np.zeros((2, 2))},
                     "cls_score": {"kernel": np.zeros((2, 5))},
                     "bbox_pred": {"kernel": np.zeros((2, 4))}},
    }
    mask = build_freeze_mask(params, {
        "backbone": True, "proposal_generator": True,
        "roi_heads_feat": True})
    assert not mask["backbone"]["conv"]["kernel"]
    assert not mask["rpn_head"]["conv"]["kernel"]
    assert not mask["box_head"]["fc1"]["kernel"]
    assert not mask["box_head"]["fc2"]["kernel"]
    assert mask["box_head"]["cls_score"]["kernel"]
    assert mask["box_head"]["bbox_pred"]["kernel"]


@pytest.mark.slow
def test_rcnn_pretrain_and_base_inference():
    """Plain (TFA-RCNN) two-stage paths: pretrain losses + base-classifier
    inference, with the cosine classifier variant."""
    model = FewShotRCNN(depth=18, num_classes=6, fc_dim=128,
                        compute_dtype=jnp.float32, cosine_sim=True,
                        code_generator_name="none")
    grid = build_anchor_grid(CANVAS)
    anchors = jnp.asarray(grid.anchors)
    rng = np.random.RandomState(0)
    qry = jnp.asarray(rng.rand(2, *CANVAS, 3).astype(np.float32))
    qgt = GTBoxes(
        boxes=jnp.tile(jnp.asarray([[[12.0, 12.0, 80.0, 96.0]]]), (2, 3, 1)),
        labels=jnp.tile(jnp.asarray([[2, 0, 0]], jnp.int32), (2, 1)),
        valid=jnp.tile(jnp.asarray([[True, False, False]]), (2, 1)))
    sizes = jnp.tile(jnp.asarray([[128, 128]]), (2, 1))
    args = (qry, qgt, jax.random.PRNGKey(0), anchors, grid.level_splits,
            sizes)
    variables = model.init({"params": jax.random.PRNGKey(0)}, *args,
                           method=FewShotRCNN.forward_pretrain_train)
    assert "code_generator" not in variables["params"]  # TFA: no hypernet
    losses = model.apply(variables, *args,
                         method=FewShotRCNN.forward_pretrain_train)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))

    det = model.apply(variables, qry, anchors, grid.level_splits, sizes,
                      method=FewShotRCNN.forward_base_instances,
                      rpn_post_nms=64, max_dets=10)
    assert det.boxes.shape == (2, 10, 4)
    cls = np.asarray(det.classes)[np.asarray(det.valid)]
    assert (cls < 6).all()


@pytest.mark.slow
def test_rcnn_runner_train_and_meta_test(tmp_path):
    """Runner-level two-stage flow: episodic train -> class registration
    -> TWO-STAGE query inference -> AP dict (the reference
    FewShotDetector 'meta_learn_test_instance' path end to end)."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_synthetic_coco
    from sylph_tpu.data.catalog import (DatasetCatalog, MetadataCatalog,
                                        register_all_coco)
    from sylph_tpu.runner.meta_faster_rcnn_runner import MetaFasterRCNNRunner

    root = str(tmp_path / "coco")
    make_synthetic_coco(root)
    DatasetCatalog.clear()
    MetadataCatalog.clear()
    register_all_coco(root)

    runner = MetaFasterRCNNRunner()
    cfg = runner.get_default_cfg()
    n = jax.device_count()
    cfg.MODEL.META_LEARN.EPISODIC_LEARNING = True
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.META_LEARN.SHOT = 2
    cfg.MODEL.META_LEARN.EVAL_SHOT = 2
    cfg.MODEL.META_LEARN.CODE_GENERATOR.TOWER_LAYERS = [["GN", "ReLU"]]
    cfg.MODEL.META_LEARN.CODE_GENERATOR.OUT_CHANNEL = 128
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 128
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 6
    cfg.TPU.TRAIN_CANVAS = [128, 128]
    cfg.TPU.EVAL_CANVAS = [128, 160]
    cfg.TPU.SUPPORT_CANVAS = [64, 64]
    cfg.TPU.MAX_GT_BOXES = 10
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.INPUT.MIN_SIZE_TRAIN = [96]
    cfg.INPUT.MIN_SIZE_TEST = 96
    cfg.INPUT.MAX_SIZE_TEST = 160
    cfg.SOLVER.IMS_PER_BATCH = n
    cfg.SOLVER.MAX_ITER = 1
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.CHECKPOINT_PERIOD = 1
    cfg.TEST.REPEAT_TEST = 1
    # small proposal/NMS budgets: the sequential-scan NMS over 1000
    # proposals is minutes on the CPU test mesh
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 64
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    cfg.DATASETS.TRAIN = ["coco_meta_train_base"]
    cfg.DATASETS.TEST = ["coco_meta_val_novel"]
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.freeze()

    model, params = runner.build_model(cfg)
    model, state = runner.do_train(cfg, model, params)
    assert int(np.asarray(state.step)) == 1

    results = runner.do_test(cfg, model, state.params)
    bbox = results["coco_meta_val_novel"]["bbox"]
    assert "AP" in bbox and "AP_std" in bbox
    assert np.isfinite(bbox["AP"]) or np.isnan(bbox["AP"])


@pytest.mark.slow
def test_rcnn_runner_pretrain_and_plain_eval(tmp_path):
    """Non-episodic two-stage runner path (TFA-RCNN / pretrain):
    plain Faster R-CNN train step + base-classifier evaluation."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fixtures import make_synthetic_coco
    from sylph_tpu.data.catalog import (DatasetCatalog, MetadataCatalog,
                                        register_all_coco)
    from sylph_tpu.runner.meta_faster_rcnn_runner import MetaFasterRCNNRunner

    root = str(tmp_path / "coco")
    make_synthetic_coco(root)
    DatasetCatalog.clear()
    MetadataCatalog.clear()
    register_all_coco(root)

    runner = MetaFasterRCNNRunner()
    cfg = runner.get_default_cfg()
    n = jax.device_count()
    cfg.MODEL.META_LEARN.EPISODIC_LEARNING = False
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 128
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 6
    cfg.MODEL.ROI_HEADS.FREEZE_FEAT = True     # TFA-RCNN freezing
    cfg.MODEL.FCOS.L2_NORM_CLS_WEIGHT = True   # cosine classifier
    cfg.TPU.TRAIN_CANVAS = [128, 128]
    cfg.TPU.EVAL_CANVAS = [128, 160]
    cfg.TPU.SUPPORT_CANVAS = [64, 64]
    cfg.TPU.MAX_GT_BOXES = 10
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.EVAL_BATCH = 4
    cfg.INPUT.MIN_SIZE_TRAIN = [96]
    cfg.INPUT.MIN_SIZE_TEST = 96
    cfg.INPUT.MAX_SIZE_TEST = 160
    cfg.SOLVER.IMS_PER_BATCH = n
    cfg.SOLVER.MAX_ITER = 1
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.CHECKPOINT_PERIOD = 1
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 64
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 10
    cfg.DATASETS.TRAIN = ["coco_pretrain_train_base"]
    cfg.DATASETS.TEST = ["coco_pretrain_val_base"]
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.freeze()

    model, params = runner.build_model(cfg)
    assert "code_generator" not in params  # non-episodic: no hypernet
    model, state = runner.do_train(cfg, model, params)
    assert int(np.asarray(state.step)) == 1
    results = runner.do_test(cfg, model, state.params)
    assert "AP" in results["coco_pretrain_val_base"]["bbox"]
