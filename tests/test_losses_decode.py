"""Loss-key contracts, cross-device normalization, and decode behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sylph_tpu.ops.assigner import FCOSTargets
from sylph_tpu.ops.decode import DecodeCfg, decode_proposals
from sylph_tpu.ops.fcos_losses import (FCOSLossCfg, fcos_episodic_losses,
                                       fcos_pretrain_losses)
from sylph_tpu.ops.locations import build_location_grid

STRIDES = [8, 16, 32, 64, 128]
SOI = [64, 128, 256, 512]


def _fake_targets(rng, b, k, num_classes):
    labels = rng.randint(-1, num_classes, (b, k)).astype(np.int32)
    reg = rng.uniform(0.5, 8.0, (b, k, 4)).astype(np.float32)
    return FCOSTargets(labels=jnp.asarray(labels), reg_targets=jnp.asarray(reg),
                       target_inds=jnp.asarray(labels))


def _fake_preds(rng, b, k, c):
    return (jnp.asarray(rng.randn(b, k, c).astype(np.float32)),
            jnp.asarray(rng.uniform(0.1, 4.0, (b, k, 4)).astype(np.float32)),
            jnp.asarray(rng.randn(b, k).astype(np.float32)),
            jnp.asarray(rng.randn(b, k).astype(np.float32)))


@pytest.mark.parametrize("bq,expected", [
    (("ctrness",), {"loss_fcos_cls", "loss_fcos_ctr", "loss_fcos_loc"}),
    (("iou",), {"loss_fcos_cls", "loss_fcos_iou", "loss_fcos_loc"}),
    (("ctrness", "iou"),
     {"loss_fcos_cls", "loss_fcos_iou", "loss_fcos_ctr", "loss_fcos_loc"}),
])
def test_pretrain_loss_keys_match_box_quality(bq, expected):
    # Mirrors reference behavioral test modeling_meta_fcos_fcos_test.py:85-155.
    rng = np.random.RandomState(0)
    logits, reg, ctr, iou = _fake_preds(rng, 2, 64, 8)
    targets = _fake_targets(rng, 2, 64, 8)
    losses = fcos_pretrain_losses(
        logits, reg, ctr, iou, targets, FCOSLossCfg(box_quality=bq))
    assert set(losses) == expected
    for v in losses.values():
        assert np.isfinite(float(v))


def test_owd_drops_cls_loss():
    rng = np.random.RandomState(0)
    logits, reg, ctr, iou = _fake_preds(rng, 2, 64, 8)
    targets = _fake_targets(rng, 2, 64, 8)
    losses = fcos_pretrain_losses(
        logits, reg, ctr, iou, targets, FCOSLossCfg(owd=True))
    assert "loss_fcos_cls" not in losses


def test_episodic_one_hot_and_keys():
    rng = np.random.RandomState(1)
    n_way = 3
    logits, reg, ctr, _ = _fake_preds(rng, 2, 64, n_way)
    labels = rng.choice([-1, 11, 25, 40, 7], (2, 64)).astype(np.int32)
    targets = FCOSTargets(
        labels=jnp.asarray(labels),
        reg_targets=jnp.asarray(rng.uniform(0.5, 4, (2, 64, 4)).astype(np.float32)),
        target_inds=jnp.asarray(labels))
    losses = fcos_episodic_losses(
        logits, reg, ctr, targets, jnp.asarray([11, 25, 40]), FCOSLossCfg())
    assert set(losses) == {"loss_fcos_cls", "loss_fcos_loc", "loss_fcos_ctr"}
    # Gradient flows.
    grad = jax.grad(lambda lg: fcos_episodic_losses(
        lg, reg, ctr, targets, jnp.asarray([11, 25, 40]),
        FCOSLossCfg())["loss_fcos_cls"])(logits)
    assert np.isfinite(np.asarray(grad)).all()


def test_loc_loss_grads_finite_with_negative_targets_at_masked_locs():
    """Regression: reg targets at NEGATIVE locations can be negative (a
    location outside its box); the exact values below made
    ``area_union + 1 == 0`` → inf IoU at a masked location, whose NaN
    survived the ``jnp.where`` mask through the VJP (NaN·0 = NaN) and
    wiped every shared-trunk gradient after one optimizer step (observed
    live: finite losses at iter 20, fully-NaN params at iter 21). The
    reference avoids this by gathering pos_inds before the IoU math
    (fcos_outputs.py index_select); the static-shape port must be
    NaN-safe at garbage locations instead."""
    b, k, n_way = 1, 4, 2
    labels = np.full((b, k), -1, np.int32)
    labels[0, 0] = 11                      # one positive
    reg_t = np.ones((b, k, 4), np.float32)
    # captured from the live divergence: negative ltrb target at a
    # masked location, near-zero prediction
    reg_t[0, 1] = [-1.8125, 5.75, 4.1875, -3.5]
    reg_pred = np.ones((b, k, 4), np.float32)
    reg_pred[0, 1] = [0.00461592, 0.0, 0.0, 0.0]
    targets = FCOSTargets(labels=jnp.asarray(labels),
                          reg_targets=jnp.asarray(reg_t),
                          target_inds=jnp.asarray(labels))
    logits = jnp.zeros((b, k, n_way))
    ctr = jnp.zeros((b, k))
    ids = jnp.asarray([11, 25])

    def loc(rp):
        return fcos_episodic_losses(logits, rp, ctr, targets, ids,
                                    FCOSLossCfg())["loss_fcos_loc"]

    val = float(loc(jnp.asarray(reg_pred)))
    g = np.asarray(jax.grad(loc)(jnp.asarray(reg_pred)))
    assert np.isfinite(val)
    assert np.isfinite(g).all(), g
    np.testing.assert_array_equal(g[0, 1], 0.0)  # masked loc: zero grad

    # pretrain path shares the fix
    iou = jnp.zeros((b, k))
    logits8 = jnp.zeros((b, k, 8))

    def loc_pre(rp):
        return fcos_pretrain_losses(logits8, rp, ctr, iou, targets,
                                    FCOSLossCfg())["loss_fcos_loc"]

    g2 = np.asarray(jax.grad(loc_pre)(jnp.asarray(reg_pred)))
    assert np.isfinite(g2).all()


def test_cross_device_normalization_matches_single_device():
    """psum normalization must reproduce single-device math — the reference
    guarantees this with reduce_sum (fcos_outputs.py:520-523)."""
    rng = np.random.RandomState(2)
    n_dev = jax.device_count()
    b_per = 2
    logits, reg, ctr, iou = _fake_preds(rng, n_dev * b_per, 64, 8)
    targets = _fake_targets(rng, n_dev * b_per, 64, 8)

    ref = fcos_pretrain_losses(logits, reg, ctr, iou, targets, FCOSLossCfg())

    def shard_loss(lg, rg, ct, io, lb, rt):
        t = FCOSTargets(labels=lb, reg_targets=rt, target_inds=lb)
        losses = fcos_pretrain_losses(lg, rg, ct, io, t, FCOSLossCfg(),
                                      axis_name="data")
        # DDP averages gradients over ranks, so the global-equivalent loss
        # is the mean of per-rank losses.
        return {k: jax.lax.pmean(v, "data") for k, v in losses.items()}

    resh = lambda x: x.reshape(n_dev, b_per, *x.shape[1:])  # noqa: E731
    out = jax.pmap(shard_loss, axis_name="data")(
        resh(logits), resh(reg), resh(ctr), resh(iou),
        resh(targets.labels), resh(targets.reg_targets))
    for k in ref:
        np.testing.assert_allclose(float(out[k][0]), float(ref[k]),
                                   rtol=2e-5, err_msg=k)


def _decode_inputs(rng, grid, b=1, n=4):
    k = grid.num_locations
    logits = jnp.asarray(rng.randn(b, k, n).astype(np.float32) - 4.0)
    reg = jnp.asarray(rng.uniform(0.5, 3.0, (b, k, 4)).astype(np.float32))
    ctr = jnp.asarray(rng.randn(b, k).astype(np.float32) + 2.0)
    iou = jnp.asarray(rng.randn(b, k).astype(np.float32) + 2.0)
    return logits, reg, ctr, iou


def test_decode_shapes_and_validity():
    grid = build_location_grid((128, 128), STRIDES, SOI)
    rng = np.random.RandomState(3)
    logits, reg, ctr, iou = _decode_inputs(rng, grid)
    # Boost a few known candidates.
    logits = logits.at[0, 5, 1].set(4.0).at[0, 900, 2].set(5.0)
    cfg = DecodeCfg(pre_nms_topk=100, post_nms_topk=10)
    det = decode_proposals(
        logits, reg, ctr, iou,
        jnp.asarray(grid.locations), jnp.asarray(grid.strides),
        jnp.asarray(grid.level_ids), jnp.asarray([[128, 128]]),
        cfg, tuple(h * w for h, w in grid.level_sizes))
    assert det.boxes.shape == (1, 10, 4)
    v = np.asarray(det.valid[0])
    assert v.sum() >= 2
    s = np.asarray(det.scores[0])
    assert (np.diff(s[v]) <= 1e-6).all()  # sorted by score
    bx = np.asarray(det.boxes[0][v])
    assert (bx[:, 2] >= bx[:, 0]).all() and (bx[:, 3] >= bx[:, 1]).all()
    assert bx.min() >= 0.0 and bx.max() <= 128.0


def test_decode_owd_single_channel():
    grid = build_location_grid((128, 128), STRIDES, SOI)
    rng = np.random.RandomState(4)
    logits, reg, ctr, iou = _decode_inputs(rng, grid)
    cfg = DecodeCfg(pre_nms_topk=50, post_nms_topk=5, owd=True)
    det = decode_proposals(
        logits, reg, ctr, iou,
        jnp.asarray(grid.locations), jnp.asarray(grid.strides),
        jnp.asarray(grid.level_ids), jnp.asarray([[128, 128]]),
        cfg, tuple(h * w for h, w in grid.level_sizes))
    assert (np.asarray(det.classes)[np.asarray(det.valid)] == 0).all()


def test_decode_class_mask_excludes_dead_classes():
    grid = build_location_grid((128, 128), STRIDES, SOI)
    rng = np.random.RandomState(5)
    logits, reg, ctr, iou = _decode_inputs(rng, grid)
    logits = logits + 6.0  # everything passes threshold
    cfg = DecodeCfg(pre_nms_topk=64, post_nms_topk=16)
    mask = jnp.asarray([True, True, False, False])
    det = decode_proposals(
        logits, reg, ctr, iou,
        jnp.asarray(grid.locations), jnp.asarray(grid.strides),
        jnp.asarray(grid.level_ids), jnp.asarray([[128, 128]]),
        cfg, tuple(h * w for h, w in grid.level_sizes), class_valid=mask)
    cls = np.asarray(det.classes)[np.asarray(det.valid)]
    assert (cls < 2).all()


def test_decode_approx_topk_matches_exact_on_sparse_scores():
    """TPU.APPROX_TOPK (jax.lax.approx_max_k): with realistically
    sparse candidates (far fewer than pre_nms_topk strong scores) the
    approximate pre-NMS cut must select the same detections as exact
    top-k. approx_max_k only engages when the level's score count
    exceeds 4x the cut, so use a large class axis."""
    grid = build_location_grid((128, 128), STRIDES, SOI)
    rng = np.random.RandomState(5)
    k = grid.locations.shape[0]
    n = 64  # k*n >> 4*pre_nms_topk on P3
    logits = jnp.asarray(rng.randn(1, k, n).astype(np.float32) * 0.3 - 5.0)
    for loc, cls in ((5, 1), (900, 31), (40, 63), (250, 7)):
        logits = logits.at[0, loc, cls].set(4.0 + 0.1 * cls)
    reg = jnp.asarray(
        rng.uniform(0.5, 4.0, (1, k, 4)).astype(np.float32))
    ctr = jnp.asarray(rng.randn(1, k).astype(np.float32))
    iou = jnp.asarray(rng.randn(1, k).astype(np.float32))
    args = (jnp.asarray(grid.locations), jnp.asarray(grid.strides),
            jnp.asarray(grid.level_ids), jnp.asarray([[128, 128]]))
    splits = tuple(h * w for h, w in grid.level_sizes)

    exact = decode_proposals(logits, reg, ctr, iou, *args,
                             DecodeCfg(pre_nms_topk=100), splits)
    approx = decode_proposals(logits, reg, ctr, iou, *args,
                              DecodeCfg(pre_nms_topk=100,
                                        approx_topk=True), splits)
    ve, va = np.asarray(exact.valid[0]), np.asarray(approx.valid[0])
    assert ve.sum() == va.sum() > 0
    np.testing.assert_allclose(np.asarray(exact.boxes[0])[ve],
                               np.asarray(approx.boxes[0])[va], atol=1e-5)
    np.testing.assert_allclose(np.asarray(exact.scores[0])[ve],
                               np.asarray(approx.scores[0])[va], atol=1e-6)
    assert (np.asarray(exact.classes[0])[ve]
            == np.asarray(approx.classes[0])[va]).all()
