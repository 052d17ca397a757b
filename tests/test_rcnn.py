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
