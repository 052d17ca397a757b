"""Target assignment vs an independent numpy oracle.

The oracle re-derives the reference semantics (fcos_outputs.py:140-349)
per-image with plain numpy loops; the batched XLA assigner must agree.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sylph_tpu.ops.assigner import (assign_fcos_targets,
                                    assign_fcos_targets_batch,
                                    compute_ctrness_targets)
from sylph_tpu.ops.locations import INF, build_location_grid
from sylph_tpu.structures import GTBoxes

STRIDES = [8, 16, 32, 64, 128]
SOI = [64, 128, 256, 512]


def oracle_assign(grid, boxes, labels, center_sample, radius):
    K = grid.num_locations
    out_labels = np.full((K,), -1, np.int64)
    out_reg = np.zeros((K, 4), np.float32)
    if len(boxes) == 0:
        return out_labels, out_reg
    xs, ys = grid.locations[:, 0], grid.locations[:, 1]
    area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for k in range(K):
        best_area, best_i = INF, -1
        for i, bx in enumerate(boxes):
            l = xs[k] - bx[0]
            t = ys[k] - bx[1]
            r = bx[2] - xs[k]
            b = bx[3] - ys[k]
            if center_sample:
                cx, cy = (bx[0] + bx[2]) / 2, (bx[1] + bx[3]) / 2
                s = grid.strides[k] * radius
                x1, y1 = max(cx - s, bx[0]), max(cy - s, bx[1])
                x2, y2 = min(cx + s, bx[2]), min(cy + s, bx[3])
                inside = (xs[k] - x1 > 0 and ys[k] - y1 > 0
                          and x2 - xs[k] > 0 and y2 - ys[k] > 0)
            else:
                inside = min(l, t, r, b) > 0
            mx = max(l, t, r, b)
            lo, hi = grid.size_ranges[k]
            if inside and lo <= mx <= hi and area[i] < best_area:
                best_area, best_i = area[i], i
        if best_i >= 0:
            bx = boxes[best_i]
            out_labels[k] = labels[best_i]
            out_reg[k] = np.array([
                xs[k] - bx[0], ys[k] - bx[1], bx[2] - xs[k], bx[3] - ys[k],
            ]) / grid.strides[k]
    return out_labels, out_reg


@pytest.mark.parametrize("center_sample", [True, False])
def test_assignment_matches_oracle(center_sample):
    grid = build_location_grid((128, 128), STRIDES, SOI)
    rng = np.random.RandomState(0)
    n = 6
    x1 = rng.uniform(0, 100, n)
    y1 = rng.uniform(0, 100, n)
    boxes = np.stack([x1, y1,
                      x1 + rng.uniform(5, 120, n),
                      y1 + rng.uniform(5, 120, n)], -1).astype(np.float32)
    labels = rng.randint(0, 10, n).astype(np.int32)

    gt = GTBoxes.pad_from(boxes, labels, max_boxes=8)
    res = assign_fcos_targets(
        jnp.asarray(grid.locations), jnp.asarray(grid.strides),
        jnp.asarray(grid.size_ranges), gt,
        center_sample=center_sample, radius=1.5)

    exp_labels, exp_reg = oracle_assign(grid, boxes, labels, center_sample, 1.5)
    np.testing.assert_array_equal(np.asarray(res.labels), exp_labels)
    fg = exp_labels >= 0
    np.testing.assert_allclose(np.asarray(res.reg_targets)[fg],
                               exp_reg[fg], rtol=1e-5, atol=1e-5)


def test_empty_gt_all_background():
    grid = build_location_grid((128, 128), STRIDES, SOI)
    gt = GTBoxes.pad_from(np.zeros((0, 4)), np.zeros((0,)), max_boxes=4)
    res = assign_fcos_targets(
        jnp.asarray(grid.locations), jnp.asarray(grid.strides),
        jnp.asarray(grid.size_ranges), gt)
    assert int((np.asarray(res.labels) >= 0).sum()) == 0


def test_batch_matches_single():
    grid = build_location_grid((128, 128), STRIDES, SOI)
    rng = np.random.RandomState(1)
    batch = []
    for _ in range(3):
        n = rng.randint(1, 5)
        x1 = rng.uniform(0, 80, n)
        y1 = rng.uniform(0, 80, n)
        boxes = np.stack([x1, y1, x1 + rng.uniform(8, 60, n),
                          y1 + rng.uniform(8, 60, n)], -1)
        batch.append(GTBoxes.pad_from(boxes, rng.randint(0, 5, n), 6))
    import jax
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batch)
    bres = assign_fcos_targets_batch(
        jnp.asarray(grid.locations), jnp.asarray(grid.strides),
        jnp.asarray(grid.size_ranges), stacked)
    for i, g in enumerate(batch):
        single = assign_fcos_targets(
            jnp.asarray(grid.locations), jnp.asarray(grid.strides),
            jnp.asarray(grid.size_ranges), g)
        np.testing.assert_array_equal(np.asarray(bres.labels[i]),
                                      np.asarray(single.labels))


def test_ctrness_targets():
    # centered location -> ctrness 1; edge -> 0.
    reg = jnp.array([[10.0, 10.0, 10.0, 10.0], [0.0, 5.0, 20.0, 5.0]])
    ctr = np.asarray(compute_ctrness_targets(reg))
    assert abs(ctr[0] - 1.0) < 1e-6
    assert ctr[1] < 1e-3
