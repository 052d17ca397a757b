"""Oracle tests for the device ops against plain-numpy reference
implementations of the native kernels the reference consumes
(detectron2 ROIAlign, torchvision NMS, fvcore focal loss — SURVEY.md §2.3).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- oracles
def np_roi_align(feat_hwc, boxes, spatial_scale, P, sr):
    """Direct port of the ROIAlign(aligned=True) algorithm (detectron2
    ROIAlign_forward semantics) in numpy, O(everything) loops."""
    H, W, C = feat_hwc.shape
    out = np.zeros((len(boxes), P, P, C), np.float32)

    def bilinear(y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros(C, np.float32)
        y = min(max(y, 0.0), H - 1)
        x = min(max(x, 0.0), W - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        ly, lx = y - y0, x - x0
        return (feat_hwc[y0, x0] * (1 - ly) * (1 - lx)
                + feat_hwc[y0, x1] * (1 - ly) * lx
                + feat_hwc[y1, x0] * ly * (1 - lx)
                + feat_hwc[y1, x1] * ly * lx)

    for n, (bx1, by1, bx2, by2) in enumerate(boxes):
        x1 = bx1 * spatial_scale - 0.5
        y1 = by1 * spatial_scale - 0.5
        x2 = bx2 * spatial_scale - 0.5
        y2 = by2 * spatial_scale - 0.5
        bw, bh = (x2 - x1) / P, (y2 - y1) / P
        # sr=0 -> adaptive grid (detectron2 sampling_ratio=0 semantics)
        gh = sr if sr > 0 else int(np.ceil((y2 - y1) / P))
        gw = sr if sr > 0 else int(np.ceil((x2 - x1) / P))
        count = max(gh * gw, 1)
        for pi in range(P):
            for pj in range(P):
                acc = np.zeros(C, np.float32)
                for si in range(gh):
                    for sj in range(gw):
                        yy = y1 + (pi + (si + 0.5) / gh) * bh
                        xx = x1 + (pj + (sj + 0.5) / gw) * bw
                        acc += bilinear(yy, xx)
                out[n, pi, pj] = acc / count
    return out


def np_greedy_nms(boxes, scores, iou_th):
    """torchvision.ops.nms semantics: returns kept indices, score order."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(scores), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        a = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / np.maximum(a[i] + a - inter, 1e-9)
        suppressed |= iou > iou_th
    return keep


# ------------------------------------------------------------------ tests
class TestRoiAlign:
    def test_matches_detectron2_algorithm(self):
        from sylph_tpu.ops import roi_align
        rng = np.random.RandomState(0)
        feat = rng.randn(24, 32, 8).astype(np.float32)
        boxes = np.array([
            [10.0, 12.0, 100.0, 90.0],
            [0.0, 0.0, 64.0, 48.0],
            [50.0, 30.0, 130.0, 95.0],
            [-5.0, -5.0, 300.0, 300.0],   # partially outside
        ], np.float32)
        got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes),
                                   spatial_scale=0.25, output_size=7,
                                   sampling_ratio=2))
        want = np_roi_align(feat, boxes, 0.25, 7, 2)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_adaptive_grid_matches_detectron2(self):
        """sampling_ratio=0 (the reference's setting): per-ROI
        ceil(roi/P) grids, exact vs the oracle for grids <= max_grid.
        Box sizes chosen so grids span 1..4 and differ per axis."""
        from sylph_tpu.ops import roi_align
        rng = np.random.RandomState(3)
        feat = rng.randn(32, 40, 8).astype(np.float32)
        scale, P = 0.25, 7
        boxes = np.array([
            [10.0, 12.0, 60.0, 50.0],     # grid 1x1 on this scale
            [0.0, 0.0, 100.0, 100.0],     # ~26px/7 -> grid 1
            [2.0, 2.0, 150.0, 110.0],     # mixed axes
            [0.0, 0.0, 158.0, 126.0],     # grid ~2x2
            [-8.0, -4.0, 150.0, 100.0],   # 6x4 grid, partially outside
            [30.0, 20.0, 30.0, 80.0],     # degenerate width -> zeros
        ], np.float32)
        got = np.asarray(roi_align(
            jnp.asarray(feat), jnp.asarray(boxes), spatial_scale=scale,
            output_size=P, sampling_ratio=0, max_grid=6))
        want = np_roi_align(feat, boxes, scale, P, 0)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
        assert np.all(got[5] == 0)  # degenerate axis -> empty sample loop

    def test_adaptive_grid_cap_is_close(self):
        """Grids larger than max_grid are capped at a uniform max_grid
        sub-grid spanning the full bin — on smooth features (the realistic
        case: FPN activations, not white noise) the capped average stays
        within a few percent of the exact detectron2 average."""
        from sylph_tpu.ops import roi_align
        yy, xx = np.mgrid[0:128, 0:128].astype(np.float32)
        feat = np.stack([yy / 128, xx / 128, (yy + xx) / 256,
                         (yy * xx) / 16384], -1)
        boxes = np.array([[0.0, 0.0, 100.0, 100.0]], np.float32)  # grid 25
        capped = np.asarray(roi_align(
            jnp.asarray(feat), jnp.asarray(boxes), spatial_scale=1.0,
            output_size=4, sampling_ratio=0, max_grid=4))
        exact = np_roi_align(feat, boxes, 1.0, 4, 0)
        err = np.abs(capped - exact).max() / (np.abs(exact).max() + 1e-9)
        assert err < 0.05, err

    def test_multilevel_selects_by_area(self):
        from sylph_tpu.ops import multilevel_roi_align
        rng = np.random.RandomState(1)
        feats = [jnp.asarray(rng.randn(64 // (2 ** i), 64 // (2 ** i), 4)
                             .astype(np.float32)) for i in range(5)]
        strides = (8, 16, 32, 64, 128)
        boxes = jnp.asarray(np.array([[0, 0, 50, 50],        # small -> p3
                                      [0, 0, 500, 500]],     # large -> higher
                                     np.float32))
        valid = jnp.asarray(np.array([True, True]))
        out = multilevel_roi_align(feats, strides, boxes, valid,
                                   output_size=7)
        assert out.shape == (2, 7, 7, 4)
        # invalid boxes give zeros
        out2 = multilevel_roi_align(feats, strides, boxes,
                                    jnp.asarray([True, False]), output_size=7)
        assert np.all(np.asarray(out2)[1] == 0)


class TestNMS:
    def test_matches_greedy_oracle(self):
        from sylph_tpu.ops import nms_select
        rng = np.random.RandomState(2)
        n = 64
        ctr = rng.uniform(20, 200, (n, 2)).astype(np.float32)
        wh = rng.uniform(10, 80, (n, 2)).astype(np.float32)
        boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1)
        scores = rng.uniform(0.01, 1.0, n).astype(np.float32)

        idx, ok = nms_select(jnp.asarray(boxes), jnp.asarray(scores),
                             jnp.ones(n, bool), 0.5, max_outputs=n)
        got = [int(i) for i, o in zip(idx, ok) if o]
        want = np_greedy_nms(boxes, scores, 0.5)
        assert got == want

    def test_max_outputs_prefix(self):
        """Top-k cap after NMS == first k greedy picks."""
        from sylph_tpu.ops import nms_select
        rng = np.random.RandomState(3)
        n = 128
        ctr = rng.uniform(20, 300, (n, 2)).astype(np.float32)
        wh = rng.uniform(5, 60, (n, 2)).astype(np.float32)
        boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1)
        scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
        idx, ok = nms_select(jnp.asarray(boxes), jnp.asarray(scores),
                             jnp.ones(n, bool), 0.6, max_outputs=10)
        got = [int(i) for i, o in zip(idx, ok) if o]
        want = np_greedy_nms(boxes, scores, 0.6)[:10]
        assert got == want

    def test_batched_multiclass_separates_classes(self):
        from sylph_tpu.ops import batched_multiclass_nms
        # identical overlapping boxes, different classes: both survive
        boxes = np.tile(np.array([[10, 10, 50, 50.0]], np.float32), (2, 1))
        b = jnp.asarray(boxes[None])
        s = jnp.asarray(np.array([[0.9, 0.8]], np.float32))
        c = jnp.asarray(np.array([[0, 1]], np.int32))
        v = jnp.ones((1, 2), bool)
        ob, os_, oc, ov, oi = batched_multiclass_nms(b, s, c, v, 0.5, 4)
        assert int(np.asarray(ov).sum()) == 2

    def test_invalid_excluded(self):
        from sylph_tpu.ops import nms_select
        boxes = jnp.asarray(np.array([[0, 0, 10, 10], [100, 100, 120, 120.0]],
                                     np.float32))
        scores = jnp.asarray(np.array([0.9, 0.99], np.float32))
        valid = jnp.asarray(np.array([True, False]))
        idx, ok = nms_select(boxes, scores, valid, 0.5, 4)
        got = [int(i) for i, o in zip(idx, ok) if o]
        assert got == [0]


class TestLosses:
    def test_focal_matches_manual(self):
        from sylph_tpu.ops import sigmoid_focal_loss
        rng = np.random.RandomState(4)
        x = rng.randn(32, 5).astype(np.float32)
        t = (rng.rand(32, 5) > 0.8).astype(np.float32)
        got = np.asarray(sigmoid_focal_loss(jnp.asarray(x), jnp.asarray(t),
                                            alpha=0.25, gamma=2.0))
        p = 1 / (1 + np.exp(-x))
        ce = -(t * np.log(p) + (1 - t) * np.log(1 - p))
        pt = p * t + (1 - p) * (1 - t)
        want = ce * (1 - pt) ** 2 * (0.25 * t + 0.75 * (1 - t))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_giou_zero_for_perfect(self):
        from sylph_tpu.ops import iou_loss_ltrb
        t = jnp.asarray(np.abs(np.random.RandomState(5)
                               .randn(16, 4)).astype(np.float32))
        loss = np.asarray(iou_loss_ltrb(t, t, "giou"))
        # ious = (i+1)/(u+1) == 1 when pred == target -> loss 0
        np.testing.assert_allclose(loss, 0.0, atol=1e-6)

    def test_iou_loss_types(self):
        from sylph_tpu.ops import iou_loss_ltrb
        rng = np.random.RandomState(6)
        p = np.abs(rng.randn(8, 4)).astype(np.float32)
        t = np.abs(rng.randn(8, 4)).astype(np.float32)
        for lt in ("iou", "linear_iou", "giou"):
            loss = np.asarray(iou_loss_ltrb(jnp.asarray(p), jnp.asarray(t), lt))
            assert loss.shape == (8,)
            assert np.all(np.isfinite(loss))


class TestStructures:
    def test_pairwise_iou(self):
        from sylph_tpu.structures import pairwise_iou
        b1 = jnp.asarray(np.array([[0, 0, 10, 10.0]], np.float32))
        b2 = jnp.asarray(np.array([[0, 0, 10, 10], [5, 5, 15, 15],
                                   [20, 20, 30, 30.0]], np.float32))
        iou = np.asarray(pairwise_iou(b1, b2))[0]
        np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], rtol=1e-5)

    def test_gtboxes_pad(self):
        from sylph_tpu.structures import GTBoxes
        gt = GTBoxes.pad_from([[1, 2, 3, 4], [5, 6, 7, 8]], [3, 7], 5)
        assert gt.boxes.shape == (5, 4)
        assert int(gt.num_valid()) == 2
        assert gt.labels[1] == 7


class TestConfig:
    def test_defaults_and_merge(self, tmp_path):
        from sylph_tpu.config import get_default_cfg
        cfg = get_default_cfg()
        assert cfg.MODEL.FCOS.NUM_CLASSES == 80
        child = tmp_path / "child.yaml"
        base = tmp_path / "base.yaml"
        base.write_text("MODEL:\n  FCOS:\n    NUM_CLASSES: 60\n")
        child.write_text(f"_BASE_: {base}\nSOLVER:\n  MAX_ITER: 5\n")
        cfg.merge_from_file(str(child))
        assert cfg.MODEL.FCOS.NUM_CLASSES == 60
        assert cfg.SOLVER.MAX_ITER == 5

    def test_freeze(self):
        from sylph_tpu.config import get_default_cfg
        cfg = get_default_cfg().freeze()
        with pytest.raises(AttributeError):
            cfg.SOLVER.MAX_ITER = 1

    def test_merge_from_list(self):
        from sylph_tpu.config import get_default_cfg
        cfg = get_default_cfg()
        cfg.merge_from_list(["SOLVER.MAX_ITER", "17",
                             "MODEL.FCOS.NMS_TH", "0.5"])
        assert cfg.SOLVER.MAX_ITER == 17
        assert cfg.MODEL.FCOS.NMS_TH == 0.5


def test_eight_virtual_devices():
    assert jax.device_count() == 8
