"""Exact-value oracle tests for the COCO/LVIS evaluation protocol.

Every AP artifact in the repo rests on ``coco_eval_np.py`` (VERDICT r4
weak #2): the existing tests are directional (GT->100, FP lowers), so a
shared protocol bug would bias all artifacts identically and invisibly.
These tests pin EXACT values, hand-derived from the pycocotools/lvis
spec the reference consumes (sylph/evaluation/coco_evaluation.py:27-178,
lvis_evaluation.py:246-251): 101-point interpolation with mid-list FPs,
stable score-tie ordering, area-range boundary inclusivity, maxDets
truncation, crowd-ignore via intersection-over-det-area, the LVIS
not-exhaustive unmatched-ignore, and the federated out-of-universe
detection drop. Each test's expected number is derived step by step in
its comments.

pycocotools conventions being pinned:
  * dets sorted by -score with a STABLE sort (mergesort) — ties keep
    insertion order (cocoeval.py evaluateImg `kind='mergesort'`);
  * precision envelope is monotone non-increasing from the right;
  * sampling: ``searchsorted(recall, recThrs, side='left')`` at 101
    points 0.00..1.00, out-of-range points contribute 0;
  * GT area range test is INCLUSIVE on both ends (`area<lo or
    area>hi` ignores), so a boundary GT counts in two buckets;
  * crowd IoU = intersection / det_area; crowd GTs never count in
    npig and matching them ignores the det.
"""

import numpy as np
import pytest

from sylph_tpu.evaluation.coco_eval_np import COCOEval, DetEvalInputs
from sylph_tpu.evaluation.evaluators import FewshotLVISEvaluator


def _ev(gts, dets, image_ids=(1,), cat_ids=(1,), **kw):
    return COCOEval(DetEvalInputs(list(gts), list(dets),
                                  list(image_ids), list(cat_ids)), **kw)


def g(img, cat, bbox, crowd=0):
    return {"image_id": img, "category_id": cat, "bbox": list(bbox),
            "area": float(bbox[2] * bbox[3]), "iscrowd": crowd}


def d(img, cat, bbox, score):
    return {"image_id": img, "category_id": cat, "bbox": list(bbox),
            "score": score}


def test_interpolation_with_midlist_fp():
    """3 GTs, det ranking [TP, FP, TP, TP] (all IoU 1.0 or 0, so every
    IoU threshold is identical).

    cum tp=[1,1,2,3] fp=[0,1,1,1] -> rc=[1/3,1/3,2/3,1],
    pr=[1, 1/2, 2/3, 3/4]. Right-to-left envelope: [1, .75, .75, .75].
    searchsorted(rc, r, 'left'): r in 0.00..0.33 (34 points) -> idx 0
    -> 1.0; r in 0.34..1.00 (67 points) -> 0.75.
    AP = 100 * (34*1.0 + 67*0.75)/101 = 8425/101 = 83.41584158...
    """
    gts = [g(1, 1, (0, 0, 10, 10)), g(1, 1, (20, 0, 10, 10)),
           g(1, 1, (40, 0, 10, 10))]
    dets = [d(1, 1, (0, 0, 10, 10), 0.9),
            d(1, 1, (60, 0, 10, 10), 0.8),     # mid-list FP
            d(1, 1, (20, 0, 10, 10), 0.7),
            d(1, 1, (40, 0, 10, 10), 0.6)]
    res = _ev(gts, dets).results()
    expected = 100.0 * (34 * 1.0 + 67 * 0.75) / 101
    assert res["AP"] == pytest.approx(expected, abs=1e-9)
    assert res["AP50"] == pytest.approx(expected, abs=1e-9)
    assert res["AP75"] == pytest.approx(expected, abs=1e-9)


def test_partial_recall_interpolation():
    """2 GTs, only one detected: rc=[0.5], pr=[1]. Recall points
    0.00..0.50 (51 of 101) sample precision 1.0, the rest fall past the
    last recall -> 0. AP = 100*51/101 = 50.4950495... — the classic
    pycocotools quirk (NOT 50.0)."""
    gts = [g(1, 1, (0, 0, 10, 10)), g(1, 1, (20, 0, 10, 10))]
    dets = [d(1, 1, (0, 0, 10, 10), 0.9)]
    res = _ev(gts, dets).results()
    assert res["AP"] == pytest.approx(100.0 * 51 / 101, abs=1e-9)
    # AR@100 = mean recall over thresholds = 0.5
    assert res["AR@100"] == pytest.approx(50.0, abs=1e-9)


def test_score_tie_keeps_insertion_order():
    """Two dets with EQUAL scores: FP inserted before TP. The protocol
    sort is stable (mergesort on -score), so the FP stays ranked first:
    rc=[0,1], pr=[0,.5], envelope [.5,.5] -> every recall point samples
    0.5 -> AP = 50.0 exactly. (An unstable/reversed sort would rank the
    TP first: rc=[1,1], pr=[1,.5] -> envelope [1,.5] -> searchsorted
    finds idx 0 for every r -> AP = 100 — this test discriminates.)"""
    gts = [g(1, 1, (0, 0, 10, 10))]
    dets = [d(1, 1, (50, 50, 10, 10), 0.5),   # FP, inserted first
            d(1, 1, (0, 0, 10, 10), 0.5)]     # TP, same score
    res = _ev(gts, dets).results()
    assert res["AP"] == pytest.approx(50.0, abs=1e-9)


def test_iou_threshold_sweep():
    """Single GT 10x10, single det 10x7.2 anchored at the same corner:
    inter = 72, union = 72 + 100 - 72 = 100 -> IoU = 0.72 exactly.
    Matches at t in {.5,.55,.6,.65,.7} (5 of 10 thresholds, AP_t=100)
    and misses at {.75...95} (AP_t=0): AP = 50.0, AP50 = 100, AP75 = 0.
    AR@100 = mean recall = 50."""
    gts = [g(1, 1, (0, 0, 10, 10))]
    dets = [d(1, 1, (0, 0, 10, 7.2), 0.9)]
    res = _ev(gts, dets).results()
    assert res["AP"] == pytest.approx(50.0, abs=1e-9)
    assert res["AP50"] == pytest.approx(100.0, abs=1e-9)
    assert res["AP75"] == pytest.approx(0.0, abs=1e-9)
    assert res["AR@100"] == pytest.approx(50.0, abs=1e-9)


def test_area_boundary_gt_counts_in_both_buckets():
    """GT area exactly 32^2=1024 sits on the small/medium boundary.
    pycocotools ignores on `area < lo or area > hi` — INCLUSIVE both
    ends — so the boundary GT is in-range for BOTH buckets: APs = APm =
    100 with a perfect det. APl has no in-range GT -> npig=0 -> NaN."""
    gts = [g(1, 1, (0, 0, 32, 32))]
    dets = [d(1, 1, (0, 0, 32, 32), 0.9)]
    res = _ev(gts, dets).results()
    assert res["APs"] == pytest.approx(100.0, abs=1e-9)
    assert res["APm"] == pytest.approx(100.0, abs=1e-9)
    assert np.isnan(res["APl"])


def test_area_range_unmatched_det_ignored_matched_gt_dropped():
    """Small-bucket accumulation: (a) a det matched to an out-of-range
    (medium) GT is dropped, not a FP; (b) an unmatched det whose own
    area is out of range is ignored, not a FP. Small GT 16x16 perfectly
    detected -> APs = 100 despite both extra dets. In the 'all' bucket
    the unmatched 100x50 det is a mid-list FP... placed LAST by score,
    after full recall, so the envelope hides it: AP(all) = 100."""
    gts = [g(1, 1, (0, 0, 16, 16)),          # small: 256
           g(1, 1, (50, 50, 64, 64))]        # medium: 4096
    dets = [d(1, 1, (0, 0, 16, 16), 0.9),    # TP (small)
            d(1, 1, (50, 50, 64, 64), 0.8),  # TP (medium)
            d(1, 1, (200, 200, 100, 50), 0.7)]  # unmatched, area 5000
    res = _ev(gts, dets).results()
    assert res["APs"] == pytest.approx(100.0, abs=1e-9)
    assert res["APm"] == pytest.approx(100.0, abs=1e-9)
    assert res["AP"] == pytest.approx(100.0, abs=1e-9)


def test_maxdets_truncation():
    """max_dets=(1,2) with ranking [TP(G1), FP, TP(G2)]: the protocol
    keeps the TOP-2 dets per (image, category), so the 3rd det (the TP
    for G2) is cut: tp=[1,1] fp=[0,1] -> rc=[.5,.5] pr=[1,.5] ->
    envelope [1,.5] -> r<=0.50 (51 pts) samples idx0 = 1.0, r>0.5 out
    of range -> 0. AP = 100*51/101. With maxDet 10 the 3rd det counts:
    rc=[.5,.5,1], pr=[1,.5,2/3] -> envelope [1,2/3,2/3] -> 51 pts at
    1.0 + 50 pts at 2/3 -> AP = 100*(51 + 100/3)/101 = 25300/303 =
    83.4983498...; AR@1 uses only the top det -> 50."""
    gts = [g(1, 1, (0, 0, 10, 10)), g(1, 1, (20, 0, 10, 10))]
    dets = [d(1, 1, (0, 0, 10, 10), 0.9),
            d(1, 1, (60, 0, 10, 10), 0.8),
            d(1, 1, (20, 0, 10, 10), 0.7)]
    res2 = _ev(gts, dets, max_dets=(1, 2)).results()
    assert res2["AP"] == pytest.approx(100.0 * 51 / 101, abs=1e-9)
    assert res2["AR@1"] == pytest.approx(50.0, abs=1e-9)
    assert res2["AR@2"] == pytest.approx(50.0, abs=1e-9)
    res10 = _ev(gts, dets, max_dets=(1, 10)).results()
    assert res10["AP"] == pytest.approx(25300.0 / 303, abs=1e-9)
    assert res10["AR@10"] == pytest.approx(100.0, abs=1e-9)


def test_crowd_iou_is_intersection_over_det_area():
    """Crowd GT [0,0,100,100] + normal GT. Det A [90,90,20,20] overlaps
    the crowd with inter=10*10=100, det_area=400 -> crowd-IoU = 0.25 <
    0.5 -> NOT crowd-matched at any threshold -> it is a genuine
    mid-list FP: rc=[0,1], pr=[0,.5] -> envelope [.5,.5] -> AP = 50.
    Det A' fully INSIDE the crowd ([10,10,20,20]: inter=400/400=1.0)
    IS crowd-matched -> ignored -> AP = 100. The pair discriminates the
    intersection-over-det-area crowd rule from plain IoU (plain IoU of
    A' vs crowd = 400/10000 = 0.04 would never match)."""
    gts = [g(1, 1, (200, 0, 10, 10)), g(1, 1, (0, 0, 100, 100), crowd=1)]
    dets_fp = [d(1, 1, (90, 90, 20, 20), 0.9),
               d(1, 1, (200, 0, 10, 10), 0.8)]
    res = _ev(gts, dets_fp).results()
    assert res["AP"] == pytest.approx(50.0, abs=1e-9)

    dets_ig = [d(1, 1, (10, 10, 20, 20), 0.9),
               d(1, 1, (200, 0, 10, 10), 0.8)]
    res = _ev(gts, dets_ig).results()
    assert res["AP"] == pytest.approx(100.0, abs=1e-9)


def test_crowd_not_counted_in_npig():
    """A crowd GT never contributes to the GT count: with only the
    crowd GT and zero dets the category has npig=0 -> AP is NaN, not
    0."""
    res = _ev([g(1, 1, (0, 0, 100, 100), crowd=1)], []).results()
    assert np.isnan(res["AP"])


def test_nonexhaustive_and_crowd_interaction():
    """LVIS not-exhaustive flag + crowd on the same (image, category):
    D1 unmatched anywhere -> ignored by the not-exhaustive rule (would
    otherwise be a leading FP -> AP 50); D2 inside the crowd -> crowd-
    matched -> ignored; D3 perfect on the real GT -> TP. rc=[1], pr=[1]
    -> AP = 100 exactly."""
    gts = [g(1, 1, (200, 0, 10, 10)), g(1, 1, (0, 0, 100, 100), crowd=1)]
    dets = [d(1, 1, (300, 300, 10, 10), 0.9),   # unmatched
            d(1, 1, (10, 10, 20, 20), 0.8),     # inside crowd
            d(1, 1, (200, 0, 10, 10), 0.7)]     # TP
    res = COCOEval(DetEvalInputs(gts, dets, [1], [1],
                                 nonexhaustive={(1, 1)})).results()
    assert res["AP"] == pytest.approx(100.0, abs=1e-9)
    # without the flag the leading FP is real: AP = 50 (envelope .5)
    res = COCOEval(DetEvalInputs(gts, dets, [1], [1])).results()
    assert res["AP"] == pytest.approx(50.0, abs=1e-9)


def test_lvis_federated_out_of_universe_drop():
    """Federated protocol: a detection for category A on an image where
    A is neither positively annotated nor in neg_category_ids is
    DROPPED before evaluation (the image is outside A's universe).
    Image 2 is out-of-universe for A, so the high-scoring det there
    must not count: AP_A = 100. If the drop were missing it would be a
    leading FP: rc=[0,1], pr=[0,.5] -> AP_A = 50 and overall AP = 75.
    Category B is annotated on image 2 (in-universe) and perfectly
    detected -> AP_B = 100. Overall AP = 100, APf (A, frequent) = 100,
    APr (B, rare) = 100."""
    metadata = {
        "thing_dataset_id_to_contiguous_id": {101: 0, 202: 1},
        "thing_classes": ["catA", "catB"],
    }
    records = [
        {"image_id": 1, "height": 100, "width": 100,
         "annotations": [{"category_id": 0, "bbox": [0, 0, 10, 10],
                          "iscrowd": 0}],
         "neg_category_ids": [], "not_exhaustive_category_ids": []},
        {"image_id": 2, "height": 100, "width": 100,
         "annotations": [{"category_id": 1, "bbox": [20, 20, 10, 10],
                          "iscrowd": 0}],
         "neg_category_ids": [], "not_exhaustive_category_ids": []},
    ]
    cats = [{"id": 101, "name": "catA", "frequency": "f"},
            {"id": 202, "name": "catB", "frequency": "r"}]
    ev = FewshotLVISEvaluator(records, metadata, categories=cats)
    ev.process([
        {"image_id": 2, "category_id": 101, "bbox": [50, 50, 10, 10],
         "score": 0.95},                      # out-of-universe for A
        {"image_id": 1, "category_id": 101, "bbox": [0, 0, 10, 10],
         "score": 0.9},                       # TP for A
        {"image_id": 2, "category_id": 202, "bbox": [20, 20, 10, 10],
         "score": 0.9},                       # TP for B
    ])
    out = ev.evaluate()["bbox"]
    assert out["AP"] == pytest.approx(100.0, abs=1e-9)
    assert out["APf"] == pytest.approx(100.0, abs=1e-9)
    assert out["APr"] == pytest.approx(100.0, abs=1e-9)
