"""Native C++ matcher vs the pure-python reference loop."""

import numpy as np

from sylph_tpu.evaluation._native import get_lib, match_greedy
from sylph_tpu.evaluation.coco_eval_np import IOU_THRS


def python_match(ious, g_ignore, g_crowd, thrs):
    nd, ng = ious.shape
    T = len(thrs)
    dt_m = -np.ones((T, nd), np.int64)
    dt_ig = np.zeros((T, nd), bool)
    for ti, t in enumerate(thrs):
        gt_m = -np.ones(ng, np.int64)
        for di in range(nd):
            best, best_gi = min(t, 1 - 1e-10), -1
            for gi in range(ng):
                if gt_m[gi] >= 0 and not g_crowd[gi]:
                    continue
                if best_gi > -1 and not g_ignore[best_gi] and g_ignore[gi]:
                    break
                if ious[di, gi] < best:
                    continue
                best, best_gi = ious[di, gi], gi
            if best_gi == -1:
                continue
            dt_ig[ti, di] = g_ignore[best_gi]
            dt_m[ti, di] = best_gi
            gt_m[best_gi] = di
    return dt_m, dt_ig


def test_native_builds():
    assert get_lib() is not None, "g++ compile of coco_matcher.cpp failed"


def test_native_matches_python_random():
    rng = np.random.RandomState(0)
    for trial in range(20):
        nd = rng.randint(1, 30)
        ng = rng.randint(1, 15)
        ious = rng.rand(nd, ng)
        g_ignore = rng.rand(ng) < 0.3
        g_crowd = g_ignore & (rng.rand(ng) < 0.5)
        # pycocotools sorts ignored GTs last; mirror that precondition
        order = np.argsort(g_ignore, kind="stable")
        ious, g_ignore, g_crowd = ious[:, order], g_ignore[order], \
            g_crowd[order]
        native = match_greedy(ious, g_ignore, g_crowd, IOU_THRS)
        assert native is not None
        ref = python_match(ious, g_ignore, g_crowd, IOU_THRS)
        np.testing.assert_array_equal(native[0], ref[0], err_msg=f"t{trial}")
        np.testing.assert_array_equal(native[1], ref[1], err_msg=f"t{trial}")
