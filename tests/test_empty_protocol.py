"""Eval-query protocol: GT-empty images are kept and penalize FPs.

The reference appends every image to the query list unconditionally
(meta_coco.py:66-89 — ``record["annotations"] = objs`` may be empty), so
val images with no in-split GT still attract false positives at eval
time. Dropping them biases AP high; these tests pin the kept-empty
protocol end to end (loader → evaluator) and the training-side filter.
"""

import json
import os

import numpy as np
import pytest

from sylph_tpu.data.catalog import (DatasetCatalog, MetadataCatalog,
                                    register_all_coco)
from sylph_tpu.evaluation.evaluators import COCOMetaEvaluator

from fixtures import make_synthetic_coco


@pytest.fixture(scope="module")
def coco_with_empty(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco_empty")
    make_synthetic_coco(str(root), n_val=6, n_empty_val=2)
    DatasetCatalog.clear()
    MetadataCatalog.clear()
    register_all_coco(str(root))
    yield str(root)
    # module-scoped catalogs are global: leave them empty for the next
    # test module's own registration
    DatasetCatalog.clear()
    MetadataCatalog.clear()


def _n_val_images(root):
    with open(os.path.join(root, "annotations",
                           "instances_val2017.json")) as f:
        return len(json.load(f)["images"])


def test_meta_query_list_keeps_empty_images(coco_with_empty):
    """dataset[-1] must have one record per json image, empties included
    (reference meta_coco.py:88-89)."""
    d = DatasetCatalog.get("coco_meta_val_all")
    assert len(d[-1]) == _n_val_images(coco_with_empty)
    empties = [r for r in d[-1] if not r["annotations"]]
    assert len(empties) == 2


def test_pretrain_val_keeps_empty_train_filters(coco_with_empty):
    """Val pretrain records keep empties (eval protocol); the TRAIN
    loader filters them (detectron2 filter_empty semantics)."""
    from sylph_tpu.data.loader import build_pretrain_loader
    from sylph_tpu.data.mapper import EpisodicMapper

    dv = DatasetCatalog.get("coco_pretrain_val_all")
    assert len(dv["records"]) == _n_val_images(coco_with_empty)

    # feed the val records (which include empties) through the train
    # loader: every emitted batch must contain at least one valid GT
    mapper = EpisodicMapper(train_canvas=(96, 128), max_gt_boxes=5,
                            min_size_train=(96,), rand_augment=False,
                            use_scale_jitter=False)
    it = build_pretrain_loader(dv["records"], mapper, batch_size=2, seed=0)
    for _ in range(4):
        batch = next(it)
        assert batch["gt_valid"].any(axis=1).all()


def test_fp_on_gt_free_image_lowers_ap():
    """An out-of-universe detection on a GT-free image must count as a
    false positive — the reason empties are kept in the query list."""
    meta = {"thing_classes": ["a"],
            "thing_dataset_id_to_contiguous_id": {1: 0}}
    records = [
        {"image_id": 1, "height": 100, "width": 100, "file_name": "x",
         "annotations": [{"bbox": [10, 10, 20, 20], "category_id": 0,
                          "iscrowd": 0}]},
        {"image_id": 2, "height": 100, "width": 100, "file_name": "y",
         "annotations": []},
    ]
    tp = {"image_id": 1, "category_id": 1,
          "bbox": [10, 10, 20, 20], "score": 0.9}
    fp = {"image_id": 2, "category_id": 1,
          "bbox": [30, 30, 20, 20], "score": 0.95}

    ev = COCOMetaEvaluator(records, meta)
    ev.process([tp])
    ap_clean = ev.evaluate()["bbox"]["AP"]

    ev2 = COCOMetaEvaluator(records, meta)
    ev2.process([tp, fp])
    ap_fp = ev2.evaluate()["bbox"]["AP"]

    assert ap_clean == pytest.approx(100.0)
    assert ap_fp < ap_clean - 1.0, (ap_clean, ap_fp)


def test_match_anchors_exact_max_no_epsilon_band():
    """Low-quality matching uses detectron2's EXACT max-equality: an
    anchor whose IoU is within 1e-6 of (but below) a gt's best must NOT
    become positive."""
    import jax.numpy as jnp

    from sylph_tpu.models.rcnn import match_anchors
    from sylph_tpu.structures import GTBoxes

    gt = GTBoxes(boxes=jnp.asarray([[0.0, 0.0, 10.0, 10.0]]),
                 labels=jnp.asarray([0], jnp.int32),
                 valid=jnp.asarray([True]))
    # anchor 0: IoU 0.5 (the argmax); anchor 1: IoU 0.5 - ~5e-8
    anchors = jnp.asarray([[0.0, 0.0, 10.0, 5.0],
                           [0.0, 0.0, 10.0, 4.999999]])
    _, label = match_anchors(anchors, gt, lo=0.3, hi=0.7)
    label = np.asarray(label)
    assert label[0] == 1        # exact argmax -> low-quality positive
    assert label[1] == -1, label  # near-tie stays ignored
