"""Base-class all-GT code accumulation tests."""

import numpy as np
import pytest

from sylph_tpu.evaluation.meta_eval import (accumulate_base_codes,
                                            replace_with_base_codes)


def test_accumulate_weighted_mean():
    chunks = [
        {"cls_conv": np.full((1, 4), 1.0), "cls_bias": np.array([1.0])},
        {"cls_conv": np.full((1, 4), 3.0), "cls_bias": np.array([3.0])},
    ]
    out = accumulate_base_codes(chunks, [1.0, 3.0])
    np.testing.assert_allclose(out["cls_conv"], 2.5)
    np.testing.assert_allclose(out["cls_bias"], 2.5)


def test_replace_prefers_base():
    few = {0: {"code": "few0"}, 1: {"code": "few1"}}
    base = {1: {"code": "base1"}}
    out = replace_with_base_codes(few, base)
    assert out[0]["code"] == "few0"
    assert out[1]["code"] == "base1"


def test_continual_chunks_cover_all_records(tmp_path):
    from fixtures import make_synthetic_coco
    from sylph_tpu.data.catalog import (DatasetCatalog, MetadataCatalog,
                                        register_all_coco)
    from sylph_tpu.data.meta_dataset import MetaDataset

    root = str(tmp_path / "coco")
    make_synthetic_coco(root)
    DatasetCatalog.clear()
    MetadataCatalog.clear()
    register_all_coco(root)
    d = DatasetCatalog.get("coco_meta_val_base")
    ds = MetaDataset(d, "episodic_test_supportset", num_shot=2)
    items = list(ds.continual_support_items(chunk_size=3))
    # weights per class sum to 1
    by_class = {}
    for it in items:
        by_class.setdefault(it["support_set_target"], 0.0)
        by_class[it["support_set_target"]] += it["weight"]
    for cid, total in by_class.items():
        assert abs(total - 1.0) < 1e-9, cid
    assert set(by_class) == set(ds.classes)
