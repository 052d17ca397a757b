"""Data-layer contract tests (mirrors the reference loader tests,
test_runner_meta_fcos_runner_data_loader.py:59-133, plus determinism)."""

import numpy as np
import pytest

from sylph_tpu.data.catalog import DatasetCatalog, MetadataCatalog, \
    register_all_coco
from sylph_tpu.data.loader import (build_episodic_train_loader,
                                   build_query_loader,
                                   build_support_set_loader)
from sylph_tpu.data.mapper import EpisodicMapper
from sylph_tpu.data.meta_dataset import MetaDataset

from fixtures import make_synthetic_coco, ALL_IDS, NOVEL_IDS


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    make_synthetic_coco(str(root))
    DatasetCatalog.clear()
    MetadataCatalog.clear()
    register_all_coco(str(root))
    return str(root)


@pytest.fixture(scope="module")
def mapper():
    return EpisodicMapper(train_canvas=(128, 128), eval_canvas=(128, 160),
                          support_canvas=(64, 64), max_gt_boxes=10,
                          min_size_train=(96,), min_size_test=96,
                          max_size_test=160, rand_augment=False)


def test_registration_names(coco_root):
    names = DatasetCatalog.list()
    assert "coco_meta_val_novel" in names
    assert "coco_meta_train_base" in names
    assert "coco_pretrain_train_base" in names


def test_meta_dict_structure(coco_root):
    d = DatasetCatalog.get("coco_meta_val_novel")
    assert "metadata" in d and -1 in d
    meta = d["metadata"]
    assert len(meta["thing_classes"]) == len(NOVEL_IDS)
    # support per class present, anns filtered to that class
    for cid in range(len(NOVEL_IDS)):
        assert cid in d and len(d[cid]) > 0
        for rec in d[cid]:
            assert all(a["category_id"] == cid for a in rec["annotations"])
    # query has full annotations
    assert len(d[-1]) > 0


def test_episodic_train_batch(coco_root, mapper):
    d = DatasetCatalog.get("coco_meta_train_base")
    ds = MetaDataset(d, "episodic_train_both", num_shot=2, num_query_shot=1)
    loader = build_episodic_train_loader(ds, mapper, episodes_per_batch=2,
                                         seed=0)
    batch = next(iter(loader))
    assert batch["support_images"].shape == (4, 64, 64, 3)
    assert batch["support_boxes"].shape == (4, 4)
    assert batch["query_images"].shape == (2, 128, 128, 3)
    assert batch["query_gt_boxes"].shape == (2, 10, 4)
    assert batch["episode_class_ids"].shape == (2,)
    assert batch["support_box_valid"].all()
    # boxes are valid XYXY inside the canvas
    b = batch["support_boxes"]
    assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()
    assert b.min() >= 0 and b.max() <= 64


def test_support_loader_deterministic(coco_root, mapper):
    d = DatasetCatalog.get("coco_meta_val_novel")
    ds1 = MetaDataset(d, "episodic_test_supportset", num_shot=3,
                      meta_test_seed=0)
    ds2 = MetaDataset(d, "episodic_test_supportset", num_shot=3,
                      meta_test_seed=0)
    a = ds1._test_support_item(0)
    b = ds2._test_support_item(0)
    assert [r["image_id"] for r in a["support_set"]] == \
           [r["image_id"] for r in b["support_set"]]
    # different meta_test_seed -> (almost surely) different support picks
    ds3 = MetaDataset(d, "episodic_test_supportset", num_shot=3,
                      meta_test_seed=7)
    c = ds3._test_support_item(0)
    assert a["class_name"] == c["class_name"]

    items = list(build_support_set_loader(ds1, mapper))
    assert len(items) == len(NOVEL_IDS)
    assert items[0]["support_images"].shape == (3, 64, 64, 3)


def test_support_loader_class_sharding(coco_root, mapper):
    d = DatasetCatalog.get("coco_meta_val_novel")
    ds = MetaDataset(d, "episodic_test_supportset", num_shot=2)
    all_classes = [it["class_id"]
                   for it in build_support_set_loader(ds, mapper)]
    sharded = []
    for rank in range(2):
        sharded += [it["class_id"] for it in build_support_set_loader(
            ds, mapper, rank=rank, world_size=2)]
    assert sorted(sharded) == sorted(all_classes)


def test_query_loader_padding(coco_root, mapper):
    d = DatasetCatalog.get("coco_meta_val_novel")
    ds = MetaDataset(d, "episodic_test_queryset", num_shot=2)
    batches = list(build_query_loader(ds, mapper, batch_size=3))
    total = sum(int(b["batch_valid"].sum()) for b in batches)
    assert total == len(ds.query)
    for b in batches:
        assert b["images"].shape == (3, 128, 160, 3)
        assert b["image_sizes"].shape == (3, 2)


def test_sylph_test_mode_truncates_val(coco_root):
    # conftest sets SYLPH_TEST_MODE=1 -> val query capped at 10
    d = DatasetCatalog.get("coco_meta_val_base")
    assert len(d[-1]) <= 10


def test_prefetch_propagates_worker_exception():
    """A decode/augment failure must surface in the consumer, not
    silently truncate the stream (ADVICE r1)."""
    import pytest
    from sylph_tpu.data.loader import _prefetch

    def gen():
        yield 1
        yield 2
        raise FileNotFoundError("missing.jpg")

    it = _prefetch(gen)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(FileNotFoundError):
        next(it)


def test_prefetch_clean_stop():
    from sylph_tpu.data.loader import _prefetch
    assert list(_prefetch(lambda: iter(range(5)))) == list(range(5))


def test_prefetch_worker_exits_on_abandon():
    """Dropping a prefetched iterator must release its worker thread;
    a worker parked forever in q.put leaks depth+1 batches per
    abandoned loader (observed as suite-wide memory creep)."""
    import threading
    import time

    from sylph_tpu.data.loader import _prefetch

    started = threading.Event()
    finished = threading.Event()

    def gen():
        started.set()
        try:
            while True:
                yield 0
        finally:
            finished.set()

    it = _prefetch(gen, depth=1)
    assert next(it) == 0
    assert started.is_set()
    it.close()  # GeneratorExit -> finally -> cancelled.set()
    deadline = time.time() + 5.0
    while not finished.is_set() and time.time() < deadline:
        time.sleep(0.05)
    assert finished.is_set(), "prefetch worker did not exit after close()"


def test_resize_scale_crop_matches_two_step():
    """The fused PIL box-resize must reproduce the two-step
    resize_scale + fixed_size_crop pipeline: same rng stream, same box
    math, same bilinear samples (PIL maps ``box`` linearly onto the
    output, so sample positions coincide exactly)."""
    from sylph_tpu.data import transforms as T

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (200, 260, 3), np.uint8)
    boxes = np.array([[20.0, 30, 120, 150], [5, 5, 30, 40]], np.float32)
    labels = np.array([1, 2], np.int64)
    for scale in (0.4, 0.9, 1.7):  # shrink-below-canvas / near / crop
        i1, b1 = T.resize_scale(img, boxes, scale, (96, 128))
        i1, b1, l1 = T.fixed_size_crop(i1, b1, labels, (96, 128),
                                       np.random.RandomState(7))
        i2, b2, l2 = T.resize_scale_crop(img, boxes, labels, scale,
                                         (96, 128),
                                         np.random.RandomState(7))
        assert i1.shape == i2.shape and np.array_equal(l1, l2)
        np.testing.assert_allclose(b1, b2, atol=1e-4)
        # identical sample positions -> identical pixels (PIL may round
        # coefficient tables slightly differently; allow +-1 LSB)
        assert np.abs(i1.astype(int) - i2.astype(int)).max() <= 1


def test_jpeg_draft_decode_box_prescale(tmp_path):
    """Draft decode returns a 1/2^k-scaled image plus the box prescale
    that keeps annotation geometry consistent (normalized box position
    unchanged)."""
    from PIL import Image

    from sylph_tpu.data.mapper import _load_image

    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (640, 800, 3), np.uint8)
    path = str(tmp_path / "big.jpg")
    Image.fromarray(img).save(path, quality=90)
    rec = {"file_name": path}
    full, pre_full = _load_image(rec)
    assert pre_full == 1.0 and full.shape == (640, 800, 3)
    small, pre = _load_image(rec, target_short=200, target_max=260)
    # 640x800 -> target scale 260/800=0.325 -> draft halves twice is
    # below target, once (320x400) stays above it
    assert small.shape == (320, 400, 3)
    np.testing.assert_allclose(pre, [0.5, 0.5, 0.5, 0.5])
    box = np.array([[80.0, 160, 400, 480]], np.float32)
    np.testing.assert_allclose((box * pre) / np.array([400, 320, 400, 320]),
                               box / np.array([800, 640, 800, 640]))
    # draft never produces an image below the resize target
    assert min(small.shape[:2]) >= 200 or max(small.shape[:2]) >= 260


def test_support_loader_items_survive_full_consumption():
    """Registration groups TPU.CLASS_BATCH support items at a time, so
    the support loader must yield arrays the consumer can HOLD — not
    views of a small reuse ring. Regression: with an 8-deep buffer pool
    here, items 0-7 of a 16-class run were silently overwritten by
    items 8-15 before the grouping consumed them."""
    from sylph_tpu.data.loader import build_support_set_loader

    NC = 16
    d = {"metadata": {"thing_classes": [f"c{i}" for i in range(NC)]}}
    for ci in range(NC):
        img = np.full((64, 64, 3), 10 + ci * 13, np.uint8)
        d[ci] = [{"file_name": f"/nonexistent_{ci}.jpg", "image": img,
                  "image_id": ci, "height": 64, "width": 64,
                  "annotations": [{"bbox": [4, 4, 40, 40],
                                   "category_id": ci}]}]
    d[-1] = [r for ci in range(NC) for r in d[ci]]
    ds = MetaDataset(d, "episodic_test_supportset", num_shot=2,
                     meta_test_seed=0)
    m = EpisodicMapper(support_canvas=(64, 64), train_canvas=(96, 96),
                       eval_canvas=(96, 96))
    items = list(build_support_set_loader(ds, m))  # hold ALL items
    assert len(items) == NC
    for it in items:
        expect = 10 + it["class_id"] * 13
        got = int(it["support_images"][0, 8, 8, 2])  # BGR: ch 2 == R
        assert got == expect, (it["class_id"], expect, got)


def test_episodic_loader_retain_contract():
    """A consumer may hold up to ``retain`` episodic batches (the
    K-step-scan runner does); the reuse ring must not rewrite them."""
    d = {"metadata": {"thing_classes": ["a", "b"]}}
    for ci in range(2):
        img = np.full((48, 48, 3), 40 + ci * 100, np.uint8)
        d[ci] = [{"file_name": f"/none_{ci}.jpg", "image": img,
                  "image_id": ci, "height": 48, "width": 48,
                  "annotations": [{"bbox": [4, 4, 30, 30],
                                   "category_id": ci}]}]
    d[-1] = [r for ci in range(2) for r in d[ci]]
    ds = MetaDataset(d, "episodic_train_both", num_shot=1,
                     num_query_shot=1)
    m = EpisodicMapper(support_canvas=(48, 48), train_canvas=(48, 48),
                       eval_canvas=(48, 48), rand_augment=False,
                       use_scale_jitter=False, min_size_train=(48,),
                       max_size_train=48)
    k = 16
    loader = build_episodic_train_loader(ds, m, episodes_per_batch=1,
                                         seed=0, retain=k)
    it = iter(loader)
    group = [next(it) for _ in range(k)]  # hold k batches, like the scan
    snap = [g["query_images"].copy() for g in group]
    for _ in range(3):  # produce more batches into the ring
        next(it)
    for g, s in zip(group, snap):
        np.testing.assert_array_equal(g["query_images"], s)


def test_repeat_factor_image_sampler():
    """detectron2 RepeatFactorTrainingSampler semantics at image level:
    r(I) = max_c max(1, sqrt(t/f(c))); rare images repeat more."""
    from sylph_tpu.data.samplers import RepeatFactorImageSampler

    # 10 images: category 7 in every image (f=1), category 9 in one (f=0.1)
    records = [{"annotations": [{"category_id": 7}]} for _ in range(9)]
    records.append({"annotations": [{"category_id": 7},
                                    {"category_id": 9}]})
    t = 0.5
    s = RepeatFactorImageSampler(records, repeat_thresh=t, seed=0)
    np.testing.assert_allclose(s.repeat_factors[:9], 1.0)
    np.testing.assert_allclose(s.repeat_factors[9], np.sqrt(t / 0.1))
    # over many epochs the rare image appears ~sqrt(5)x as often
    it = iter(s)
    draws = [next(it) for _ in range(10000)]
    counts = np.bincount(draws, minlength=10)
    ratio = counts[9] / counts[:9].mean()
    assert 1.8 < ratio < 2.7, ratio  # sqrt(5) ~ 2.24


def test_epoch_shuffle_sampler_covers_each_epoch():
    from sylph_tpu.data.samplers import EpochShuffleSampler

    it = iter(EpochShuffleSampler(7, seed=1))
    epoch1 = [next(it) for _ in range(7)]
    epoch2 = [next(it) for _ in range(7)]
    assert sorted(epoch1) == list(range(7))
    assert sorted(epoch2) == list(range(7))
    assert epoch1 != epoch2  # reshuffled


def test_pretrain_loader_deterministic(coco_root, mapper):
    """Same seed -> identical batches (thread pool notwithstanding);
    records cycle in epoch order."""
    from sylph_tpu.data.catalog import DatasetCatalog
    from sylph_tpu.data.loader import build_pretrain_loader

    data = DatasetCatalog.get("coco_pretrain_train_base")
    it1 = build_pretrain_loader(data["records"], mapper, batch_size=4,
                                seed=3)
    it2 = build_pretrain_loader(data["records"], mapper, batch_size=4,
                                seed=3)
    for _ in range(3):
        b1, b2 = next(it1), next(it2)
        np.testing.assert_array_equal(b1["images"], b2["images"])
        np.testing.assert_array_equal(b1["gt_boxes"], b2["gt_boxes"])


def test_joint_pretrain_downsamples_novel(coco_root):
    """coco_pretrain_train_all: full base GT, novel classes limited to
    TRAIN_SHOT annotations (reference joint-pretrain protocol)."""
    from collections import Counter
    from sylph_tpu.data.catalog import DatasetCatalog
    from sylph_tpu.data.class_splits import coco_split_ids

    shot = 2
    data = DatasetCatalog.get("coco_pretrain_train_all", shot=shot)
    id_map = data["metadata"]["thing_dataset_id_to_contiguous_id"]
    novel_cids = {id_map[d] for d in coco_split_ids("novel") if d in id_map}
    counts = Counter()
    for r in data["records"]:
        counts.update(a["category_id"] for a in r["annotations"])
    full = DatasetCatalog.get("coco_pretrain_train_all", shot=10 ** 9)
    full_counts = Counter()
    for r in full["records"]:
        full_counts.update(a["category_id"] for a in r["annotations"])
    for cid, n in counts.items():
        if cid in novel_cids:
            assert n <= shot, (cid, n)
        else:
            assert n == full_counts[cid]  # base classes untouched
    # determinism
    again = DatasetCatalog.get("coco_pretrain_train_all", shot=shot)
    assert [r["image_id"] for r in again["records"]] == \
        [r["image_id"] for r in data["records"]]


def test_fewshot_finetune_subset_respects_shot(coco_root):
    from collections import Counter
    from sylph_tpu.data.catalog import DatasetCatalog

    data = DatasetCatalog.get("coco_pretrain_finetune_all", shot=3)
    counts = Counter()
    for r in data["records"]:
        counts.update(a["category_id"] for a in r["annotations"])
    assert counts and max(counts.values()) <= 3
