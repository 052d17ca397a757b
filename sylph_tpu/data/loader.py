"""Batch assembly + prefetching loaders.

The TPU analog of the reference's four loader builders
(data/build.py:424-763). Each loader emits pytrees of fixed-shape numpy
arrays matching the train/eval step contracts (train/steps.py,
evaluation/meta_eval.py); a small thread pool decodes/augments ahead of
the device (replacing torch DataLoader worker processes — JAX dispatch
is async, so a thread pipeline keeps the chip fed without IPC).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

from .mapper import EpisodicMapper
from .meta_dataset import MetaDataset
from .samplers import (EpochShuffleSampler, RepeatFactorClassSampler,
                       RepeatFactorImageSampler, TrainingClassSampler)

# Shared decode/augment pool: PIL releases the GIL in its C decode and
# resample paths, so threads scale (the reference used torch DataLoader
# worker *processes* for the same purpose).
_POOL = ThreadPoolExecutor(max_workers=8)


class _BufferPool:
    """Ring of reusable batch image buffers the mappers write into.

    Fresh numpy allocations pay first-touch page faults, and on
    memory-ballooned VM hosts those throttle to ~7-30 MB/s — measured
    here, a 200 MB batch stack took 11 s freshly allocated vs ~1 s into
    a warm buffer. Recycling the batch canvases keeps every page warm
    after the first lap (torch's DataLoader gets the same effect from
    its pinned-memory ring).

    CONTRACT: a yielded buffer is rewritten after ``depth - 1`` further
    batches are produced. Depth must therefore exceed every stage that
    can hold a batch at once: the loader prefetch queue (``prefetch``)
    + batches the consumer retains (``retain``) + the one being filled
    (1), plus the runner's device-batch prefetch (2) and the in-flight
    step (1) in case the PJRT client reads the host buffer lazily
    during transfer — loaders size it ``retain + prefetch + 4``. Consumers that accumulate MORE batches than the loader's
    advertised ``retain`` must copy (see the registration grouping bug
    regression test, tests/test_data.py).
    """

    def __init__(self, shape, dtype=np.uint8, depth: int = 8):
        self._bufs = [np.zeros(shape, dtype) for _ in range(depth)]
        self._i = 0

    def next(self) -> np.ndarray:
        buf = self._bufs[self._i]
        self._i = (self._i + 1) % len(self._bufs)
        return buf


def _prefetch(gen_fn, depth: int = 2):
    """Run a generator on a daemon thread with a bounded queue.

    A decode/augment exception is forwarded to the consumer and
    re-raised there — NOT swallowed into an early stop-of-iteration
    (a silently truncated query set would skew AP; a silently shortened
    train stream would end training early).

    Abandoning the iterator (``.close()``, garbage collection, or an
    exception in the consumer loop) cancels the worker: without this,
    every dropped loader left a thread parked forever in ``q.put``
    holding ``depth+1`` decoded batches — across a test suite or a
    periodic-eval train loop those leaked buffers add up to real memory.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = object()
    cancelled = threading.Event()

    def _put(item) -> bool:
        while not cancelled.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                pass
        return False

    def worker():
        try:
            for item in gen_fn():
                if not _put(item):
                    return
        except BaseException as e:  # noqa: BLE001 — forwarded, not dropped
            _put((stop, e))
        else:
            _put((stop, None))

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if isinstance(item, tuple) and len(item) == 2 and item[0] is stop:
                if item[1] is not None:
                    raise item[1]
                return
            yield item
    finally:
        cancelled.set()


def build_episodic_train_loader(
    dataset: MetaDataset, mapper: EpisodicMapper, *, episodes_per_batch: int,
    seed: int = 0, sampler: str = "TrainingSampler",
    repeat_thresh: float = 0.001, prefetch: int = 2, retain: int = 2,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite episodic batches (reference
    build_meta_detection_train_loader, data/build.py:424-492).

    Batch layout == make_episodic_train_step contract: E episodes, each
    SHOT support + QUERY_SHOT query of one class.

    ``retain``: max batches the consumer holds at once (the K-step-scan
    runner groups TPU.STEPS_PER_CALL of them) — sizes the reuse ring so
    a held batch is never rewritten (_BufferPool contract).
    """
    if sampler == "RepeatFactorTrainingSampler":
        counts = {c: len(dataset.support[c]) for c in dataset.classes}
        class_iter = iter(RepeatFactorClassSampler(
            counts, repeat_thresh, seed))
    else:
        class_iter = iter(TrainingClassSampler(len(dataset.classes), seed))
    rng = np.random.RandomState(seed + 1)

    def gen():
        sup_pool = qry_pool = None
        while True:
            sup_recs, qry_recs, class_ids = [], [], []
            for _ in range(episodes_per_batch):
                ci = next(class_iter)
                item = dataset._train_item(ci)
                class_ids.append(item["support_set_target"])
                sup_recs.extend(item["support_set"])
                qry_recs.extend(item["query_set"])
            if sup_pool is None:
                sup_pool = _BufferPool(
                    (len(sup_recs), *mapper.support_canvas, 3),
                    depth=retain + prefetch + 4)
                qry_pool = _BufferPool(
                    (len(qry_recs), *mapper.train_canvas, 3),
                    depth=retain + prefetch + 4)
            sup_buf, qry_buf = sup_pool.next(), qry_pool.next()
            # per-record RNG seeds keep results deterministic under the
            # thread pool (futures complete out of order)
            seeds = rng.randint(0, 2 ** 31, len(sup_recs) + len(qry_recs))
            sup_f = [_POOL.submit(
                mapper.map_support, r, np.random.RandomState(s), True,
                sup_buf[i])
                for i, (r, s) in enumerate(
                    zip(sup_recs, seeds[:len(sup_recs)]))]
            qry_f = [_POOL.submit(
                mapper.map_query_train, r, np.random.RandomState(s),
                qry_buf[i])
                for i, (r, s) in enumerate(
                    zip(qry_recs, seeds[len(sup_recs):]))]
            sup = [f.result() for f in sup_f]
            qmaps = [f.result() for f in qry_f]
            sup_boxes = [m["box"] for m in sup]
            sup_valid = [m["box_valid"] for m in sup]
            qry = {k: [m[k] for m in qmaps]
                   for k in ("gt_boxes", "gt_labels", "gt_valid")}
            batch = {
                "support_images": sup_buf,
                "support_boxes": np.stack(sup_boxes),
                "support_box_valid": np.asarray(sup_valid, bool),
                "query_images": qry_buf,
                "query_gt_boxes": np.stack(qry["gt_boxes"]),
                "query_gt_labels": np.stack(qry["gt_labels"]).astype(np.int32),
                "query_gt_valid": np.stack(qry["gt_valid"]),
                "episode_class_ids": np.asarray(class_ids, np.int32),
            }
            if "aug_ops" in qmaps[0]:
                # device-side RandAugment (ops/image_aug.py): the host
                # drew op ids/params, the train step applies them
                batch["query_aug_ops"] = np.stack(
                    [m["aug_ops"] for m in qmaps])
                batch["query_aug_params"] = np.stack(
                    [m["aug_params"] for m in qmaps])
                batch["query_image_sizes"] = np.stack(
                    [m["image_size"] for m in qmaps])
            yield batch

    return _prefetch(gen, prefetch)


def build_pretrain_loader(
    records, mapper: EpisodicMapper, *, batch_size: int, seed: int = 0,
    sampler: str = "TrainingSampler", repeat_thresh: float = 0.001,
    prefetch: int = 2, retain: int = 2,
) -> Iterator[Dict[str, np.ndarray]]:
    """Plain detection batches for pretraining (reference
    build_detection_train_loader via d2go): epoch-shuffled by default,
    image-level repeat-factor sampling for LVIS
    (DATALOADER.SAMPLER_TRAIN == RepeatFactorTrainingSampler).

    GT-empty records are dropped here (detectron2
    filter_images_with_only_crowd_annotations / filter_empty semantics
    for TRAINING only — eval loaders keep every image)."""
    records = [r for r in records if r.get("annotations")]
    if sampler == "RepeatFactorTrainingSampler":
        idx_iter = iter(RepeatFactorImageSampler(
            records, repeat_thresh, seed))
    else:
        idx_iter = iter(EpochShuffleSampler(len(records), seed))
    rng = np.random.RandomState(seed + 1)

    def gen():
        pool = _BufferPool((batch_size, *mapper.train_canvas, 3),
                           depth=retain + prefetch + 4)
        while True:
            buf = pool.next()
            idx = [next(idx_iter) for _ in range(batch_size)]
            seeds = rng.randint(0, 2 ** 31, len(idx))
            futs = [_POOL.submit(
                mapper.map_query_train, records[i],
                np.random.RandomState(s), buf[j])
                for j, (i, s) in enumerate(zip(idx, seeds))]
            mapped = [f.result() for f in futs]
            batch = {
                "images": buf,
                "gt_boxes": np.stack([m["gt_boxes"] for m in mapped]),
                "gt_labels": np.stack(
                    [m["gt_labels"] for m in mapped]).astype(np.int32),
                "gt_valid": np.stack([m["gt_valid"] for m in mapped]),
            }
            if "aug_ops" in mapped[0]:
                batch["aug_ops"] = np.stack([m["aug_ops"] for m in mapped])
                batch["aug_params"] = np.stack(
                    [m["aug_params"] for m in mapped])
                batch["image_sizes"] = np.stack(
                    [m["image_size"] for m in mapped])
            yield batch

    return _prefetch(gen, prefetch)


def build_support_set_loader(
    dataset: MetaDataset, mapper: EpisodicMapper, *,
    rank: int = 0, world_size: int = 1,
) -> Iterator[Dict]:
    """Per-class support batches for code generation (reference
    build_..._test_support_set_loader, data/build.py:519-593). The class
    axis is sharded across ranks like the reference's InferenceSampler."""
    rng = np.random.RandomState(0)

    def gen():
        # fresh arrays, NOT a _BufferPool: registration consumers group
        # TPU.CLASS_BATCH items at a time (meta_eval), which is more
        # retention than a ring can promise; the allocator keeps these
        # warm instead (sylph_tpu._tune_malloc)
        for ci in range(rank, len(dataset.classes), world_size):
            item = dataset._test_support_item(ci)
            imgs, boxes, valid = [], [], []
            for rec in item["support_set"]:
                m = mapper.map_support(rec, rng, train=False)
                imgs.append(m["image"])
                boxes.append(m["box"])
                valid.append(m["box_valid"])
            yield {
                "support_images": np.stack(imgs),
                "support_boxes": np.stack(boxes),
                "support_box_valid": np.asarray(valid, bool),
                "class_id": item["support_set_target"],
                "class_name": item["class_name"],
            }

    return _prefetch(gen)


def build_support_set_base_loader(
    dataset: MetaDataset, mapper: EpisodicMapper, *, chunk_size: int = 10,
    max_records: int = -1, rank: int = 0, world_size: int = 1,
) -> Iterator[Dict]:
    """Chunked base-class support batches for all-GT code accumulation
    (reference build_..._test_support_set_base_loader,
    data/build.py:620-688). Each item is one fixed-size chunk (padded
    with an invalid tail) plus its accumulation weight."""
    rng = np.random.RandomState(0)

    def gen():
        # fresh arrays, not a ring — same retention reasoning as
        # build_support_set_loader
        for i, item in enumerate(
                dataset.continual_support_items(chunk_size, max_records)):
            if i % world_size != rank:
                continue
            imgs, boxes, valid = [], [], []
            for rec in item["support_set"]:
                m = mapper.map_support(rec, rng, train=False)
                imgs.append(m["image"])
                boxes.append(m["box"])
                valid.append(m["box_valid"])
            while len(imgs) < chunk_size:
                imgs.append(imgs[-1])
                boxes.append(boxes[-1])
                valid.append(False)
            yield {
                "support_images": np.stack(imgs),
                "support_boxes": np.stack(boxes),
                "support_box_valid": np.asarray(valid, bool),
                "class_id": item["support_set_target"],
                "class_name": item["class_name"],
                "weight": item["weight"],
            }

    return _prefetch(gen)


def build_query_loader(
    dataset: MetaDataset, mapper: EpisodicMapper, *, batch_size: int = 1,
    rank: int = 0, world_size: int = 1,
) -> Iterator[Dict]:
    """Eval query batches; the last batch is padded to full size with a
    validity mask (static shapes — no recompile on the tail)."""
    def gen():
        records = dataset.query[rank::world_size]
        pool = _BufferPool((batch_size, *mapper.eval_canvas, 3))
        for i in range(0, len(records), batch_size):
            chunk = records[i:i + batch_size]
            buf = pool.next()
            mapped = list(_POOL.map(mapper.map_query_eval, chunk,
                                    [buf[j] for j in range(len(chunk))]))
            n = len(mapped)
            for j in range(n, batch_size):
                buf[j] = buf[n - 1]  # padded tail (warm copy)
                mapped.append(mapped[-1])
            batch = {
                "images": buf,
                "image_sizes": np.stack([m["image_size"] for m in mapped]),
                "image_ids": np.asarray(
                    [m["image_id"] for m in mapped], np.int64),
                "orig_sizes": np.stack(
                    [np.asarray([m["orig_height"], m["orig_width"]])
                     for m in mapped]),
                "batch_valid": np.arange(batch_size) < n,
            }
            yield batch

    return _prefetch(gen)
