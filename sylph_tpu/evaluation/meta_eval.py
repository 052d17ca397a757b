"""Two-phase meta-test drivers.

Rebuilds the reference's episodic evaluation loop
(meta_learn_evaluation.py:71-470, orchestrated by
meta_fcos_runner.py:451-672):

  PHASE 1 — per class: run the K-shot support set through the frozen
  backbone + code generator (run_type "meta_learn_test_support"),
  optionally accumulate base-class codes over chunked support
  (inference_on_support_set_dataset_base :118-254), save one code file
  per class (:316-325 — ``.npz`` here instead of ``.pth``), then
  normalize the whole bank in one jitted call ("meta_learn_normalize_
  code", :105-116) and stack into the HBM bank
  (``format_class_codes_shared``, :71-103).

  PHASE 2 — conditioned query inference + decode + postprocess into the
  evaluator ("meta_learn_test_instance", :367-470).

Latency meters match the reference's (warmup-aware s/class and s/img,
:240-253, :349-364, :447-463) with ``block_until_ready`` standing in for
cuda synchronize. ``MetaTestDriver.run_repeated`` reproduces the
REPEAT_TEST mean±std aggregation (meta_fcos_runner.py:597-631).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.meta_arch import MetaOneStageDetector
from ..ops.decode import DecodeCfg, decode_proposals
from .postprocess import detections_to_coco_results

WARMUP = 5


def _np_f32(x):
    """Device→host fetch that lands floating leaves as np.float32 — the
    device may compute/store bf16 (TPU.EVAL_BF16_RESIDENT), but host
    artifacts (saved .npz codes, COCO result floats) stay plain numpy
    dtypes."""
    a = np.asarray(x)
    if jnp.issubdtype(a.dtype, jnp.floating) and a.dtype.itemsize < 4:
        return a.astype(np.float32)   # bf16/f16 → f32; f32 passes through
    return a


def format_class_codes(code_list: List[Dict]) -> Dict[str, np.ndarray]:
    """List of per-class {cls_conv (1, C), cls_bias (1,)} → stacked bank
    {"cls_conv": (N, C), "cls_bias": (N,)} (reference :71-103)."""
    conv = np.concatenate([np.asarray(c["cls_conv"]).reshape(1, -1)
                           for c in code_list], 0)
    bias = np.concatenate([np.asarray(c["cls_bias"]).reshape(1)
                           for c in code_list], 0)
    return {"cls_conv": conv.astype(np.float32),
            "cls_bias": bias.astype(np.float32)}



def _device_prefetch(loader, keys, depth: int = 2):
    """Yield loader items with ``keys`` moved to device on a worker
    thread — the host->device copy of item i+1 overlaps item i's
    compute + evaluation. On remote-attached chips the copy is the
    bottleneck (measured ~45 MB/s through the tunnel), so without this
    the eval loop serializes behind transfers."""
    from ..data.loader import _prefetch

    def gen():
        from ..utils.profiling import fence_large_leaves
        for item in loader:
            out = dict(item)
            for k in keys:
                out[k] = jax.device_put(np.asarray(item[k]))
                # keep the host original (a reference, not a copy) —
                # host-side consumers must not poke eager ops at the
                # device copy (each would be a tunnel round trip)
                out[k + "_host"] = item[k]
                # force large transfers to complete HERE so they overlap
                # the running inference instead of executing lazily on
                # the device stream at dispatch time (shared policy:
                # utils/profiling.py::fence_large_leaves)
                fence_large_leaves(out[k])
            yield out

    return _prefetch(gen, depth=depth)

def generate_class_codes(model: MetaOneStageDetector, params,
                         support_loader, *, save_dir: Optional[str] = None,
                         class_batch: int = 1) -> Dict[int, Dict]:
    """PHASE 1: raw code generation (+ optional .npz save).

    ``class_batch > 1`` registers D classes per dispatch on a SINGLE
    device by vmapping the code generator over a stacked class axis —
    the single-chip analog of the rank-sharded registration
    (reference meta_fcos_runner.py:381-439). At LVIS scale the
    per-dispatch overhead (remote tunnel ~1 ms/dispatch + host sync)
    dominates 1-class dispatches, so batching classes is the difference
    between O(N) and O(N/D) round trips. The tail group is zero-padded
    to keep one static shape; padded rows are discarded.
    """
    if class_batch > 1:
        return _generate_class_codes_vmapped(
            model, params, support_loader, class_batch, save_dir)
    code_fn = jax.jit(
        lambda p, imgs, boxes, valid: model.apply(
            {"params": p}, imgs, boxes, valid, imgs.shape[0], False,
            method=type(model).forward_class_code),
        static_argnames=())

    codes: Dict[int, Dict] = {}
    times = []
    for i, item in enumerate(_device_prefetch(
            support_loader,
            ("support_images", "support_boxes", "support_box_valid"))):
        t0 = time.perf_counter()
        out = code_fn(params, item["support_images"],
                      item["support_boxes"],
                      item["support_box_valid"])
        out = jax.tree.map(_np_f32, out)
        dt = time.perf_counter() - t0
        if i >= WARMUP:
            times.append(dt)
        codes[item["class_id"]] = {"code": out,
                                   "class_name": item["class_name"]}
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            np.savez(os.path.join(save_dir, f"{item['class_name']}.npz"),
                     **out)
    if times:
        print(f"[meta-eval] code-gen: {np.mean(times)*1e3:.2f} ms/class "
              f"over {len(times)} classes")
    return codes


_SUPPORT_KEYS = ("support_images", "support_boxes", "support_box_valid")


def _pad_group(group: List[Dict], n: int) -> None:
    """Zero-pad a tail group of support items to ``n`` in place — one
    static dispatch shape; padded rows are discarded by the caller, not
    registered."""
    while len(group) < n:
        group.append({k: np.zeros_like(np.asarray(group[0][k]))
                      for k in _SUPPORT_KEYS})


def _generate_class_codes_vmapped(model, params, support_loader,
                                  class_batch: int,
                                  save_dir: Optional[str]) -> Dict[int, Dict]:
    """Single-device class-batched registration (see
    ``generate_class_codes``): stack D classes' (shot, H, W, 3) support
    tensors to (D, shot, H, W, 3) and vmap ``forward_class_code`` over
    the class axis."""
    def one(p, imgs, boxes, valid):
        return model.apply({"params": p}, imgs, boxes, valid,
                           imgs.shape[0], False,
                           method=type(model).forward_class_code)

    code_fn = jax.jit(jax.vmap(one, in_axes=(None, 0, 0, 0)))

    def groups():
        group: List[Dict] = []

        def stacked():
            n = len(group)
            _pad_group(group, class_batch)
            out = {k: np.stack([np.asarray(g[k]) for g in group])
                   for k in _SUPPORT_KEYS}
            out["items"] = [(g["class_id"], g["class_name"])
                            for g in group[:n]]
            group.clear()
            return out

        for item in support_loader:
            group.append(item)
            if len(group) == class_batch:
                yield stacked()
        if group:
            yield stacked()

    codes: Dict[int, Dict] = {}
    times: List = []
    for g in _device_prefetch(
            groups(), ("support_images", "support_boxes",
                       "support_box_valid")):
        t0 = time.perf_counter()
        bank = jax.tree.map(_np_f32,
                            code_fn(params, g["support_images"],
                                    g["support_boxes"],
                                    g["support_box_valid"]))
        times.append((time.perf_counter() - t0, len(g["items"])))
        for i, (cid, cname) in enumerate(g["items"]):
            out = {k: v[i] for k, v in bank.items()}
            codes[cid] = {"code": out, "class_name": cname}
            if save_dir:
                os.makedirs(save_dir, exist_ok=True)
                np.savez(os.path.join(save_dir, f"{cname}.npz"), **out)
    if len(times) > WARMUP:
        t = sum(t for t, _ in times[WARMUP:])
        n = sum(n for _, n in times[WARMUP:])
        print(f"[meta-eval] batched code-gen: {t/max(n,1)*1e3:.2f} "
              f"ms/class ({class_batch} classes/dispatch)")
    return codes


def generate_class_codes_sharded(model, params, support_loader, mesh, *,
                                 save_dir: Optional[str] = None
                                 ) -> Dict[int, Dict]:
    """PHASE 1 with the class axis sharded over the device mesh.

    The reference shards the class list over DDP ranks and all-gathers
    the code objects (meta_fcos_runner.py:381-439). The TPU-native form:
    stack D classes' support batches, shard_map the code generator over
    the data axis (one class per device) and all_gather the fixed-shape
    code rows — one dispatch registers D classes, which matters at LVIS
    scale (1203 classes).
    """
    from jax.sharding import PartitionSpec as P

    d = mesh.devices.size

    def local_codes(imgs, boxes, valid):
        out = model.apply(
            {"params": params}, imgs, boxes, valid, imgs.shape[0], False,
            method=type(model).forward_class_code)
        out = {"cls_conv": out["cls_conv"].reshape(1, -1),
               "cls_bias": out["cls_bias"].reshape(1)}
        from ..parallel.mesh import gather_class_codes
        return gather_class_codes(out)

    code_fn = jax.jit(jax.shard_map(
        local_codes, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")), out_specs=P(),
        check_vma=False))

    codes: Dict[int, Dict] = {}
    group: List[Dict] = []
    times = []

    def flush():
        if not group:
            return
        n = len(group)
        _pad_group(group, d)
        imgs = np.concatenate([g["support_images"] for g in group])
        boxes = np.concatenate([g["support_boxes"] for g in group])
        valid = np.concatenate([g["support_box_valid"] for g in group])
        t0 = time.perf_counter()
        bank = jax.tree.map(_np_f32,
                            code_fn(jnp.asarray(imgs), jnp.asarray(boxes),
                                    jnp.asarray(valid)))
        times.append((time.perf_counter() - t0, n))
        for i in range(n):
            item = group[i]
            out = {"cls_conv": bank["cls_conv"][i:i + 1],
                   "cls_bias": bank["cls_bias"][i:i + 1]}
            codes[item["class_id"]] = {"code": out,
                                       "class_name": item["class_name"]}
            if save_dir:
                os.makedirs(save_dir, exist_ok=True)
                np.savez(os.path.join(save_dir,
                                      f"{item['class_name']}.npz"), **out)
        group.clear()

    for item in support_loader:
        group.append(item)
        if len(group) == d:
            flush()
    flush()
    if len(times) > WARMUP:
        t = sum(t for t, _ in times[WARMUP:])
        n = sum(n for _, n in times[WARMUP:])
        print(f"[meta-eval] sharded code-gen: {t/max(n,1)*1e3:.2f} ms/class "
              f"({d} classes/dispatch)")
    return codes


def normalize_class_codes(model: MetaOneStageDetector, params,
                          codes: Dict[int, Dict]) -> Dict[str, np.ndarray]:
    """PHASE 1b: one jitted normalization over the stacked bank."""
    order = sorted(codes)
    raw = format_class_codes([codes[c]["code"] for c in order])
    if model.code_generator_name == "ROIEncoder":
        return raw  # ROIEncoder emits final codes directly
    norm_fn = jax.jit(lambda p, c: model.apply(
        {"params": p}, c, method=type(model).normalize_code))
    out = norm_fn(params, jax.tree.map(jnp.asarray, raw))
    return jax.tree.map(_np_f32, out)


def accumulate_base_codes(chunks: List[Dict[str, np.ndarray]],
                          weights: List[float]) -> Dict[str, np.ndarray]:
    """Weighted accumulation of chunked base-class codes (reference
    reduce_class_code, code_generator/utils.py:397-427)."""
    total = float(sum(weights))
    conv = sum(np.asarray(c["cls_conv"]) * (w / total)
               for c, w in zip(chunks, weights))
    bias = sum(np.asarray(c["cls_bias"]) * (w / total)
               for c, w in zip(chunks, weights))
    return {"cls_conv": conv, "cls_bias": bias}


def generate_base_class_codes(model, params, dataset, mapper, *,
                              chunk_size: int = 10,
                              max_records: int = 100) -> Dict[int, Dict]:
    """Base-class registration over ALL ground truths, chunked + weighted
    (reference inference_on_support_set_dataset_base,
    meta_learn_evaluation.py:118-254).

    Each chunk of support records produces one raw code; chunks for a
    class accumulate by their record-count weight before normalization.
    """
    import jax

    from ..data.loader import build_support_set_base_loader

    per_class: Dict[int, List] = {}
    weights: Dict[int, List[float]] = {}
    code_fn = jax.jit(lambda p, i, b, v: model.apply(
        {"params": p}, i, b, v, chunk_size, False,
        method=type(model).forward_class_code))
    names = {}
    for item in _device_prefetch(
            build_support_set_base_loader(
                dataset, mapper, chunk_size=chunk_size,
                max_records=max_records),
            ("support_images", "support_boxes", "support_box_valid")):
        out = code_fn(params, item["support_images"],
                      item["support_boxes"],
                      item["support_box_valid"])
        cid = item["class_id"]
        per_class.setdefault(cid, []).append(jax.tree.map(_np_f32, out))
        weights.setdefault(cid, []).append(item["weight"])
        names[cid] = item["class_name"]
    return {cid: {"code": accumulate_base_codes(per_class[cid],
                                                weights[cid]),
                  "class_name": names[cid]}
            for cid in per_class}


def replace_with_base_codes(codes: Dict[int, Dict],
                            base_codes: Dict[int, Dict]) -> Dict[int, Dict]:
    """Few-shot codes overridden by base-GT codes where available
    (reference replace_class_code, code_generator/utils.py:376-394)."""
    out = dict(codes)
    out.update(base_codes)
    return out


def make_fcos_infer(model: MetaOneStageDetector, bank, grid,
                    decode_cfg: DecodeCfg,
                    class_valid: Optional[np.ndarray] = None):
    """Jitted one-stage phase-2 inference: conditioned dense head +
    decode (the default MetaTestDriver query path)."""
    locations = jnp.asarray(grid.locations)
    strides = jnp.asarray(grid.strides)
    level_ids = jnp.asarray(grid.level_ids)
    level_splits = tuple(h * w for h, w in grid.level_sizes)
    bank_j = jax.tree.map(jnp.asarray, bank)
    cv = (jnp.asarray(class_valid) if class_valid is not None
          else jnp.ones((bank["cls_conv"].shape[0],), bool))

    @jax.jit
    def infer(p, images, image_sizes):
        out = model.apply({"params": p}, images, bank_j,
                          method=MetaOneStageDetector.forward_instances)
        return decode_proposals(out.logits, out.reg, out.ctrness, out.iou,
                                locations, strides, level_ids, image_sizes,
                                decode_cfg, level_splits, class_valid=cv)

    return infer


def make_rcnn_infer(model, bank, anchor_grid, *, rpn_post_nms: int = 1000,
                    score_thresh: float = 0.05, nms_thresh: float = 0.5,
                    max_dets: int = 100,
                    class_valid: Optional[np.ndarray] = None,
                    rpn_pre_nms: int = 1000):
    """Jitted two-stage phase-2 inference (FewShotRCNN.forward_instances
    — reference FewShotDetector "meta_learn_test_instance",
    few_shot_rcnn.py:230-306)."""
    anchors = jnp.asarray(anchor_grid.anchors)
    splits = tuple(anchor_grid.level_splits)
    bank_j = jax.tree.map(jnp.asarray, bank)
    cv = (jnp.asarray(class_valid) if class_valid is not None
          else jnp.ones((bank["cls_conv"].shape[0],), bool))

    @jax.jit
    def infer(p, images, image_sizes):
        return model.apply(
            {"params": p}, images, bank_j, anchors, splits, image_sizes,
            rpn_post_nms, score_thresh, nms_thresh, max_dets, cv,
            rpn_pre_nms=rpn_pre_nms,
            method=type(model).forward_instances)

    return infer


def run_query_inference(infer, query_loader, id_map: Dict[int, int],
                        evaluator) -> Dict:
    """PHASE 2: conditioned inference over the query set.

    ``infer(params-free closure | (params, images, image_sizes))`` — a
    callable built by make_fcos_infer / make_rcnn_infer, already bound to
    params via functools.partial by the caller.
    """
    contiguous_to_dataset = {v: k for k, v in id_map.items()}
    times, n_imgs = [], 0
    for i, batch in enumerate(_device_prefetch(
            query_loader, ("images", "image_sizes"))):
        t0 = time.perf_counter()
        det = infer(batch["images"], batch["image_sizes"])
        det = jax.tree.map(_np_f32, det)
        dt = time.perf_counter() - t0
        if i >= WARMUP:
            times.append((dt, int(batch["batch_valid"].sum())))
        n_imgs += int(batch["batch_valid"].sum())
        results = detections_to_coco_results(
            det, batch["image_ids"], batch["image_sizes_host"],
            batch["orig_sizes"], contiguous_to_dataset,
            batch_valid=batch["batch_valid"])
        evaluator.process(results)
    if times:
        tot_t = sum(t for t, _ in times)
        tot_n = sum(n for _, n in times)
        print(f"[meta-eval] query inference: {tot_n/max(tot_t,1e-9):.2f} "
              f"img/s ({n_imgs} images)")
    return evaluator.evaluate()


class MetaTestDriver:
    """Repeat-seeded meta test: phases 1+2 per seed, mean±std aggregation
    (reference TEST.REPEAT_TEST, meta_fcos_runner.py:480-631)."""

    def __init__(self, model, params, dataset_dict, mapper, grid,
                 decode_cfg: DecodeCfg, *, eval_shot: int = 10,
                 evaluator_factory: Callable = None,
                 save_dir: Optional[str] = None,
                 use_all_gts_in_base: bool = False,
                 base_chunk_size: int = 10, base_max_records: int = 100,
                 eval_batch: int = 1, mesh=None,
                 infer_factory: Optional[Callable] = None,
                 class_batch: int = 1):
        """mesh: shard phase-1 class registration over its devices
        (reference rank-sharded registration, meta_fcos_runner.py:381-439).
        infer_factory(model, params, bank) -> infer(images, sizes) —
        overrides the default one-stage decode path (two-stage models
        pass make_rcnn_infer here)."""
        self.model = model
        self.params = params
        self.dataset_dict = dataset_dict
        self.mapper = mapper
        self.grid = grid
        self.decode_cfg = decode_cfg
        self.eval_shot = eval_shot
        self.evaluator_factory = evaluator_factory
        self.save_dir = save_dir
        self.use_all_gts_in_base = use_all_gts_in_base
        self.base_chunk_size = base_chunk_size
        self.base_max_records = base_max_records
        self.eval_batch = eval_batch
        self.mesh = mesh
        self.infer_factory = infer_factory
        self.class_batch = class_batch

    def run_once(self, meta_test_seed: int = 0) -> Dict:
        from ..data.loader import (build_query_loader,
                                   build_support_set_loader)
        from ..data.meta_dataset import MetaDataset

        sup_ds = MetaDataset(self.dataset_dict, "episodic_test_supportset",
                             num_shot=self.eval_shot,
                             meta_test_seed=meta_test_seed)
        if self.mesh is not None and self.mesh.devices.size > 1:
            codes = generate_class_codes_sharded(
                self.model, self.params,
                build_support_set_loader(sup_ds, self.mapper), self.mesh,
                save_dir=self.save_dir)
        else:
            codes = generate_class_codes(
                self.model, self.params,
                build_support_set_loader(sup_ds, self.mapper),
                save_dir=self.save_dir, class_batch=self.class_batch)
        if self.use_all_gts_in_base:
            # base classes get all-GT accumulated codes; few-shot codes
            # stay for classes marked novel (reference
            # USE_ALL_GTS_IN_BASE_CLASSES, meta_fcos_runner.py:520-532).
            meta = self.dataset_dict["metadata"]
            id_map = meta["thing_dataset_id_to_contiguous_id"]
            novel_cids = {id_map[d] for d in
                          meta.get("novel_dataset_ids", [])
                          if d in id_map}
            base_codes = generate_base_class_codes(
                self.model, self.params, sup_ds, self.mapper,
                chunk_size=self.base_chunk_size,
                max_records=self.base_max_records)
            base_codes = {c: v for c, v in base_codes.items()
                          if c not in novel_cids}
            codes = replace_with_base_codes(codes, base_codes)
        bank = normalize_class_codes(self.model, self.params, codes)

        qry_ds = MetaDataset(self.dataset_dict, "episodic_test_queryset",
                             num_shot=self.eval_shot)
        meta = self.dataset_dict["metadata"]
        evaluator = self.evaluator_factory(qry_ds.query, meta)
        if self.infer_factory is not None:
            infer = self.infer_factory(self.model, self.params, bank)
        else:
            fcos_infer = make_fcos_infer(self.model, bank, self.grid,
                                         self.decode_cfg)
            infer = lambda imgs, sizes: fcos_infer(self.params, imgs, sizes)  # noqa: E731
        return run_query_inference(
            infer,
            build_query_loader(qry_ds, self.mapper,
                               batch_size=self.eval_batch),
            meta["thing_dataset_id_to_contiguous_id"], evaluator)

    def run_repeated(self, repeats: int = 1) -> Dict:
        import warnings

        all_res = [self.run_once(s) for s in range(repeats)]
        flat = [r["bbox"] for r in all_res]
        keys = [k for k in flat[0] if isinstance(flat[0][k], float)]
        agg = {}
        with warnings.catch_warnings():
            # all-NaN metric slices (e.g. APl with no large GT) mean
            # "undefined for this data", same as the reference's -1;
            # nanmean's RuntimeWarning for them is expected noise
            warnings.simplefilter("ignore", RuntimeWarning)
            for k in keys:
                vals = np.asarray([f[k] for f in flat], np.float64)
                agg[k] = float(np.nanmean(vals))
                agg[f"{k}_std"] = float(np.nanstd(vals))
        return {"bbox": agg, "runs": flat}
