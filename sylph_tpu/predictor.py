"""SylphPredictor: single-image few-shot serving API.

Preserves the reference's public surface (sylph/predictor.py:38-298):

  ``SylphPredictor(config_file, weight_path, class_code_path,
  runner_name, test_dataset_names)`` with
    * ``__call__(image)``            — detect with cached class codes;
    * ``detect_base(image)``         — plain base detector (reference
                                       ``__call__`` when non-episodic);
    * ``register_class(name, support_images, boxes)`` — add a class to
      the bank with NO gradient updates (reference
      ``_generate_class_code_from_dataset``, :134-161);
    * class codes loaded from per-class ``.npz`` files
      (``_get_datasets_class_codes``, :167-187 — ``.pth`` in torch).

TPU-native serving design: the code bank is a padded HBM-resident
``(N_max, 256)+(N_max,)`` pair with an active-class mask, so registering
class N+1 is a ``dynamic_update_slice`` — the conditioned query graph
never recompiles (the long-axis strategy from SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .data.transforms import pad_to_canvas, resize_shortest_edge
from .models.meta_arch import MetaOneStageDetector
from .ops.decode import decode_proposals
from .ops.locations import build_location_grid
from .runner.meta_fcos_runner import _decode_cfg, _mapper, create_runner
from .structures import Detections


class ClassCodeBank:
    """Fixed-capacity device-resident class-code bank."""

    def __init__(self, capacity: int, channels: int = 256):
        self.capacity = capacity
        self.conv = jnp.zeros((capacity, channels), jnp.float32)
        self.bias = jnp.zeros((capacity,), jnp.float32)
        self.valid = jnp.zeros((capacity,), bool)
        self.names: List[Optional[str]] = [None] * capacity
        self._n = 0

    def add(self, name: str, conv: np.ndarray, bias: float) -> int:
        i = self._n
        assert i < self.capacity, "code bank full"
        self.conv = jax.lax.dynamic_update_slice(
            self.conv, jnp.asarray(conv, jnp.float32).reshape(1, -1), (i, 0))
        self.bias = self.bias.at[i].set(float(bias))
        self.valid = self.valid.at[i].set(True)
        self.names[i] = name
        self._n += 1
        return i

    @property
    def num_classes(self) -> int:
        return self._n

    def as_code(self) -> Dict[str, jnp.ndarray]:
        return {"cls_conv": self.conv, "cls_bias": self.bias}


class SylphPredictor:
    def __init__(self, config_file: Optional[str] = None,
                 weight_path: Optional[str] = None,
                 class_code_path: Optional[str] = None,
                 runner_name: str = "MetaFCOSRunner",
                 test_dataset_names: Sequence[str] = (),
                 cfg=None, model=None, params=None,
                 max_classes: Optional[int] = None):
        runner = create_runner(runner_name)
        if cfg is None:
            cfg = runner.get_default_cfg()
            if config_file:
                cfg.merge_from_file(config_file)
        if weight_path:
            cfg.MODEL.WEIGHTS = weight_path
        self.cfg = cfg
        if model is None:
            model, params = runner.build_model(cfg)
        self.model = model
        # serving is pure inference: apply the bf16-residency policy
        # (TPU.EVAL_BF16_RESIDENT — 202 -> 254 img/s on the HBM-bound
        # query path, see utils/precision.py)
        from .utils.precision import eval_resident_params
        self.params = eval_resident_params(cfg, params)
        self.runner = runner

        self.eval_canvas = tuple(cfg.TPU.EVAL_CANVAS)
        self.grid = build_location_grid(
            self.eval_canvas, tuple(cfg.MODEL.FCOS.FPN_STRIDES),
            list(cfg.MODEL.FCOS.SIZES_OF_INTEREST))
        self.decode_cfg = _decode_cfg(cfg)
        self.mapper = _mapper(cfg)
        self.bank = ClassCodeBank(max_classes or cfg.TPU.MAX_CLASSES)
        self._infer = None  # compiled lazily (bank is traced as arg)

        if class_code_path:
            self._load_codes(class_code_path)

    # ------------------------------------------------------------- code IO
    def _load_codes(self, path: str):
        """Load every ``{class}.npz`` in a directory (reference
        _get_datasets_class_codes).

        Per-class files hold RAW codes (generate_class_codes saves them
        pre-normalization so base-accumulation stays possible), while
        register_class adds normalized codes — so normalize here too, or
        a mixed bank would score classes on different scales.
        """
        names, convs, biases = [], [], []
        for fname in sorted(os.listdir(path)):
            if not fname.endswith(".npz"):
                continue
            data = np.load(os.path.join(path, fname))
            names.append(fname[:-4])
            convs.append(np.asarray(data["cls_conv"]).reshape(-1))
            biases.append(float(np.asarray(data["cls_bias"]).reshape(())))
        if not names:
            return
        code = {"cls_conv": jnp.asarray(np.stack(convs)),
                "cls_bias": jnp.asarray(biases, jnp.float32)}
        if self.model.code_generator_name != "ROIEncoder":
            code = jax.jit(
                lambda p, c: self.model.apply(
                    {"params": p}, c,
                    method=MetaOneStageDetector.normalize_code)
            )(self.params, code)
        conv = np.asarray(code["cls_conv"])
        bias = np.asarray(code["cls_bias"])
        for i, name in enumerate(names):
            self.bank.add(name, conv[i].reshape(-1), float(bias[i]))

    # ------------------------------------------------------ registration
    def register_class(self, name: str, support_images: List[np.ndarray],
                       support_boxes: List[np.ndarray]) -> int:
        """Register a novel class from K support crops — no gradients.

        support_images: K HWC uint8 arrays (BGR or RGB per cfg.INPUT.FORMAT);
        support_boxes: K XYXY boxes in each image's coordinates.
        """
        sc = tuple(self.cfg.TPU.SUPPORT_CANVAS)
        imgs, boxes = [], []
        for img, box in zip(support_images, support_boxes):
            im, bx = resize_shortest_edge(
                np.asarray(img), np.asarray(box, np.float32).reshape(1, 4),
                min(sc), max(sc))
            im = im[:sc[0], :sc[1]]
            bx = bx.clip(0, [im.shape[1], im.shape[0]] * 2)
            im = pad_to_canvas(im, sc)
            imgs.append(im if im.dtype == np.uint8
                        else im.astype(np.float32))
            boxes.append(bx[0])
        k = len(imgs)
        if not hasattr(self, "_code_fns"):
            self._code_fns = {}
        if k not in self._code_fns:
            model = self.model

            @jax.jit
            def code_fn(params, imgs, boxes):
                raw = model.apply(
                    {"params": params}, imgs, boxes,
                    jnp.ones((imgs.shape[0],), bool), imgs.shape[0], False,
                    method=MetaOneStageDetector.forward_class_code)
                if model.code_generator_name != "ROIEncoder":
                    raw = model.apply(
                        {"params": params},
                        {"cls_conv": raw["cls_conv"],
                         "cls_bias": raw["cls_bias"]},
                        method=MetaOneStageDetector.normalize_code)
                return raw

            self._code_fns[k] = code_fn
        raw = self._code_fns[k](self.params, jnp.asarray(np.stack(imgs)),
                                jnp.asarray(np.stack(boxes)))
        return self.bank.add(name, np.asarray(raw["cls_conv"]).reshape(-1),
                             float(np.asarray(raw["cls_bias"]).reshape(())))

    def detect_base(self, image: np.ndarray) -> Dict:
        """Plain base-detector inference with the trained cls_logits
        (reference __call__ non-episodic path, predictor.py:276-298)."""
        img = np.asarray(image)
        if self.cfg.INPUT.FORMAT == "BGR":
            img = img[:, :, ::-1]
        oh, ow = img.shape[:2]
        resized, _ = resize_shortest_edge(
            img, np.zeros((0, 4), np.float32),
            self.cfg.INPUT.MIN_SIZE_TEST, self.cfg.INPUT.MAX_SIZE_TEST)
        resized = resized[:self.eval_canvas[0], :self.eval_canvas[1]]
        rh, rw = resized.shape[:2]
        canvas = pad_to_canvas(resized, self.eval_canvas)
        # ship uint8; normalization to float happens on device

        if not hasattr(self, "_infer_base"):
            locations = jnp.asarray(self.grid.locations)
            strides = jnp.asarray(self.grid.strides)
            level_ids = jnp.asarray(self.grid.level_ids)
            splits = tuple(h * w for h, w in self.grid.level_sizes)
            dcfg = self.decode_cfg
            model = self.model

            @jax.jit
            def infer(params, image, image_size):
                out = model.apply({"params": params}, image,
                                  method=MetaOneStageDetector.forward_base)
                return decode_proposals(
                    out.logits, out.reg, out.ctrness, out.iou, locations,
                    strides, level_ids, image_size, dcfg, splits)

            self._infer_base = infer
        det = self._infer_base(self.params, jnp.asarray(canvas[None]),
                               jnp.asarray([[rh, rw]]))
        det = jax.tree.map(np.asarray, det)
        keep = det.valid[0]
        sx, sy = ow / rw, oh / rh
        return {
            "boxes": det.boxes[0][keep] * np.array([sx, sy, sx, sy],
                                                   np.float32),
            "scores": det.scores[0][keep],
            "classes": det.classes[0][keep],
        }

    def generate_class_codes_from_dataset(self, dataset_name: str,
                                          shot: Optional[int] = None,
                                          meta_test_seed: int = 0) -> int:
        """Register every class of a registered dataset from its K-shot
        support sets (reference _generate_class_code_from_dataset,
        predictor.py:134-161). Returns the number of classes added."""
        from .data.catalog import DatasetCatalog
        from .data.loader import build_support_set_loader
        from .data.meta_dataset import MetaDataset
        from .evaluation.meta_eval import (generate_class_codes,
                                           normalize_class_codes)

        shot = shot or self.cfg.MODEL.META_LEARN.EVAL_SHOT
        ds = MetaDataset(DatasetCatalog.get(dataset_name),
                         "episodic_test_supportset", num_shot=shot,
                         meta_test_seed=meta_test_seed)
        codes = generate_class_codes(
            self.model, self.params,
            build_support_set_loader(ds, self.mapper),
            class_batch=self.cfg.TPU.CLASS_BATCH)
        bank = normalize_class_codes(self.model, self.params, codes)
        order = sorted(codes)
        for row, cid in enumerate(order):
            self.bank.add(codes[cid]["class_name"],
                          np.asarray(bank["cls_conv"][row]).reshape(-1),
                          float(bank["cls_bias"][row]))
        return len(order)

    # ---------------------------------------------------------- inference
    def _compile(self):
        locations = jnp.asarray(self.grid.locations)
        strides = jnp.asarray(self.grid.strides)
        level_ids = jnp.asarray(self.grid.level_ids)
        splits = tuple(h * w for h, w in self.grid.level_sizes)
        dcfg = self.decode_cfg
        model = self.model

        @jax.jit
        def infer(params, image, image_size, conv, bias, valid):
            out = model.apply(
                {"params": params}, image,
                {"cls_conv": conv, "cls_bias": bias},
                method=MetaOneStageDetector.forward_instances)
            return decode_proposals(
                out.logits, out.reg, out.ctrness, out.iou, locations,
                strides, level_ids, image_size, dcfg, splits,
                class_valid=valid)

        return infer

    def __call__(self, image: np.ndarray,
                 device_preprocess: bool = False) -> Dict:
        """Detect registered classes in one image (reference
        _call_few_shot, predictor.py:248-274).

        device_preprocess=True moves the resize onto the TPU
        (ops/image_ops — one compiled graph for every input size up to
        the eval canvas): the host only stages the raw frame, saving
        host CPU and PCIe for the resized copy.
        """
        if self._infer is None:
            self._infer = self._compile()
        img = np.asarray(image)
        if self.cfg.INPUT.FORMAT == "BGR":
            img = img[:, :, ::-1]  # input assumed RGB; model wants BGR
        oh, ow = img.shape[:2]
        if device_preprocess and oh <= self.eval_canvas[0] \
                and ow <= self.eval_canvas[1]:
            from .ops.image_ops import resize_shortest_edge_device

            staging = np.zeros((*self.eval_canvas, 3), img.dtype)
            staging[:oh, :ow] = img
            canvas_j, content = resize_shortest_edge_device(
                jnp.asarray(staging), jnp.asarray([oh, ow], jnp.int32),
                out_hw=self.eval_canvas,
                short=self.cfg.INPUT.MIN_SIZE_TEST,
                max_size=self.cfg.INPUT.MAX_SIZE_TEST)
            rh, rw = int(content[0]), int(content[1])
            det: Detections = self._infer(
                self.params, canvas_j[None], jnp.asarray([[rh, rw]]),
                self.bank.conv, self.bank.bias, self.bank.valid)
            det = jax.tree.map(np.asarray, det)
            return self._format(det, oh, ow, rh, rw)

        resized, _ = resize_shortest_edge(
            img, np.zeros((0, 4), np.float32),
            self.cfg.INPUT.MIN_SIZE_TEST, self.cfg.INPUT.MAX_SIZE_TEST)
        resized = resized[:self.eval_canvas[0], :self.eval_canvas[1]]
        rh, rw = resized.shape[:2]
        canvas = pad_to_canvas(resized, self.eval_canvas)
        # ship uint8; normalization to float happens on device

        det: Detections = self._infer(
            self.params, jnp.asarray(canvas[None]),
            jnp.asarray([[rh, rw]]), self.bank.conv, self.bank.bias,
            self.bank.valid)
        det = jax.tree.map(np.asarray, det)
        return self._format(det, oh, ow, rh, rw)

    def _format(self, det: Detections, oh, ow, rh, rw) -> Dict:
        sx, sy = ow / rw, oh / rh
        keep = det.valid[0]
        boxes = det.boxes[0][keep] * np.array([sx, sy, sx, sy], np.float32)
        classes = det.classes[0][keep]
        return {
            "boxes": boxes,
            "scores": det.scores[0][keep],
            "classes": classes,
            "class_names": [self.bank.names[c] for c in classes],
        }
