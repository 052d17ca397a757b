"""Fixed-shape, mask-validated data structures.

The reference uses detectron2's ragged ``Instances``/``Boxes``
(e.g. meta_one_stage_detector.py:174-224). Ragged shapes force
recompilation under XLA, so everything here is a *padded pytree*: arrays
have a static leading box axis plus an explicit validity mask. All box
coordinates are XYXY in absolute pixels of the (already resized) canvas.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GTBoxes:
    """Padded ground truth for one image (or a batch, with leading axes).

    boxes:  (..., M, 4) float32 XYXY
    labels: (..., M)    int32 contiguous category ids
    valid:  (..., M)    bool
    """

    boxes: jnp.ndarray
    labels: jnp.ndarray
    valid: jnp.ndarray

    @property
    def max_boxes(self) -> int:
        return self.boxes.shape[-2]

    def num_valid(self) -> jnp.ndarray:
        return jnp.sum(self.valid.astype(jnp.int32), axis=-1)

    @staticmethod
    def pad_from(boxes, labels, max_boxes: int) -> "GTBoxes":
        """Host-side helper: pad ragged numpy GT to a static size."""
        import numpy as np

        boxes = np.asarray(boxes, dtype=np.float32).reshape(-1, 4)
        labels = np.asarray(labels, dtype=np.int32).reshape(-1)
        n = min(len(labels), max_boxes)
        b = np.zeros((max_boxes, 4), np.float32)
        l = np.zeros((max_boxes,), np.int32)
        v = np.zeros((max_boxes,), bool)
        b[:n] = boxes[:n]
        l[:n] = labels[:n]
        v[:n] = True
        return GTBoxes(jnp.asarray(b), jnp.asarray(l), jnp.asarray(v))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Detections:
    """Padded detector output for one image (mirrors detectron2 Instances
    fields produced by the reference decode, fcos_outputs.py:371-466).

    boxes:      (..., K, 4) float32 XYXY on the network input canvas
    scores:     (..., K)    float32
    classes:    (..., K)    int32
    valid:      (..., K)    bool
    locations:  (..., K, 2) float32 — the FCOS location that produced the box
    fpn_levels: (..., K)    int32
    """

    boxes: jnp.ndarray
    scores: jnp.ndarray
    classes: jnp.ndarray
    valid: jnp.ndarray
    locations: jnp.ndarray
    fpn_levels: jnp.ndarray

    @property
    def max_detections(self) -> int:
        return self.scores.shape[-1]


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """IoU between two XYXY box sets: (N,4),(M,4) -> (N,M)."""
    area1 = box_area(boxes1)  # (N,)
    area2 = box_area(boxes2)  # (M,)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(boxes[..., 2] - boxes[..., 0], 0.0) * jnp.clip(
        boxes[..., 3] - boxes[..., 1], 0.0)


def clip_boxes(boxes: jnp.ndarray, size_hw: Tuple[int, int]) -> jnp.ndarray:
    """Clip XYXY boxes to [0,W]x[0,H] (detectron2 Boxes.clip semantics)."""
    h, w = size_hw
    x1 = jnp.clip(boxes[..., 0], 0.0, w)
    y1 = jnp.clip(boxes[..., 1], 0.0, h)
    x2 = jnp.clip(boxes[..., 2], 0.0, w)
    y2 = jnp.clip(boxes[..., 3], 0.0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def scale_boxes(boxes: jnp.ndarray, scale_x, scale_y) -> jnp.ndarray:
    return boxes * jnp.stack(
        [jnp.asarray(scale_x), jnp.asarray(scale_y)] * 2).astype(boxes.dtype)
