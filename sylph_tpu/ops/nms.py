"""Device-side batched multiclass NMS.

TPU-native replacement for the reference's CUDA ``ml_nms``
(adet.layers.ml_nms, used at fcos_outputs.py:1015) and the post-NMS global
``kthvalue`` cap (fcos_outputs.py:1019-1026).

Design: greedy NMS followed by a top-``post_nms_topk`` cap is *exactly* the
first ``post_nms_topk`` greedy picks, so instead of a full O(K) suppression
scan we run a fused **select-and-suppress loop of only ``max_outputs``
steps** (100 for COCO / 300 for LVIS):

  each step: argmax over the masked score vector (VPU reduction over K) ->
  gather the winner's box -> one (K,) IoU row against the winner ->
  mask out the winner and everything with IoU > threshold.

This is O(max_outputs * K) vector work with a short `lax.scan` — no K x K
IoU matrix, no K-step sequential loop, and fixed output shapes so the whole
post-processing graph compiles once. Multiclass behavior comes from the
standard class-offset trick (boxes of different classes never overlap).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -1e10


def _iou_one_vs_many(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of one XYXY box (4,) against (K, 4)."""
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:], boxes[:, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    area1 = jnp.clip(box[2] - box[0], 0.0) * jnp.clip(box[3] - box[1], 0.0)
    area2 = (jnp.clip(boxes[:, 2] - boxes[:, 0], 0.0) *
             jnp.clip(boxes[:, 3] - boxes[:, 1], 0.0))
    union = area1 + area2 - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)


def nms_select(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
               iou_threshold: float, max_outputs: int):
    """Greedy NMS returning the top ``max_outputs`` survivors directly.

    Args:
      boxes: (K, 4) XYXY (already class-offset for multiclass use).
      scores: (K,) — invalid entries may hold any value.
      valid: (K,) bool.
      iou_threshold: suppression threshold.
      max_outputs: static number of picks.

    Returns:
      (idx, out_valid): (max_outputs,) int32 indices into the candidate axis
      (0 where invalid) and (max_outputs,) bool.
    """
    alive = jnp.where(valid, scores.astype(jnp.float32), NEG_INF)

    def step(alive, _):
        i = jnp.argmax(alive)
        best = alive[i]
        ok = best > NEG_INF / 2
        iou = _iou_one_vs_many(boxes[i], boxes)
        suppress = (iou > iou_threshold) | (
            jax.lax.broadcasted_iota(jnp.int32, alive.shape, 0) == i)
        alive = jnp.where(ok & suppress, NEG_INF, alive)
        return alive, (i.astype(jnp.int32), ok)

    _, (idx, ok) = jax.lax.scan(step, alive, None, length=max_outputs)
    return jnp.where(ok, idx, 0), ok


@partial(jax.jit, static_argnames=("iou_threshold", "max_outputs"))
def batched_multiclass_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                           classes: jnp.ndarray, valid: jnp.ndarray,
                           iou_threshold: float, max_outputs: int):
    """Multiclass NMS for a batch with a static output size.

    On TPU the greedy loop runs as a Pallas kernel with the candidate
    set resident in VMEM (ops/nms_pallas.py — measured ~1.4x the fused
    XLA scan); elsewhere (CPU tests, interpret mode) it falls back to
    the lax.scan formulation. Both produce identical picks.

    Args:
      boxes: (B, K, 4), scores: (B, K), classes: (B, K) int32, valid: (B, K).

    Returns:
      (boxes, scores, classes, valid, gather_idx) each (B, max_outputs, ...):
      top ``max_outputs`` greedy-NMS picks by score; ``gather_idx``
      (B, max_outputs) indexes into the input candidate axis (for carrying
      extra per-candidate fields like locations/levels through NMS).
    """
    # Class-offset trick: translate each class into a disjoint region.
    max_coord = jnp.max(jnp.where(valid[..., None], boxes, 0.0),
                        axis=(1, 2), keepdims=True) + 1.0
    offset = classes.astype(boxes.dtype)[..., None] * max_coord
    shifted = boxes + offset

    use_pallas = jax.devices()[0].platform == "tpu"
    if use_pallas:
        from .nms_pallas import batched_nms_pallas
        idx, ok = batched_nms_pallas(shifted, scores, valid,
                                     iou_threshold, max_outputs)
    else:
        idx, ok = jax.vmap(
            lambda b, s, v: nms_select(b, s, v, iou_threshold,
                                       max_outputs))(shifted, scores, valid)

    take = lambda x: jnp.take_along_axis(x, idx, axis=1)  # noqa: E731
    return (jnp.take_along_axis(boxes, idx[..., None].repeat(4, -1), axis=1),
            jnp.where(ok, take(scores), 0.0), take(classes), ok, idx)
