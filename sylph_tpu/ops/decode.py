"""Proposal decoding: dense head outputs → padded Detections.

Replaces the reference's per-image/per-level python decode
(fcos_outputs.py:743-812 ``predict_proposals``,
:904-1008 ``forward_for_single_feature_map``, :1010-1028
``select_over_all_levels``) with one fixed-shape XLA graph:

  * quality multiply per BOX_QUALITY (ctrness / iou / sqrt(iou*ctr)),
    ordered around the threshold exactly as THRESH_WITH_CTR dictates
    (fcos_outputs.py:946-983);
  * per-level candidate threshold + top-``pre_nms_topk`` (masked top-k
    instead of the data-dependent ``per_pre_nms_top_n``);
  * ltrb decode at the candidate locations, ``sqrt`` score (:1001);
  * multiclass NMS + global top-``post_nms_topk`` via the fused
    select-and-suppress kernel in ops/nms.py (the reference used CUDA
    ``ml_nms`` + host ``kthvalue``);
  * OWD mode: single-channel all-ones scores (:913-915).

All shapes are static; N (number of classes) is a compile-time axis —
pad the class-code bank to keep it stable across registrations.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from ..structures import Detections, clip_boxes
from .nms import batched_multiclass_nms

NEG_INF = -1e10


class DecodeCfg(NamedTuple):
    pre_nms_thresh: float = 0.05
    pre_nms_topk: int = 1000
    post_nms_topk: int = 100
    nms_thresh: float = 0.6
    thresh_with_ctr: bool = False
    box_quality: tuple = ("ctrness",)
    owd: bool = False
    # TPU approximate top-k (jax.lax.approx_max_k) for the pre-NMS
    # candidate cut — worthwhile at LVIS scale where P3 holds
    # K_level x 1203 ≈ 20M scores per image; recall_target 0.98 on a
    # 1000-candidate cut is AP-neutral in practice. Exact by default.
    approx_topk: bool = False


def _apply_quality(scores, ctr, iou, box_quality):
    bq = tuple(sorted(box_quality))
    if bq == ("ctrness",):
        return scores * ctr[..., None]
    if bq == ("iou",):
        return scores * iou[..., None]
    if bq == ("ctrness", "iou"):
        return scores * jnp.sqrt(iou[..., None] * ctr[..., None])
    raise NotImplementedError(f"BOX_QUALITY {bq}")


def _level_candidates(scores, reg, locations, strides, class_valid,
                      pre_nms_thresh, pre_nms_topk, approx=False):
    """Threshold + top-k for one level's flat (B, K_l, N) scores.

    Returns per-image candidate (boxes, scores, classes, loc_idx, valid)
    with a static ``pre_nms_topk`` axis.
    """
    b, k, n = scores.shape
    flat = scores.reshape(b, k * n)
    cand = (scores > pre_nms_thresh) & class_valid[None, None, :]
    flat_mask = cand.reshape(b, k * n)
    masked = jnp.where(flat_mask, flat, NEG_INF)

    topk = min(pre_nms_topk, k * n)
    if approx and k * n > 4 * topk:
        top_scores, top_idx = jax.lax.approx_max_k(
            masked, topk, recall_target=0.98)
    else:
        top_scores, top_idx = jax.lax.top_k(masked, topk)  # (B, topk)
    loc_idx = top_idx // n
    cls_idx = top_idx % n
    valid = top_scores > NEG_INF / 2

    loc = locations[loc_idx]                     # (B, topk, 2)
    stride = strides[loc_idx][..., None]         # (B, topk, 1)
    r = jnp.take_along_axis(reg, loc_idx[..., None], axis=1) * stride
    boxes = jnp.stack([
        loc[..., 0] - r[..., 0], loc[..., 1] - r[..., 1],
        loc[..., 0] + r[..., 2], loc[..., 1] + r[..., 3]], axis=-1)
    return boxes, jnp.where(valid, top_scores, 0.0), cls_idx, loc_idx, valid


@partial(jax.jit, static_argnames=("cfg", "level_splits"))
def decode_proposals(
    logits: jnp.ndarray,        # (B, K, N) raw logits (flat over levels)
    reg_pred: jnp.ndarray,      # (B, K, 4) stride-normalized
    ctrness_pred: jnp.ndarray,  # (B, K)
    iou_pred: jnp.ndarray,      # (B, K)
    locations: jnp.ndarray,     # (K, 2)
    strides: jnp.ndarray,       # (K,)
    level_ids: jnp.ndarray,     # (K,) int32
    image_sizes: jnp.ndarray,   # (B, 2) (h, w) actual content size on canvas
    cfg: DecodeCfg,
    level_splits: tuple,        # static per-level location counts
    class_valid: Optional[jnp.ndarray] = None,  # (N,) bool mask of live classes
) -> Detections:
    b, k, n = logits.shape
    if class_valid is None:
        class_valid = jnp.ones((n,), bool)

    if cfg.owd:
        scores = jnp.ones((b, k, 1), jnp.float32)
        class_valid = jnp.ones((1,), bool)
    else:
        scores = jax.nn.sigmoid(logits.astype(jnp.float32))
    ctr = jax.nn.sigmoid(ctrness_pred.astype(jnp.float32))
    iou = jax.nn.sigmoid(iou_pred.astype(jnp.float32))

    # THRESH_WITH_CTR (or OWD) multiplies quality *before* the threshold
    # (fcos_outputs.py:946-957); otherwise after (:970-983). Thresholding
    # commutes with top-k here because quality ∈ (0,1) preserves the
    # masked ordering only within the same branch — so mirror the order.
    if cfg.thresh_with_ctr or cfg.owd:
        scores = _apply_quality(scores, ctr, iou, cfg.box_quality)
        pre_scores = scores
    else:
        pre_scores = scores
        scores = _apply_quality(scores, ctr, iou, cfg.box_quality)

    # Per-level threshold+topk (reference treats levels independently).
    out_boxes, out_scores, out_cls, out_lvl, out_loc, out_valid = \
        [], [], [], [], [], []
    start = 0
    for li, count in enumerate(level_splits):
        sl = slice(start, start + count)
        # Candidates are defined on pre_scores; ranking uses final scores.
        cand = (pre_scores[:, sl] > cfg.pre_nms_thresh)
        masked = jnp.where(cand & class_valid[None, None, :],
                           scores[:, sl], NEG_INF)
        bxs, scs, cls_, loc_idx, val = _level_candidates(
            masked, reg_pred[:, sl], locations[sl], strides[sl],
            class_valid, NEG_INF / 2, cfg.pre_nms_topk,
            approx=cfg.approx_topk)
        out_boxes.append(bxs)
        out_scores.append(scs)
        out_cls.append(cls_)
        out_lvl.append(jnp.full(cls_.shape, li, jnp.int32))
        out_loc.append(locations[sl][loc_idx])
        out_valid.append(val)
        start += count

    boxes = jnp.concatenate(out_boxes, axis=1)
    scores_c = jnp.concatenate(out_scores, axis=1)
    classes = jnp.concatenate(out_cls, axis=1)
    levels = jnp.concatenate(out_lvl, axis=1)
    locs = jnp.concatenate(out_loc, axis=1)
    valid = jnp.concatenate(out_valid, axis=1)

    # sqrt score (fcos_outputs.py:1001). NMS runs on unclipped boxes as in
    # the reference (clipping happens in detector_postprocess afterwards).
    scores_c = jnp.sqrt(jnp.clip(scores_c, 0.0))

    nboxes, nscores, nclasses, nvalid, keep_idx = batched_multiclass_nms(
        boxes, scores_c, classes, valid, cfg.nms_thresh, cfg.post_nms_topk)
    hw = image_sizes.astype(jnp.float32)
    wh = jnp.stack([hw[:, 1], hw[:, 0], hw[:, 1], hw[:, 0]], axis=-1)
    nboxes = jnp.clip(nboxes, 0.0, wh[:, None, :])
    take = lambda x: jnp.take_along_axis(x, keep_idx, axis=1)  # noqa: E731
    return Detections(
        boxes=nboxes, scores=nscores, classes=nclasses, valid=nvalid,
        locations=jnp.take_along_axis(
            locs, keep_idx[..., None].repeat(2, -1), axis=1),
        fpn_levels=take(levels),
    )
