"""FCOS losses (pretraining and episodic meta-learning).

Pure functions over the flat ``(B, K, ...)`` prediction tensors.
Reference behavior reproduced from fcos_outputs.py:
  * ``fcos_losses`` (pretrain, :639-741) with the ``BOX_QUALITY``
    dispatch {['ctrness'], ['iou'], ['ctrness','iou']}, the OWD/freeze
    detach of losses, and the optional IOU_MASK;
  * ``fcos_losses_episodic_learning`` (:496-637) with the per-episode
    one-hot ``support_set_targets == labels`` class target (:527) and
    optional distillation loss vs the pretrained cls_logits kernel;
  * cross-device loss normalization: the reference all_reduces the
    positive count and the ctrness-target sum so per-rank losses match
    single-device math (reduce_sum at :520-523,555-557,648-651,684-685)
    — here a ``jax.lax.psum`` over the data mesh axis when ``axis_name``
    is given.

Losses are returned **un-detached**; freezing decides what reaches the
optimizer via gradient masking (the TPU analog of the reference's
``requires_grad=False`` + ``.detach()`` pattern), but the loss *keys*
still honor the reference's conditional inclusion so logged totals match.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .assigner import FCOSTargets, compute_ctrness_targets
from .losses import (bce_with_logits, compute_ious_ltrb, iou_loss_ltrb,
                     sigmoid_focal_loss)


class FCOSLossCfg(NamedTuple):
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    loc_loss_type: str = "giou"
    box_quality: Tuple[str, ...] = ("ctrness",)   # sorted, as reference
    iou_mask: bool = False
    owd: bool = False
    freeze_cls_logits: bool = False
    box_branch_loss_on: bool = True
    distill_weight: float = 0.0


def _cross_device_mean(x: jnp.ndarray, axis_name: Optional[str]):
    """sum(x) across devices / n_devices — reference's reduce_sum/num_gpus."""
    if axis_name is None:
        return x
    return jax.lax.pmean(x, axis_name)


def _ious_gious(reg_pred, reg_targets, pos=None):
    """Reference IOULoss.compute_ious (iou_loss.py:26-65) on ltrb pairs.

    ``pos``: boolean (..., ) mask of assigned locations. The reference
    gathers positive samples before the IoU math (fcos_outputs.py
    index_select on pos_inds); this static-shape port computes at EVERY
    location then masks — so the math must stay finite on the garbage
    ltrb targets of negative locations (they can be negative: a location
    outside its nearest box). A negative target can drive
    ``area_union + 1`` to exactly 0 → inf/NaN that survives the
    ``jnp.where`` mask through the VJP (NaN·0 = NaN) and poisons every
    shared-trunk gradient. Double-where: substitute a benign target
    (all-ones) at masked locations; the loss value there is discarded by
    the outer mask, and its gradient is exactly 0.
    """
    if pos is not None:
        reg_targets = jnp.where(pos[..., None], reg_targets, 1.0)
    ious = compute_ious_ltrb(reg_pred, reg_targets)
    # giou needs the enclosing-box term; reuse iou_loss_ltrb identity:
    # iou_loss_ltrb(..., 'giou') == 1 - giou  =>  giou = 1 - loss.
    gious = 1.0 - iou_loss_ltrb(reg_pred, reg_targets, "giou")
    return ious, gious


def _loc_loss(ious, gious, loss_type: str):
    if loss_type == "iou":
        return -jnp.log(jnp.maximum(ious, 1e-9))
    if loss_type == "linear_iou":
        return 1.0 - ious
    if loss_type == "giou":
        return 1.0 - gious
    raise ValueError(loss_type)


def fcos_pretrain_losses(
    logits: jnp.ndarray,        # (B, K, C)
    reg_pred: jnp.ndarray,      # (B, K, 4) stride-normalized
    ctrness_pred: jnp.ndarray,  # (B, K)
    iou_pred: jnp.ndarray,      # (B, K)
    targets: FCOSTargets,       # labels (B, K), reg_targets (B, K, 4)
    cfg: FCOSLossCfg,
    axis_name: Optional[str] = None,
    num_pos_avg: Optional[jnp.ndarray] = None,
    loss_denorm: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Pretraining losses (reference fcos_losses, fcos_outputs.py:639-741).

    ``num_pos_avg`` / ``loss_denorm``: precomputed global normalizers —
    gradient accumulation (train/steps.py) treats micro-batches as
    virtual devices and must normalize each micro loss by the same
    cross-micro mean the reference's reduce_sum would produce; they are
    pure functions of the targets, so the step computes them once
    outside the accumulation scan.
    """
    num_classes = logits.shape[-1]
    labels = targets.labels
    pos = labels >= 0  # (B, K)
    posf = pos.astype(jnp.float32)

    num_pos = jnp.sum(posf)
    if num_pos_avg is None:
        num_pos_avg = jnp.maximum(
            _cross_device_mean(num_pos, axis_name), 1.0)

    class_target = jax.nn.one_hot(jnp.where(pos, labels, num_classes),
                                  num_classes, dtype=jnp.float32)
    cls_loss = jnp.sum(sigmoid_focal_loss(
        logits, class_target, cfg.focal_alpha, cfg.focal_gamma)) / num_pos_avg

    ious, gious = _ious_gious(reg_pred, targets.reg_targets, pos)
    iou_fg = ious
    if cfg.iou_mask:
        iou_fg = jnp.where(iou_fg < 0.3, 0.0, iou_fg)

    ctr_t = compute_ctrness_targets(targets.reg_targets)
    ctr_t = jnp.where(pos, ctr_t, 0.0)
    if loss_denorm is None:
        loss_denorm = jnp.maximum(
            _cross_device_mean(jnp.sum(ctr_t), axis_name), 1e-6)

    ctr_loss = jnp.sum(
        jnp.where(pos, bce_with_logits(ctrness_pred, ctr_t), 0.0)) / num_pos_avg
    iou_loss_q = jnp.sum(jnp.where(
        pos, bce_with_logits(iou_pred, jax.lax.stop_gradient(iou_fg)),
        0.0)) / num_pos_avg

    per_loc = _loc_loss(ious, gious, cfg.loc_loss_type)

    losses: Dict[str, jnp.ndarray] = {}
    if not (cfg.owd or cfg.freeze_cls_logits):
        losses["loss_fcos_cls"] = cls_loss

    bq = tuple(sorted(cfg.box_quality))
    if bq == ("ctrness", "iou"):
        reg_loss = jnp.sum(jnp.where(pos, per_loc * ctr_t, 0.0)) / loss_denorm
        if cfg.box_branch_loss_on:
            losses["loss_fcos_iou"] = iou_loss_q
            losses["loss_fcos_ctr"] = ctr_loss
            losses["loss_fcos_loc"] = reg_loss
    elif bq == ("ctrness",):
        reg_loss = jnp.sum(jnp.where(pos, per_loc * ctr_t, 0.0)) / loss_denorm
        if cfg.box_branch_loss_on:
            losses["loss_fcos_ctr"] = ctr_loss
            losses["loss_fcos_loc"] = reg_loss
    elif bq == ("iou",):
        reg_loss = jnp.sum(jnp.where(pos, per_loc, 0.0)) / num_pos_avg
        if cfg.box_branch_loss_on:
            losses["loss_fcos_iou"] = iou_loss_q
            losses["loss_fcos_loc"] = reg_loss
    else:
        raise NotImplementedError(f"BOX_QUALITY {bq}")
    return losses


def fcos_episodic_losses(
    logits: jnp.ndarray,          # (B, K, N_way)
    reg_pred: jnp.ndarray,        # (B, K, 4)
    ctrness_pred: jnp.ndarray,    # (B, K)
    targets: FCOSTargets,
    episode_class_ids: jnp.ndarray,   # (N_way,) contiguous dataset ids
    cfg: FCOSLossCfg,
    axis_name: Optional[str] = None,
    class_code: Optional[Dict[str, jnp.ndarray]] = None,
    pretrained_kernel: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    num_pos_avg: Optional[jnp.ndarray] = None,
    loss_denorm: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Episodic losses (reference fcos_losses_episodic_learning,
    fcos_outputs.py:496-637).

    The class target is the per-episode one-hot
    ``episode_class_ids[c] == labels[b,k]`` (:527) — background labels
    (-1) match nothing.
    """
    labels = targets.labels
    pos = labels >= 0
    posf = pos.astype(jnp.float32)
    num_pos = jnp.sum(posf)
    if num_pos_avg is None:
        num_pos_avg = jnp.maximum(
            _cross_device_mean(num_pos, axis_name), 1.0)

    class_target = (labels[..., None]
                    == episode_class_ids[None, None, :]).astype(jnp.float32)
    cls_loss = jnp.sum(sigmoid_focal_loss(
        logits, class_target, cfg.focal_alpha, cfg.focal_gamma)) / num_pos_avg

    ctr_t = jnp.where(pos, compute_ctrness_targets(targets.reg_targets), 0.0)
    if loss_denorm is None:
        loss_denorm = jnp.maximum(
            _cross_device_mean(jnp.sum(ctr_t), axis_name), 1e-6)

    ious, gious = _ious_gious(reg_pred, targets.reg_targets, pos)
    per_loc = _loc_loss(ious, gious, cfg.loc_loss_type)
    reg_loss = jnp.sum(jnp.where(pos, per_loc * ctr_t, 0.0)) / loss_denorm
    ctr_loss = jnp.sum(
        jnp.where(pos, bce_with_logits(ctrness_pred, ctr_t), 0.0)) / num_pos_avg

    losses = {"loss_fcos_cls": cls_loss}

    if (pretrained_kernel is not None and class_code is not None
            and cfg.distill_weight > 0):
        # Distill generated codes toward the pretrained cls_logits rows for
        # the episode classes (fcos_outputs.py:595-626). L1, mean reduction.
        w, b = pretrained_kernel            # (C_base, 256), (C_base,)
        target_w = w[episode_class_ids]     # (N_way, 256)
        target_b = b[episode_class_ids]     # (N_way,)
        gen_w = class_code["cls_conv"].reshape(target_w.shape)
        gen_b = class_code["cls_bias"].reshape(target_b.shape)
        distill = (jnp.mean(jnp.abs(gen_w - target_w))
                   + jnp.mean(jnp.abs(gen_b - target_b))) * cfg.distill_weight
        losses["loss_gen_distill"] = distill

    if cfg.box_branch_loss_on:
        losses["loss_fcos_loc"] = reg_loss
        losses["loss_fcos_ctr"] = ctr_loss
    return losses
