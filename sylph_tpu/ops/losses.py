"""Loss primitives.

TPU note: these are plain jnp expressions — XLA fuses them into the
surrounding graph, replacing the reference's TorchScript-fused
``sigmoid_focal_loss_jit`` (fvcore; used at fcos_outputs.py:21,530,658)
and the CUDA-side reductions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                       alpha: float = 0.25, gamma: float = 2.0) -> jnp.ndarray:
    """Element-wise sigmoid focal loss (RetinaNet/FCOS form).

    Matches fvcore.sigmoid_focal_loss with reduction="none":
      p = sigmoid(x); ce = BCE(x, t)
      loss = ce * ((1-p)*t + p*(1-t))**gamma, alpha-weighted.
    """
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    ce = _bce_with_logits(logits, targets)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss


def _bce_with_logits(x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    # Numerically stable: max(x,0) - x*t + log(1+exp(-|x|))
    return jnp.clip(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))


def bce_with_logits(x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    return _bce_with_logits(x.astype(jnp.float32), t.astype(jnp.float32))


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    diff = jnp.abs(pred - target)
    if beta <= 0:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def iou_loss_ltrb(pred: jnp.ndarray, target: jnp.ndarray,
                  loss_type: str = "giou") -> jnp.ndarray:
    """IoU-family losses on FCOS (l, t, r, b) distance encodings.

    Behavior of the reference IOULoss (sylph/modeling/meta_fcos/iou_loss.py:26-86):
    pred/target are (..., 4) nonneg distances from a location to box sides.

    Returns element-wise loss of shape (...,).
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    pl_, pt_, pr_, pb_ = (pred[..., 0], pred[..., 1], pred[..., 2], pred[..., 3])
    tl_, tt_, tr_, tb_ = (target[..., 0], target[..., 1], target[..., 2], target[..., 3])

    target_area = (tl_ + tr_) * (tt_ + tb_)
    pred_area = (pl_ + pr_) * (pt_ + pb_)

    w_intersect = jnp.minimum(pl_, tl_) + jnp.minimum(pr_, tr_)
    h_intersect = jnp.minimum(pb_, tb_) + jnp.minimum(pt_, tt_)
    g_w = jnp.maximum(pl_, tl_) + jnp.maximum(pr_, tr_)
    g_h = jnp.maximum(pb_, tb_) + jnp.maximum(pt_, tt_)

    area_intersect = w_intersect * h_intersect
    area_union = target_area + pred_area - area_intersect
    ac_union = g_w * g_h

    ious = (area_intersect + 1.0) / (area_union + 1.0)
    gious = ious - (ac_union - area_union) / jnp.maximum(ac_union, 1e-9)

    if loss_type == "iou":
        return -jnp.log(ious)
    if loss_type == "linear_iou":
        return 1.0 - ious
    if loss_type == "giou":
        return 1.0 - gious
    raise ValueError(f"unknown iou loss type {loss_type}")


def compute_ious_ltrb(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Plain IoU between ltrb encodings (used for BOX_QUALITY='iou' targets,
    reference fcos_outputs.py:714-733)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    target_area = (target[..., 0] + target[..., 2]) * (target[..., 1] + target[..., 3])
    pred_area = (pred[..., 0] + pred[..., 2]) * (pred[..., 1] + pred[..., 3])
    w_i = jnp.minimum(pred[..., 0], target[..., 0]) + jnp.minimum(pred[..., 2], target[..., 2])
    h_i = jnp.minimum(pred[..., 3], target[..., 3]) + jnp.minimum(pred[..., 1], target[..., 1])
    area_i = w_i * h_i
    area_u = target_area + pred_area - area_i
    return (area_i + 1.0) / (area_u + 1.0)
