"""Optimizer, LR schedule, and gradient-mask freezing.

Reference training recipe (configs + d2go defaults):
  * SGD momentum 0.9, weight decay 1e-4 (none on norm params when
    WEIGHT_DECAY_NORM=0), linear warmup 1000 iters factor 1/1000,
    multistep gamma 0.1 at SOLVER.STEPS, optional grad-clip norm 1.0
    (Meta-FCOS-finetune.yaml SOLVER).
  * Freezing (meta_one_stage_detector.py:101-172): torch flips
    ``requires_grad``; the functional equivalent is a boolean pytree
    mask feeding ``optax.masked`` zero-updates, so frozen leaves stay
    exactly constant (and FrozenBN scale/bias are always frozen).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import optax


def build_lr_schedule(base_lr: float, steps: Sequence[int], gamma: float,
                      warmup_iters: int, warmup_factor: float
                      ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """d2go WarmupMultiStepLR equivalent (linear warmup)."""
    steps = tuple(steps)

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        warm = jnp.where(
            count < warmup_iters,
            warmup_factor + (1.0 - warmup_factor)
            * (count / jnp.maximum(warmup_iters, 1)),
            1.0)
        decay = 1.0
        for s in steps:
            decay = decay * jnp.where(count >= s, gamma, 1.0)
        return base_lr * warm * decay

    return schedule


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


def build_freeze_mask(params, freeze_cfg: Dict[str, Any]):
    """Boolean pytree: True = trainable.

    freeze_cfg keys (all optional, mirroring the reference's cfg knobs):
      backbone (MODEL.BACKBONE.FREEZE), backbone_exclude (FREEZE_EXCLUDE
      substrings), proposal_generator (PROPOSAL_GENERATOR.FREEZE),
      cls_tower, cls_logits, bbox_branch, bbox_tower, owd,
      code_generator (CODE_GENERATOR.FREEZE), episodic (freezes
      cls_logits — fcos.py:495-497).
    FrozenBN statistics are always frozen.
    """
    f = {k: freeze_cfg.get(k, False) for k in (
        "backbone", "proposal_generator", "cls_tower", "cls_logits",
        "bbox_branch", "bbox_tower", "owd", "code_generator", "episodic",
        "roi_heads", "roi_heads_feat")}
    exclude = freeze_cfg.get("backbone_exclude", []) or []

    def trainable(path, leaf) -> bool:
        p = _path_str(path)
        # FrozenBatchNorm scale/bias are constants by definition.
        if "_bn" in p and ("/scale" in p or "/bias" in p):
            return False
        # detectron2's "backbone" is ResNet+FPN combined
        # (build_fcos_resnet_fpn_backbone) — FREEZE covers both subtrees.
        if ((p.startswith("backbone/") or p.startswith("fpn/"))
                and f["backbone"]):
            return any(e in p for e in exclude)
        if p.startswith("fcos_head/"):
            if f["proposal_generator"]:
                return False
            if "cls_tower" in p and (f["cls_tower"] or f["owd"]):
                return False
            if "cls_logits" in p and (f["cls_logits"] or f["owd"]
                                      or f["episodic"]):
                return False
            if "bbox_tower" in p and (f["bbox_branch"] or f["bbox_tower"]):
                return False
            if f["bbox_branch"] and any(m in p for m in (
                    "bbox_pred", "ctrness", "iou_overlap")):
                return False
        if p.startswith("code_generator/") and f["code_generator"]:
            return False
        # two-stage (FewShotRCNN) subtrees: RPN counts as the proposal
        # generator, the box head as ROI heads (reference
        # few_shot_rcnn.py:67-91, tfa_rcnn.py:18-34)
        if p.startswith("rpn_head/") and f["proposal_generator"]:
            return False
        if p.startswith("box_head/") and f["roi_heads"]:
            return False
        # TFA-RCNN: freeze only the box-head FC features, leaving the
        # predictors trainable (ROI_HEADS.FREEZE_FEAT, tfa_rcnn.py:30-34)
        if p.startswith("box_head/fc") and f["roi_heads_feat"]:
            return False
        return True

    return jax.tree_util.tree_map_with_path(trainable, params)


def build_optimizer(params, *, base_lr: float, momentum: float = 0.9,
                    weight_decay: float = 1e-4,
                    weight_decay_norm: float = 0.0,
                    steps: Sequence[int] = (60000, 80000),
                    gamma: float = 0.1, warmup_iters: int = 1000,
                    warmup_factor: float = 1e-3,
                    clip_grad_norm: float = 0.0,
                    freeze_cfg: Dict[str, Any] = None):
    """SGD+momentum with the reference recipe; returns (tx, schedule)."""
    schedule = build_lr_schedule(base_lr, steps, gamma, warmup_iters,
                                 warmup_factor)

    def wd_mask(p):
        def is_decayed(path, leaf):
            s = _path_str(path)
            # skip weight decay on norm/scale/bias params (detectron2
            # WEIGHT_DECAY_NORM=0 semantics)
            if leaf.ndim <= 1:
                return weight_decay_norm > 0
            return True
        return jax.tree_util.tree_map_with_path(is_decayed, p)

    chain = []
    if weight_decay > 0:
        chain.append(optax.add_decayed_weights(weight_decay, mask=wd_mask))
    chain.append(optax.sgd(learning_rate=schedule, momentum=momentum))
    if clip_grad_norm and clip_grad_norm > 0:
        chain.insert(0, optax.clip_by_global_norm(clip_grad_norm))
    tx = optax.chain(*chain)

    if freeze_cfg:
        mask = build_freeze_mask(params, freeze_cfg)
        # zero updates for frozen leaves
        tx = optax.chain(
            optax.masked(optax.set_to_zero(),
                         jax.tree.map(lambda m: not m, mask)),
            optax.masked(tx, mask))
    return tx, schedule
