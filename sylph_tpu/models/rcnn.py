"""Two-stage few-shot detector (Meta Faster R-CNN), TPU-native.

Rebuild of the reference's two-stage path (meta_arch/few_shot_rcnn.py:
28-316 + runner/meta_faster_rcnn_runner.py): a standard FPN Faster R-CNN
whose RPN is class-agnostic and whose ROI-head *classifier weights* come
from the code generator — the conditional linear layer
(``LinearModule``, head_utils.py:198-209) is an einsum over the class
codes, exactly like the one-stage conditional conv.

NOTE (documented divergence, SURVEY.md §7.3): the reference configures
``ROI_HEADS.NAME: BiStandardROIHeads`` which is NOT in its repo — the
two-stage path is not self-contained upstream. This implementation is a
standard detectron2-style StandardROIHeads equivalent (IoU 0.5 matcher,
512 proposals @ 25% positives, 2-FC-1024 box head, class-agnostic box
regression) with the conditional classifier, plus a learned background
row appended to the code bank so the softmax has its background class.

All stages are static-shape: anchors are host-built per canvas, RPN
keeps a fixed top-K proposal set per image, ROI sampling uses
jax.random-keyed top-k selection instead of torch's host-side
subsampling.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import decode_deltas, encode_deltas
from ..ops.losses import smooth_l1
from ..ops.nms import batched_multiclass_nms, nms_select
from ..ops.roi_align import multilevel_roi_align
from ..structures import Detections, GTBoxes, pairwise_iou
from .code_generator import CodeGeneratorHead
from .fpn import FPN
from .resnet import ResNet

ROI_DELTA_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


# ----------------------------------------------------------------- anchors
@dataclasses.dataclass(frozen=True)
class AnchorGrid:
    anchors: np.ndarray          # (K, 4) XYXY, concat over levels
    level_splits: Tuple[int, ...]
    num_anchors_per_loc: int


def build_anchor_grid(canvas_hw, strides=(4, 8, 16, 32, 64),
                      sizes=(32, 64, 128, 256, 512),
                      aspect_ratios=(0.5, 1.0, 2.0)) -> AnchorGrid:
    """detectron2 DefaultAnchorGenerator semantics: one size per level,
    shared aspect ratios, anchor centers at i*stride (offset=0.0, the
    detectron2 default), base boxes of area size^2 with w/h = sqrt(a/r),
    r*sqrt(a/r)."""
    all_anchors, splits = [], []
    for stride, size in zip(strides, sizes):
        h = -(-canvas_hw[0] // stride)
        w = -(-canvas_hw[1] // stride)
        base = []
        area = float(size) ** 2
        for ar in aspect_ratios:
            bw = math.sqrt(area / ar)
            bh = bw * ar
            base.append([-bw / 2, -bh / 2, bw / 2, bh / 2])
        base = np.asarray(base, np.float32)  # (A, 4)
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        centers = np.stack([xs, ys, xs, ys], -1).reshape(-1, 1, 4) * stride
        anchors = (centers + base[None]).reshape(-1, 4).astype(np.float32)
        all_anchors.append(anchors)
        splits.append(anchors.shape[0])
    return AnchorGrid(np.concatenate(all_anchors, 0), tuple(splits),
                      len(aspect_ratios))


# --------------------------------------------------------------------- RPN
class RPNHead(nn.Module):
    """StandardRPNHead: shared conv3x3 + 1x1 objectness/deltas."""

    num_anchors: int = 3
    channels: int = 256

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        conv = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                       kernel_init=nn.initializers.normal(0.01), name="conv")
        obj = nn.Conv(self.num_anchors, (1, 1),
                      kernel_init=nn.initializers.normal(0.01),
                      name="objectness")
        deltas = nn.Conv(self.num_anchors * 4, (1, 1),
                         kernel_init=nn.initializers.normal(0.01),
                         name="anchor_deltas")
        logits, regs = [], []
        for f in features:
            t = nn.relu(conv(f))
            b = f.shape[0]
            logits.append(obj(t).astype(jnp.float32).reshape(b, -1))
            regs.append(deltas(t).astype(jnp.float32).reshape(b, -1, 4))
        return (jnp.concatenate(logits, 1), jnp.concatenate(regs, 1))


def match_anchors(anchors: jnp.ndarray, gt: GTBoxes,
                  lo: float = 0.3, hi: float = 0.7):
    """detectron2 Matcher((0.3,0.7), allow_low_quality): returns
    (matched_gt_idx (K,), label (K,) in {-1 ignore, 0 neg, 1 pos})."""
    iou = pairwise_iou(anchors, gt.boxes)  # (K, M)
    iou = jnp.where(gt.valid[None, :], iou, -1.0)
    best = jnp.max(iou, axis=1)
    idx = jnp.argmax(iou, axis=1)
    label = jnp.where(best >= hi, 1, jnp.where(best < lo, 0, -1))
    # low-quality matches: anchors that are argmax for some gt become pos
    # (detectron2 set_low_quality_matches_ uses EXACT max equality —
    # ties included, no epsilon band; both sides come from the same
    # pairwise_iou computation so float equality is well-defined)
    gt_best = jnp.max(iou, axis=0)  # (M,)
    is_best_for_gt = jnp.any(
        (iou == gt_best[None, :]) & (iou > 0) & gt.valid[None, :],
        axis=1)
    label = jnp.where(is_best_for_gt, 1, label)
    label = jnp.where(jnp.any(gt.valid), label, jnp.zeros_like(label))
    return idx, label


def subsample_labels(label: jnp.ndarray, num_samples: int,
                     pos_fraction: float, key) -> jnp.ndarray:
    """Random subsample to num_samples with the given positive fraction.
    Returns a weight vector (K,) — 1 for kept, 0 otherwise. Static-shape
    version of detectron2 subsample_labels: random priorities + top-k."""
    k_pos = int(num_samples * pos_fraction)
    pos = label == 1
    neg = label == 0
    r = jax.random.uniform(key, label.shape)
    pos_rank = jnp.where(pos, r, -1.0)
    pos_th = _kth_largest(pos_rank, k_pos)
    keep_pos = pos & (pos_rank >= pos_th)
    num_neg = num_samples - jnp.minimum(jnp.sum(keep_pos), k_pos)
    neg_rank = jnp.where(neg, r, -1.0)
    # take top num_neg negatives by random priority (num_neg is dynamic:
    # use rank threshold via sorted values)
    sorted_neg = jnp.sort(neg_rank)[::-1]
    idx = jnp.clip(num_neg - 1, 0, label.shape[0] - 1)
    neg_th = jnp.maximum(sorted_neg[idx], 0.0)
    keep_neg = neg & (neg_rank >= neg_th)
    return (keep_pos | keep_neg).astype(jnp.float32)


def _kth_largest(x, k):
    s = jnp.sort(x)[::-1]
    return jnp.maximum(s[jnp.clip(k - 1, 0, x.shape[0] - 1)], 0.0)


def rpn_losses(obj_logits, deltas, anchors, gt: GTBoxes, key,
               batch_per_image: int = 256, pos_fraction: float = 0.5,
               axis_name: Optional[str] = None):
    """RPN objectness BCE + smooth-l1 on positive anchors (detectron2
    normalization: / (N * batch_per_image))."""
    def per_image(logits, regs, g, k):
        idx, label = match_anchors(anchors, g)
        w = subsample_labels(label, batch_per_image, pos_fraction, k)
        pos = (label == 1) & (w > 0)
        target = encode_deltas(anchors, g.boxes[idx])
        loc = jnp.sum(jnp.where(pos[:, None],
                                smooth_l1(regs, target, beta=0.0), 0.0))
        from ..ops.losses import bce_with_logits
        obj = jnp.sum(w * bce_with_logits(logits, (label == 1)))
        return obj, loc

    b = obj_logits.shape[0]
    keys = jax.random.split(key, b)
    obj, loc = jax.vmap(per_image)(obj_logits, deltas, gt, keys)
    denom = b * batch_per_image
    losses = {"loss_rpn_cls": jnp.sum(obj) / denom,
              "loss_rpn_loc": jnp.sum(loc) / denom}
    if axis_name:
        losses = {k: jax.lax.pmean(v, axis_name) for k, v in losses.items()}
    return losses


def rpn_proposals(obj_logits, deltas, anchors, level_splits, image_sizes,
                  pre_nms_topk: int = 1000, post_nms_topk: int = 1000,
                  nms_thresh: float = 0.7, min_size: float = 0.0):
    """Decode + per-level top-k + level-aware NMS → (B, P, 4) + valid."""
    b = obj_logits.shape[0]
    boxes_all, scores_all, level_all, valid_all = [], [], [], []
    start = 0
    for li, count in enumerate(level_splits):
        sl = slice(start, start + count)
        k = min(pre_nms_topk, count)
        scores, idx = jax.lax.top_k(obj_logits[:, sl], k)  # (B, k)
        a = anchors[sl][idx]                               # (B, k, 4)
        d = jnp.take_along_axis(deltas[:, sl], idx[..., None], axis=1)
        bx = decode_deltas(a, d)
        hw = image_sizes.astype(jnp.float32)
        wh = jnp.stack([hw[:, 1], hw[:, 0], hw[:, 1], hw[:, 0]], -1)
        bx = jnp.clip(bx, 0.0, wh[:, None, :])
        ok = ((bx[..., 2] - bx[..., 0] > min_size)
              & (bx[..., 3] - bx[..., 1] > min_size))
        boxes_all.append(bx)
        scores_all.append(jax.nn.sigmoid(scores))
        level_all.append(jnp.full(scores.shape, li, jnp.int32))
        valid_all.append(ok)
        start += count
    boxes = jnp.concatenate(boxes_all, 1)
    scores = jnp.concatenate(scores_all, 1)
    levels = jnp.concatenate(level_all, 1)
    valid = jnp.concatenate(valid_all, 1)
    nb, ns, _, nv, _ = batched_multiclass_nms(
        boxes, scores, levels, valid, nms_thresh, post_nms_topk)
    return nb, ns, nv


# ----------------------------------------------------------------- ROI head
class ROIBoxHead(nn.Module):
    """FastRCNNConvFCHead (2 FC) + predictors. Conditional classifier
    when class codes are given; ``cosine_sim`` switches the base
    classifier to the TFA cosine output layer (reference
    roi_heads/tfa_fast_rcnn.py:22-86 CosineSimOutputLayers: x and weight
    rows L2-normalized, logits scaled by COSINE_SCALE; -1 = learnable,
    init 20)."""

    fc_dim: int = 1024
    num_fc: int = 2
    num_classes: int = 80        # base-detector classifier size
    cls_agnostic_bbox: bool = True
    cosine_sim: bool = False
    cosine_scale: float = -1.0

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray,
                 class_code: Optional[Dict[str, jnp.ndarray]] = None):
        """roi_feats: (N, P, P, C) → (scores (N, C+1), deltas (N, 4))."""
        x = roi_feats.reshape(roi_feats.shape[0], -1).astype(jnp.float32)
        for i in range(self.num_fc):
            x = nn.relu(nn.Dense(self.fc_dim, name=f"fc{i + 1}")(x))
        if class_code is None and self.cosine_sim:
            w = self.param("cosine_weight", nn.initializers.normal(0.01),
                           (self.num_classes + 1, self.fc_dim))
            scale = (self.param("cosine_scale_param",
                                nn.initializers.constant(20.0), ())
                     if self.cosine_scale == -1.0 else self.cosine_scale)
            xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-5)
            wn = w / (jnp.linalg.norm(w, axis=-1, keepdims=True) + 1e-5)
            scores = scale * (xn @ wn.T)
        elif class_code is None:
            scores = nn.Dense(self.num_classes + 1,
                              kernel_init=nn.initializers.normal(0.01),
                              name="cls_score")(x)
        else:
            w = class_code["cls_conv"].reshape(-1, self.fc_dim)  # (E, D)
            bias = class_code["cls_bias"].reshape(-1)
            cond = jnp.einsum("nd,ed->ne", x, w.astype(x.dtype)) + bias
            bg_w = self.param("bg_weight", nn.initializers.normal(0.01),
                              (self.fc_dim,))
            bg_b = self.param("bg_bias", nn.initializers.zeros, ())
            bg = (x @ bg_w + bg_b)[:, None]
            scores = jnp.concatenate([cond, bg], axis=-1)
        n_delta = 4 if self.cls_agnostic_bbox else 4 * self.num_classes
        deltas = nn.Dense(n_delta, kernel_init=nn.initializers.normal(0.001),
                          name="bbox_pred")(x)
        return scores, deltas


def sample_rois(proposals, prop_valid, gt: GTBoxes, key,
                batch_size: int = 512, pos_fraction: float = 0.25,
                iou_thresh: float = 0.5):
    """Match (proposals + gt) to gt, subsample. Returns rois (S, 4),
    target class index into gt slots (-1 = background), matched gt idx,
    sample weights (S,). Static S = batch_size."""
    boxes = jnp.concatenate([proposals, gt.boxes], 0)
    valid = jnp.concatenate([prop_valid, gt.valid], 0)
    iou = pairwise_iou(boxes, gt.boxes)
    iou = jnp.where(gt.valid[None, :] & valid[:, None], iou, -1.0)
    best = jnp.max(iou, axis=1)
    idx = jnp.argmax(iou, axis=1)
    is_pos = (best >= iou_thresh) & valid
    is_neg = (best < iou_thresh) & valid
    label = jnp.where(is_pos, 1, jnp.where(is_neg, 0, -1))
    k_sub, k_tie = jax.random.split(key)
    w = subsample_labels(label, batch_size, pos_fraction, k_sub)
    # select exactly batch_size rois (weighted ones first); the
    # tiebreak stream is independent of the subsample stream
    order = jnp.argsort(-(w + jax.random.uniform(k_tie, w.shape) * 1e-3))
    sel = order[:batch_size]
    return (boxes[sel], idx[sel],
            (label[sel] == 1) & (w[sel] > 0),
            w[sel] > 0)


def roi_losses(scores, deltas, rois, gt: GTBoxes, matched_idx, is_pos,
               is_sampled, class_targets, axis_name: Optional[str] = None):
    """Softmax CE + class-agnostic smooth-l1 (detectron2 FastRCNNOutputs).

    class_targets: (S,) int — index into the score columns for each roi's
    matched gt (background column = scores.shape[-1]-1 handled here).
    """
    num_cols = scores.shape[-1]
    bg = num_cols - 1
    tgt = jnp.where(is_pos, class_targets, bg)
    logp = jax.nn.log_softmax(scores, axis=-1)
    ce = -jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
    n_sampled = jnp.maximum(jnp.sum(is_sampled), 1.0)
    cls_loss = jnp.sum(jnp.where(is_sampled, ce, 0.0)) / n_sampled

    target_deltas = encode_deltas(rois, gt.boxes[matched_idx],
                                  ROI_DELTA_WEIGHTS)
    loc = jnp.sum(jnp.where(is_pos[:, None],
                            smooth_l1(deltas, target_deltas, beta=0.0),
                            0.0)) / n_sampled
    losses = {"loss_cls": cls_loss, "loss_box_reg": loc}
    if axis_name:
        losses = {k: jax.lax.pmean(v, axis_name) for k, v in losses.items()}
    return losses


# --------------------------------------------------------------- meta-arch
class FewShotRCNN(nn.Module):
    """Two-stage few-shot detector meta-arch (FewShotDetector analog)."""

    depth: int = 50
    backbone_out_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    fpn_out_channels: int = 256
    roi_in_levels: int = 4           # P2-P5 feed the ROI head + codegen
    num_classes: int = 80
    fc_dim: int = 1024
    cosine_sim: bool = False         # TFA CosineSimOutputLayers classifier
    cosine_scale: float = -1.0
    code_generator_name: str = "CodeGenerator"
    code_generator_kwargs: Dict[str, Any] = None
    pixel_mean: Sequence[float] = (103.530, 116.280, 123.675)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    anchor_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    stop_backbone_grad: bool = False
    compute_dtype: Any = jnp.bfloat16
    s2d_stem: bool = False

    # strides of [P2..P6]
    RPN_STRIDES = (4, 8, 16, 32, 64)
    ROI_STRIDES = (4, 8, 16, 32)

    def setup(self):
        self.backbone = ResNet(
            depth=self.depth, out_features=tuple(self.backbone_out_features),
            compute_dtype=self.compute_dtype, s2d_stem=self.s2d_stem,
            name="backbone")
        self.fpn = FPN(in_features=tuple(self.backbone_out_features),
                       out_channels=self.fpn_out_channels, top_levels=1,
                       top_block="maxpool",
                       compute_dtype=self.compute_dtype, name="fpn")
        self.rpn_head = RPNHead(num_anchors=len(self.anchor_ratios),
                                channels=self.fpn_out_channels,
                                name="rpn_head")
        self.box_head = ROIBoxHead(fc_dim=self.fc_dim,
                                   num_classes=self.num_classes,
                                   cosine_sim=self.cosine_sim,
                                   cosine_scale=self.cosine_scale,
                                   name="box_head")
        if self.code_generator_name in ("none", None, ""):
            # TFA-RCNN variant: a plain (non-episodic) Faster R-CNN
            # finetuned with surgical freezing — no hypernetwork
            # (reference meta_arch/tfa_rcnn.py:18-34).
            self.code_generator = None
        else:
            kwargs = dict(self.code_generator_kwargs or {})
            kwargs.setdefault("strides", tuple(self.ROI_STRIDES))
            kwargs.setdefault("out_channel", self.fc_dim)
            kwargs.setdefault("compute_dtype", self.compute_dtype)
            self.code_generator = CodeGeneratorHead(name="code_generator",
                                                    **kwargs)

    def _normalize(self, images):
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        return ((images - mean) / std).astype(self.compute_dtype)

    def extract_features(self, images) -> List[jnp.ndarray]:
        outs = self.fpn(self.backbone(self._normalize(images)))  # P2-P6
        if self.stop_backbone_grad:
            outs = [jax.lax.stop_gradient(o) for o in outs]
        return outs

    def forward_rpn(self, images):
        feats = self.extract_features(images)
        logits, deltas = self.rpn_head(feats)
        return feats, logits, deltas

    def roi_forward(self, feats, rois, rois_valid,
                    class_code: Optional[Dict] = None):
        """ROIAlign P2-P5 + box head for one image's rois."""
        pooled = multilevel_roi_align(
            feats[:self.roi_in_levels], tuple(self.ROI_STRIDES),
            rois, rois_valid, output_size=7)
        return self.box_head(pooled, class_code)

    def forward_class_code(self, support_images, support_boxes,
                           support_box_valid, num_shots,
                           training: bool = False):
        feats = self.extract_features(support_images)
        return self.code_generator(feats[:self.roi_in_levels],
                                   support_boxes, support_box_valid,
                                   num_shots=num_shots, training=training)

    def normalize_code(self, codes):
        return self.code_generator(class_codes=codes)

    def __call__(self, images):
        feats, logits, deltas = self.forward_rpn(images)
        return logits, deltas

    # ------------------------------------------------------------- training
    def forward_episodic_train(
        self, support_images, support_boxes, support_box_valid,
        query_images, query_gt: GTBoxes, episode_class_ids, rng,
        anchors, level_splits: Tuple[int, ...], image_sizes,
        num_shots: int, axis_name: Optional[str] = None,
        rpn_post_nms: int = 256, roi_batch: int = 128,
        rpn_pre_nms: int = 1000,
    ) -> Dict[str, jnp.ndarray]:
        """One episodic two-stage training forward → loss dict
        (reference forward_few_shot_detector_training,
        few_shot_rcnn.py:165-225). GT is already filtered to episode
        classes by the caller."""
        sfeats = self.extract_features(support_images)
        codes = self.code_generator(
            sfeats[:self.roi_in_levels], support_boxes, support_box_valid,
            num_shots=num_shots, training=True)

        qfeats, obj_logits, deltas = self.forward_rpn(query_images)
        k_rpn, k_roi = jax.random.split(jax.random.fold_in(rng, 1))
        losses = rpn_losses(obj_logits, deltas, anchors, query_gt, k_rpn,
                            axis_name=axis_name)

        props, _, props_valid = rpn_proposals(
            jax.lax.stop_gradient(obj_logits),
            jax.lax.stop_gradient(deltas), anchors, level_splits,
            image_sizes, pre_nms_topk=rpn_pre_nms,
            post_nms_topk=rpn_post_nms)

        b = query_images.shape[0]
        # contiguous dataset id -> episode column
        def class_to_episode(labels):
            eq = labels[:, None] == episode_class_ids[None, :]
            return jnp.where(jnp.any(eq, -1), jnp.argmax(eq, -1),
                             episode_class_ids.shape[0])

        cls_l, box_l = [], []
        for i in range(b):  # trace-time loop, b is small per shard
            g = jax.tree.map(lambda x: x[i], query_gt)
            rois, midx, is_pos, is_sampled = sample_rois(
                props[i], props_valid[i], g, jax.random.fold_in(k_roi, i),
                batch_size=roi_batch)
            scores, rdeltas = self.roi_forward(
                [f[i] for f in qfeats], rois,
                jnp.ones((roi_batch,), bool), codes)
            rl = roi_losses(scores, rdeltas, rois, g, midx, is_pos,
                            is_sampled, class_to_episode(g.labels[midx]))
            cls_l.append(rl["loss_cls"])
            box_l.append(rl["loss_box_reg"])
        cls_loss = jnp.mean(jnp.stack(cls_l))
        box_loss = jnp.mean(jnp.stack(box_l))
        if axis_name:
            cls_loss = jax.lax.pmean(cls_loss, axis_name)
            box_loss = jax.lax.pmean(box_loss, axis_name)
        losses["loss_cls"] = cls_loss
        losses["loss_box_reg"] = box_loss
        if "snnl" in codes:
            losses["loss_snnl"] = codes["snnl"]
        return losses

    def forward_pretrain_train(
        self, query_images, query_gt: GTBoxes, rng, anchors,
        level_splits: Tuple[int, ...], image_sizes,
        axis_name: Optional[str] = None, rpn_post_nms: int = 256,
        roi_batch: int = 128, rpn_pre_nms: int = 1000,
    ) -> Dict[str, jnp.ndarray]:
        """Plain Faster R-CNN training forward (base pretrain and the
        TFA-RCNN finetune baseline, reference tfa_rcnn.py:18-34 — the
        freezing itself is the optimizer mask). Classifier columns are
        the contiguous dataset labels (num_classes + background)."""
        qfeats, obj_logits, deltas = self.forward_rpn(query_images)
        k_rpn, k_roi = jax.random.split(jax.random.fold_in(rng, 1))
        losses = rpn_losses(obj_logits, deltas, anchors, query_gt, k_rpn,
                            axis_name=axis_name)
        props, _, props_valid = rpn_proposals(
            jax.lax.stop_gradient(obj_logits),
            jax.lax.stop_gradient(deltas), anchors, level_splits,
            image_sizes, pre_nms_topk=rpn_pre_nms,
            post_nms_topk=rpn_post_nms)

        b = query_images.shape[0]
        cls_l, box_l = [], []
        for i in range(b):
            g = jax.tree.map(lambda x: x[i], query_gt)
            rois, midx, is_pos, is_sampled = sample_rois(
                props[i], props_valid[i], g, jax.random.fold_in(k_roi, i),
                batch_size=roi_batch)
            scores, rdeltas = self.roi_forward(
                [f[i] for f in qfeats], rois,
                jnp.ones((roi_batch,), bool), None)
            rl = roi_losses(scores, rdeltas, rois, g, midx, is_pos,
                            is_sampled, g.labels[midx])
            cls_l.append(rl["loss_cls"])
            box_l.append(rl["loss_box_reg"])
        cls_loss = jnp.mean(jnp.stack(cls_l))
        box_loss = jnp.mean(jnp.stack(box_l))
        if axis_name:
            cls_loss = jax.lax.pmean(cls_loss, axis_name)
            box_loss = jax.lax.pmean(box_loss, axis_name)
        losses["loss_cls"] = cls_loss
        losses["loss_box_reg"] = box_loss
        return losses

    # ------------------------------------------------------------ inference
    def forward_base_instances(
        self, images, anchors, level_splits: Tuple[int, ...], image_sizes,
        rpn_post_nms: int = 1000, score_thresh: float = 0.05,
        nms_thresh: float = 0.5, max_dets: int = 100,
        rpn_pre_nms: int = 1000,
    ) -> Detections:
        """Plain two-stage inference with the trained classifier (base
        detector / TFA-RCNN eval path)."""
        n = self.num_classes
        code = None
        return self._two_stage_infer(
            images, code, anchors, level_splits, image_sizes, rpn_post_nms,
            score_thresh, nms_thresh, max_dets,
            class_valid=jnp.ones((n,), bool), rpn_pre_nms=rpn_pre_nms)

    def forward_instances(
        self, images, class_code: Dict[str, jnp.ndarray], anchors,
        level_splits: Tuple[int, ...], image_sizes,
        rpn_post_nms: int = 1000, score_thresh: float = 0.05,
        nms_thresh: float = 0.5, max_dets: int = 100,
        class_valid: Optional[jnp.ndarray] = None,
        rpn_pre_nms: int = 1000,
    ) -> Detections:
        """Conditioned two-stage inference (FewShotDetector
        "meta_learn_test_instance", few_shot_rcnn.py:230-306)."""
        return self._two_stage_infer(
            images, class_code, anchors, level_splits, image_sizes,
            rpn_post_nms, score_thresh, nms_thresh, max_dets, class_valid,
            rpn_pre_nms=rpn_pre_nms)

    def _two_stage_infer(
        self, images, class_code, anchors, level_splits, image_sizes,
        rpn_post_nms, score_thresh, nms_thresh, max_dets, class_valid,
        rpn_pre_nms: int = 1000,
    ) -> Detections:
        feats, obj_logits, deltas = self.forward_rpn(images)
        props, _, props_valid = rpn_proposals(
            obj_logits, deltas, anchors, level_splits, image_sizes,
            pre_nms_topk=rpn_pre_nms, post_nms_topk=rpn_post_nms)
        b = images.shape[0]
        n_codes = (class_code["cls_conv"].shape[0]
                   if class_code is not None else self.num_classes)
        if class_valid is None:
            class_valid = jnp.ones((n_codes,), bool)
        dets = []
        for i in range(b):
            scores, rdeltas = self.roi_forward(
                [f[i] for f in feats], props[i], props_valid[i], class_code)
            probs = jax.nn.softmax(scores, axis=-1)[:, :-1]  # drop bg
            boxes = decode_deltas(props[i], rdeltas, ROI_DELTA_WEIGHTS)
            hw = image_sizes[i].astype(jnp.float32)
            boxes = jnp.clip(boxes, 0.0,
                             jnp.stack([hw[1], hw[0], hw[1], hw[0]]))
            # flatten (P, E) score grid to candidates
            p, e = probs.shape
            flat = probs.reshape(-1)
            cand_valid = (jnp.repeat(props_valid[i], e)
                          & (flat > score_thresh)
                          & jnp.tile(class_valid[:e], p))
            cls = jnp.tile(jnp.arange(e, dtype=jnp.int32), p)
            bxs = jnp.repeat(boxes, e, axis=0)
            nb, ns, nc, nv, _ = batched_multiclass_nms(
                bxs[None], flat[None], cls[None], cand_valid[None],
                nms_thresh, max_dets)
            dets.append((nb[0], ns[0], nc[0], nv[0]))
        boxes = jnp.stack([d[0] for d in dets])
        return Detections(
            boxes=boxes,
            scores=jnp.stack([d[1] for d in dets]),
            classes=jnp.stack([d[2] for d in dets]),
            valid=jnp.stack([d[3] for d in dets]),
            locations=jnp.zeros((*boxes.shape[:2], 2), jnp.float32),
            fpn_levels=jnp.zeros(boxes.shape[:2], jnp.int32))
