"""MetaOneStageDetector: the top-level few-shot detection model.

TPU-native rebuild of the reference meta-arch
(meta_arch/meta_one_stage_detector.py:33-455). The reference dispatches
four runtime modes through ``forward(batched_inputs, class_code,
run_type)``; here each mode is a flax *method* (selected via
``model.apply(..., method=...)``), each of which jits to one static
graph:

  * ``forward_base``        — pretraining / base-detector path
                              (reference forward_base_detector :298-323);
  * ``forward_episodic_train`` — support→codes→conditioned query head
                              (reference :325-388);
  * ``forward_class_code``  — support set → raw class codes
                              (reference :229-254, run_type
                              "meta_learn_test_support");
  * ``normalize_code``      — post-hoc code normalization (reference
                              :256-259, "meta_learn_normalize_code");
  * ``forward_instances``   — conditioned inference with a code bank
                              (reference :261-296,
                              "meta_learn_test_instance").

Input contract: images are float32 NHWC **BGR** canvases already
resized+padded by the data layer (static canvas per mode — the TPU
replacement for ImageList's per-batch pad-to-divisibility, reference
:174-178). Normalization (x - mean)/std happens here, as in the
reference (:174-178).

Episode semantics (train): the per-device batch of E episodes is the
"way" — codes are generated for the E classes of the local shard and
every query image is classified against all E of them, exactly like the
reference's per-GPU episodic batch (fcos.py:625-667). Under
``shard_map`` each data shard conditions on its local classes, matching
DDP behavior.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .code_generator import CodeGeneratorHead
from .fcos_head import FCOSHead, HeadOutputs
from .fpn import FPN
from .resnet import ResNet
from .roi_encoder import ROIEncoder


class MetaOneStageDetector(nn.Module):
    """Backbone + FPN + FCOS head + code generator."""

    # backbone
    depth: int = 50
    backbone_out_features: Sequence[str] = ("res3", "res4", "res5")
    fpn_out_channels: int = 256
    fpn_top_levels: int = 2
    # head
    num_classes: int = 80
    num_cls_convs: int = 4
    num_box_convs: int = 4
    num_share_convs: int = 0
    fcos_norm: str = "GN"
    use_scale: bool = True
    prior_prob: float = 0.01
    cls_kernel_size: int = 1
    l2_norm_cls_weight: bool = False
    use_deformable: bool = False
    fpn_strides: Sequence[int] = (8, 16, 32, 64, 128)
    # code generator
    code_generator_name: str = "CodeGenerator"   # or "ROIEncoder", "none"
    code_generator_kwargs: Dict[str, Any] = None
    # input normalization (BGR, detectron2 defaults)
    pixel_mean: Sequence[float] = (103.530, 116.280, 123.675)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    compute_dtype: Any = jnp.bfloat16
    # Rematerialize backbone activations in the backward pass (trades
    # ~30% extra FLOPs for the dominant share of training HBM — the
    # standard TPU recipe for full-resolution detection batches).
    remat_backbone: bool = False
    # When the backbone+FPN are frozen (MODEL.BACKBONE.FREEZE — in
    # detectron2 the "backbone" is ResNet+FPN combined), stop gradients
    # at the feature boundary so XLA never builds their backward pass —
    # the functional analog of requires_grad=False, worth ~2x on
    # episodic training where only heads/codegen train.
    stop_backbone_grad: bool = False
    # MXU-friendly stem: 2x2 space-to-depth + 4x4 conv, numerically
    # identical to the 7x7/s2 stem (resnet.py::stem_kernel_to_s2d).
    s2d_stem: bool = False

    def setup(self):
        backbone_cls = (nn.remat(ResNet) if self.remat_backbone else ResNet)
        self.backbone = backbone_cls(
            depth=self.depth, out_features=tuple(self.backbone_out_features),
            compute_dtype=self.compute_dtype, s2d_stem=self.s2d_stem,
            name="backbone")
        self.fpn = FPN(
            in_features=tuple(self.backbone_out_features),
            out_channels=self.fpn_out_channels,
            top_levels=self.fpn_top_levels,
            compute_dtype=self.compute_dtype, name="fpn")
        self.fcos_head = FCOSHead(
            num_classes=self.num_classes, num_cls_convs=self.num_cls_convs,
            num_box_convs=self.num_box_convs,
            num_share_convs=self.num_share_convs, norm=self.fcos_norm,
            use_scale=self.use_scale, prior_prob=self.prior_prob,
            cls_kernel_size=self.cls_kernel_size,
            l2_norm_cls_weight=self.l2_norm_cls_weight,
            use_deformable=self.use_deformable,
            num_levels=len(self.fpn_strides),
            compute_dtype=self.compute_dtype, name="fcos_head")
        kwargs = dict(self.code_generator_kwargs or {})
        kwargs.setdefault("strides", tuple(self.fpn_strides))
        kwargs.setdefault("prior_prob", self.prior_prob)
        kwargs.setdefault("compute_dtype", self.compute_dtype)
        if self.code_generator_name == "CodeGenerator":
            self.code_generator = CodeGeneratorHead(name="code_generator",
                                                    **kwargs)
        elif self.code_generator_name == "ROIEncoder":
            kwargs.pop("prior_prob", None)
            self.code_generator = ROIEncoder(name="code_generator", **kwargs)
        elif self.code_generator_name in ("none", None, ""):
            self.code_generator = None
        else:
            raise NotImplementedError(self.code_generator_name)

    # -------------------------------------------------------------- plumbing
    def _normalize(self, images: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        return ((images - mean) / std).astype(self.compute_dtype)

    def extract_features(self, images: jnp.ndarray) -> List[jnp.ndarray]:
        """images (B, H, W, 3) float32 BGR canvas → list of 5 FPN maps."""
        feats = self.backbone(self._normalize(images))
        outs = self.fpn(feats)
        if self.stop_backbone_grad:
            outs = [jax.lax.stop_gradient(o) for o in outs]
        return outs

    # ----------------------------------------------------------------- modes
    def forward_base(self, images: jnp.ndarray,
                     yield_towers: bool = False) -> HeadOutputs:
        """Pretraining / base-detector dense predictions."""
        return self.fcos_head(self.extract_features(images),
                              yield_towers=yield_towers)

    def forward_class_code(self, support_images: jnp.ndarray,
                           support_boxes: jnp.ndarray,
                           support_box_valid: jnp.ndarray,
                           num_shots: int,
                           training: bool = False) -> Dict[str, jnp.ndarray]:
        """Support set (S imgs, one box each) → class codes (S//shots rows)."""
        feats = self.extract_features(support_images)
        return self.code_generator(feats, support_boxes, support_box_valid,
                                   num_shots=num_shots, training=training)

    def normalize_code(self, codes: Dict[str, jnp.ndarray]
                       ) -> Dict[str, jnp.ndarray]:
        assert not isinstance(self.code_generator, ROIEncoder), \
            "ROIEncoder emits final codes directly (reference roi_encoder.py)"
        return self.code_generator(class_codes=codes)

    def forward_instances(self, images: jnp.ndarray,
                          class_code: Dict[str, jnp.ndarray]) -> HeadOutputs:
        """Conditioned dense predictions for decoding (eval query path)."""
        feats = self.extract_features(images)
        return self.fcos_head(feats, class_code=class_code)

    def forward_episodic_train(
        self, support_images: jnp.ndarray, support_boxes: jnp.ndarray,
        support_box_valid: jnp.ndarray, query_images: jnp.ndarray,
        num_shots: int,
    ) -> Tuple[HeadOutputs, Dict[str, jnp.ndarray]]:
        """One episodic training forward (reference :325-388).

        support_images: (E*num_shots, H, W, 3); query_images: (E*Q, H', W', 3).
        Returns conditioned query head outputs (logits channel dim = E) and
        the generated codes (for distillation / snnl losses).
        """
        sfeats = self.extract_features(support_images)
        codes = self.code_generator(sfeats, support_boxes, support_box_valid,
                                    num_shots=num_shots, training=True)
        qfeats = self.extract_features(query_images)
        head_out = self.fcos_head(qfeats, class_code=codes)
        return head_out, codes

    def __call__(self, images: jnp.ndarray) -> HeadOutputs:
        """Default mode = base path (keeps nn.Module init simple)."""
        return self.forward_base(images)
