"""FCOS detection head with the Sylph conditional classifier, flax NHWC.

TPU-native equivalent of ``MetaFCOSHead`` (reference fcos.py:285-667):

  * shared-across-levels towers — cls tower (NUM_CLS_CONVS x
    [conv3x3, GN, relu]), bbox tower, optional share tower
    (fcos.py:382-428 via ``_build_tower_module``);
  * predictor heads: ``cls_logits`` (kernel CLS_LOGITS_KERNEL_SIZE=1),
    ``bbox_pred`` (4ch), ``ctrness`` (1ch), ``iou_overlap`` (1ch)
    (fcos.py:430-435); focal-prior bias init on cls_logits
    (fcos.py:463-469); per-level ``Scale`` then relu on the regression
    (fcos.py:437-442, 575-578);
  * conditional classification (``CondConvBasic``, head_utils.py:39-81;
    applied at fcos.py:634-637): with 1x1 class codes the conditional
    conv is exactly an einsum ``(B,H,W,C),(N,C)->(B,H,W,N)`` + bias — a
    single MXU matmul per level, jit-stable in N via a padded code bank.

Outputs are returned **flattened level-major** as ``(B, K, ...)`` to
feed the batched loss/decode ops directly; K = sum of level H*W.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


class Scale(nn.Module):
    """Learnable scalar multiplier (reference head_utils.py:23-29)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param("scale", nn.initializers.constant(self.init_value), ())
        return x * s.astype(x.dtype)


class HeadOutputs(NamedTuple):
    logits: jnp.ndarray        # (B, K, C) — C = num_classes or padded N_max
    reg: jnp.ndarray           # (B, K, 4) stride-normalized (post relu)
    ctrness: jnp.ndarray       # (B, K)
    iou: jnp.ndarray           # (B, K)
    towers: Optional[List[jnp.ndarray]] = None  # bbox towers if requested


def _conv_init():
    return nn.initializers.normal(0.01)


class _Tower(nn.Module):
    """num_convs x [conv3x3(bias), GN(32), relu]. With
    ``use_deformable`` the LAST conv is a modulated deformable conv
    (reference fcos.py:80-94 swaps in AdelaiDet's DFConv2d there)."""

    num_convs: int
    channels: int = 256
    norm: str = "GN"
    use_deformable: bool = False

    @nn.compact
    def __call__(self, x):
        from ..ops.deform_conv import DFConv2d
        for i in range(self.num_convs):
            if self.use_deformable and i == self.num_convs - 1:
                x = DFConv2d(self.channels, name=f"conv{i}")(x)
            else:
                x = nn.Conv(self.channels, (3, 3),
                            padding=[(1, 1), (1, 1)],
                            use_bias=True, kernel_init=_conv_init(),
                            name=f"conv{i}")(x)
            if self.norm == "GN":
                x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32,
                                 name=f"gn{i}")(x).astype(x.dtype)
            elif self.norm in ("", "none", None):
                pass
            else:
                raise NotImplementedError(f"FCOS norm {self.norm}")
            x = nn.relu(x)
        return x


class FCOSHead(nn.Module):
    """The head proper. Call per forward mode:

    ``__call__(features)`` — base path with the trained ``cls_logits``;
    ``__call__(features, class_code={'cls_conv': (N,256), 'cls_bias': (N,)})``
    — conditional path (episodic), logits have N channels.
    """

    num_classes: int
    num_cls_convs: int = 4
    num_box_convs: int = 4
    num_share_convs: int = 0
    norm: str = "GN"
    use_scale: bool = True
    prior_prob: float = 0.01
    cls_kernel_size: int = 1
    num_levels: int = 5
    # TFA cosine classifier (MODEL.FCOS.L2_NORM_CLS_WEIGHT; reference
    # CosineSimilarityConv2d, head_utils.py:165-195): weight rows are
    # group-normalized then L2-normalized, logits scaled by exp(s).
    l2_norm_cls_weight: bool = False
    # MODEL.FCOS.USE_DEFORMABLE: last conv of every tower is DCNv2.
    use_deformable: bool = False
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray],
                 class_code: Optional[Dict[str, jnp.ndarray]] = None,
                 yield_towers: bool = False) -> HeadOutputs:
        share_tower = (_Tower(self.num_share_convs, norm=self.norm,
                              use_deformable=self.use_deformable,
                              name="share_tower")
                       if self.num_share_convs else None)
        cls_tower = _Tower(self.num_cls_convs, norm=self.norm,
                           use_deformable=self.use_deformable,
                           name="cls_tower")
        bbox_tower = _Tower(self.num_box_convs, norm=self.norm,
                            use_deformable=self.use_deformable,
                            name="bbox_tower")

        import math
        bias_init = -math.log((1 - self.prior_prob) / self.prior_prob)
        ks = self.cls_kernel_size
        cls_logits = nn.Conv(
            self.num_classes, (ks, ks), padding=[(ks // 2,) * 2] * 2,
            kernel_init=_conv_init(),
            bias_init=nn.initializers.constant(bias_init), name="cls_logits")
        bbox_pred = nn.Conv(4, (3, 3), padding=[(1, 1), (1, 1)],
                            kernel_init=_conv_init(), name="bbox_pred")
        ctrness = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                          kernel_init=_conv_init(), name="ctrness")
        iou_overlap = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                              kernel_init=_conv_init(), name="iou_overlap")
        scales = ([Scale(1.0, name=f"scale_l{i}")
                   for i in range(self.num_levels)]
                  if self.use_scale else None)

        if class_code is not None:
            code_w = class_code["cls_conv"]
            code_w = code_w.reshape(code_w.shape[0], -1)  # (N, 256)
            code_b = class_code["cls_bias"].reshape(-1)   # (N,)

        if self.l2_norm_cls_weight:
            c_in = 256  # cls tower output channels (_Tower default)
            cos_w = self.param("cosine_weight", _conv_init(),
                               (self.num_classes, c_in))
            cos_b = self.param("cosine_bias",
                               nn.initializers.constant(bias_init),
                               (self.num_classes,))
            cos_scale = self.param("cosine_scale",
                                   nn.initializers.zeros, ())
            cos_gn_s = self.param("cosine_gn_scale",
                                  nn.initializers.ones, (c_in,))
            cos_gn_b = self.param("cosine_gn_bias",
                                  nn.initializers.zeros, (c_in,))

            def cosine_logits(ct):
                # GN over each weight row's channels, then L2 normalize
                # (reference head_utils.py:188-194), exp(s) scaling.
                w = cos_w.astype(jnp.float32)
                groups = 32 if c_in % 32 == 0 else 1
                wg = w.reshape(self.num_classes, groups, -1)
                mu = wg.mean(-1, keepdims=True)
                var = wg.var(-1, keepdims=True)
                wg = (wg - mu) / jnp.sqrt(var + 1e-5)
                w = wg.reshape(self.num_classes, c_in) * cos_gn_s + cos_gn_b
                w = w / jnp.maximum(
                    jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
                logit = jnp.einsum("bhwc,nc->bhwn", ct, w.astype(ct.dtype),
                                   preferred_element_type=jnp.float32)
                return jnp.exp(cos_scale) * logit + cos_b

        logits_l, reg_l, ctr_l, iou_l, towers_l = [], [], [], [], []
        for li, feat in enumerate(features):
            x = feat.astype(self.compute_dtype)
            if share_tower is not None:
                x = share_tower(x)
            ct = cls_tower(x)
            bt = bbox_tower(x)
            if yield_towers:
                towers_l.append(bt)

            if class_code is not None:
                # Conditional 1x1 conv == one matmul on the MXU.
                logit = jnp.einsum(
                    "bhwc,nc->bhwn", ct, code_w.astype(ct.dtype),
                    preferred_element_type=jnp.float32)
                logit = logit + code_b.astype(jnp.float32)
            elif self.l2_norm_cls_weight:
                logit = cosine_logits(ct)
            else:
                logit = cls_logits(ct).astype(jnp.float32)

            reg = bbox_pred(bt)
            if scales is not None:
                reg = scales[li](reg)
            reg = nn.relu(reg).astype(jnp.float32)

            b = feat.shape[0]
            logits_l.append(logit.reshape(b, -1, logit.shape[-1]))
            reg_l.append(reg.reshape(b, -1, 4))
            ctr_l.append(ctrness(bt).astype(jnp.float32).reshape(b, -1))
            iou_l.append(iou_overlap(bt).astype(jnp.float32).reshape(b, -1))

        return HeadOutputs(
            logits=jnp.concatenate(logits_l, axis=1),
            reg=jnp.concatenate(reg_l, axis=1),
            ctrness=jnp.concatenate(ctr_l, axis=1),
            iou=jnp.concatenate(iou_l, axis=1),
            towers=towers_l if yield_towers else None,
        )
