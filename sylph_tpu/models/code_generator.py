"""Sylph code generator (hypernetwork), flax NHWC.

TPU-native rebuild of ``CodeGeneratorHead`` (reference
code_generator/code_generator.py:276-1053). Pipeline
(``forward_roi_align``, reference :924-1002):

  1. multilevel ROIAlign of one support box per image → (S, 7, 7, 256)
     (reference pools via detectron2 ROIPooler, :336-348; the random
     single-box selection ``select_a_mask`` (utils.py:27-47) happens in
     the data layer here);
  2. shared tower: TOWER_LAYERS x [conv3x3, norm, act] (:645-688);
  3. predictor heads (:509-645): ``cls_conv`` conv3x3(256→256)+opt
     norm/act+global-avg-pool → per-shot kernel; ``cls_bias``
     conv3x3(256→1)+pool; optional ``weight`` (per-shot softmax
     weighting, :764-776) and ``scale`` (weight-norm) heads;
  4. k-shot aggregation ``compute_code``: weighted mean over shots
     (:778-829), optional mean+max compression;
  5. code processing (:832-875): POST_NORM GroupNorm over the code
     channel, optional L2 norm, learnable ``conv_scale``; bias =
     focal-prior + ``bias_scale`` * predicted bias (:845-862).

Training applies step 5 inline; at test time codes are returned raw and
re-normalized later by calling with ``class_codes=`` — mirroring the
reference's two-phase ``cls_norm`` flow (run_type=
"meta_learn_normalize_code", :877-897, 1036-1053), which lets base-class
codes be accumulated over support chunks before one normalization.

The (S, 7, 7, 256) tensors are tiny; everything here is MXU-friendly
matmul/conv work with static shapes — S = n_class*shot at train time,
S = eval shots at registration time.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.roi_align import multilevel_roi_align


class _Scale(nn.Module):
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        s = self.param("scale", nn.initializers.constant(self.init_value), ())
        return x * s.astype(x.dtype)


def _conv3(out_c, name):
    return nn.Conv(out_c, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
                   kernel_init=nn.initializers.normal(0.01), name=name)


def _norm_act(x, norm: str, act: str, name: str):
    """Inline norm+activation (reference build_fpn_norm, utils.py:36-62)."""
    if norm == "GN":
        groups = 32 if x.shape[-1] % 32 == 0 else 1
        x = nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=jnp.float32,
                         name=f"{name}_gn")(x).astype(x.dtype)
    elif norm == "LN":
        x = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=jnp.float32,
                         name=f"{name}_ln")(x).astype(x.dtype)
    elif norm in ("", "none", None):
        pass
    else:
        raise NotImplementedError(f"codegen norm {norm}")
    if act == "ReLU":
        x = nn.relu(x)
    elif act == "Tanh":
        x = jnp.tanh(x)
    return x


class CodeGeneratorHead(nn.Module):
    """See module docstring. Configure from MODEL.META_LEARN.CODE_GENERATOR.

    Two entry modes on ``__call__``:
      * generate: pass (features, boxes, box_valid, num_shots, training);
      * normalize: pass ``class_codes={"cls_conv", "cls_bias", ...}`` —
        applies only the shared post-processing parameters.
    """

    strides: Sequence[int] = (8, 16, 32, 64, 128)
    pooler_resolution: int = 7
    out_channel: int = 256
    tower_layers: Sequence[Sequence[str]] = (("GN", "ReLU"), ("GN", "ReLU"))
    cls_layer: Sequence = ("", "", 1)
    bias_layer: Sequence = ("", "", 1)
    weight_layer: Sequence = ()
    scale_layer: Sequence = ()
    use_bias: bool = True
    conv_l2_norm: bool = True
    bias_l2_norm: bool = False
    post_norm: str = "GN"
    use_weight_scale: bool = True
    compress_code_w_max: bool = False
    prior_prob: float = 0.01
    meta_bias: bool = False
    contrastive_loss: str = ""
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features: Optional[Sequence[jnp.ndarray]] = None,
                 boxes: Optional[jnp.ndarray] = None,
                 box_valid: Optional[jnp.ndarray] = None,
                 num_shots: int = 5, training: bool = True,
                 class_codes: Optional[Dict[str, jnp.ndarray]] = None
                 ) -> Dict[str, jnp.ndarray]:
        if class_codes is not None:
            w, b = self._process_code(
                class_codes["cls_conv"], class_codes["cls_bias"],
                class_codes.get("cls_weight_norm"))
            return {"cls_conv": w, "cls_bias": b}

        s = boxes.shape[0]
        assert s % num_shots == 0, (s, num_shots)
        feats = [f.astype(self.compute_dtype) for f in features]

        # Per-image multilevel ROIAlign of a single box (sampling_ratio=0
        # adaptive grids via a masked static lattice — exact detectron2
        # arithmetic; see ops/roi_align.py).
        def pool_one(per_level_feats, box, valid):
            return multilevel_roi_align(
                list(per_level_feats), tuple(self.strides),
                box[None, :], valid[None],
                output_size=self.pooler_resolution)[0]

        x = jax.vmap(pool_one, in_axes=(0, 0, 0))(feats, boxes, box_valid)

        for i, (norm, act) in enumerate(self.tower_layers):
            x = _conv3(256, f"tower_conv{i}")(x)
            x = _norm_act(x, norm, act, f"tower_conv{i}")

        def head(out_c, layer_cfg, name):
            y = _conv3(out_c, name)(x)
            y = _norm_act(y, layer_cfg[0], layer_cfg[1], name)
            return jnp.mean(y, axis=(1, 2)).astype(jnp.float32)  # global pool

        conv_feature = head(self.out_channel, self.cls_layer, "cls_conv_head")

        weight = None
        if self.weight_layer:
            w_logit = head(1, self.weight_layer, "cls_weight_head")
            weight = jax.nn.softmax(w_logit.reshape(-1, num_shots), axis=1)

        conv_weights = self._compute_code(conv_feature, num_shots, weight)
        n_class = conv_weights.shape[0]

        if self.bias_layer:
            bias_feature = head(1, self.bias_layer, "cls_bias_head")
            if self.bias_l2_norm:
                bias_feature = bias_feature / jnp.maximum(
                    jnp.linalg.norm(bias_feature, axis=-1, keepdims=True),
                    1e-12)
            conv_bias = self._compute_code(
                bias_feature, num_shots, weight).reshape(n_class)
        else:
            conv_bias = jnp.zeros((n_class,), jnp.float32)

        conv_weight_norm = None
        if self.scale_layer:
            scale_feature = head(1, self.scale_layer, "cls_scale_head")
            conv_weight_norm = self._compute_code(
                scale_feature, num_shots, weight).reshape(n_class)

        out: Dict[str, jnp.ndarray] = {}
        if self.contrastive_loss == "snnl":
            out["snnl"] = soft_nearest_neighbor_loss(conv_feature, num_shots)

        if training:
            conv_weights, conv_bias = self._process_code(
                conv_weights, conv_bias, conv_weight_norm)
        out.update({"cls_conv": conv_weights, "cls_bias": conv_bias})
        if conv_weight_norm is not None:
            out["cls_weight_norm"] = conv_weight_norm
        return out

    # ------------------------------------------------------------------ parts
    def _compute_code(self, per_shot: jnp.ndarray, num_shots: int,
                      weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """(S, C) -> (S/num_shots, C) k-shot aggregation (reference :778-829)."""
        c = per_shot.shape[-1]
        grouped = per_shot.reshape(-1, num_shots, c)
        if self.compress_code_w_max:
            return (_Scale(0.5, name="cls_mean_scale")(jnp.mean(grouped, 1))
                    + _Scale(0.5, name="cls_max_scale")(jnp.max(grouped, 1)))
        if weight is None:
            return jnp.mean(grouped, axis=1)
        return jnp.sum(grouped * weight[..., None], axis=1)

    def _process_code(self, conv_weights, conv_bias, conv_weight_norm=None):
        """post-norm GN + L2 + scale; bias = prior + scale*pred (:832-875)."""
        w = conv_weights.astype(jnp.float32)
        if self.post_norm == "GN" and w.shape[-1] % 32 == 0:
            w = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32,
                             name="post_norm")(w[:, None, None, :])[:, 0, 0, :]
        if self.conv_l2_norm:
            w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True),
                                1e-12)
        if conv_weight_norm is not None:
            w = w * conv_weight_norm[:, None]
        if self.use_weight_scale and (self.conv_l2_norm
                                      or self.post_norm == "GN"):
            w = _Scale(1.0, name="conv_scale")(w)

        b = conv_bias.astype(jnp.float32)
        if self.bias_layer:
            b = _Scale(1.0, name="bias_scale")(b)
        prior = -math.log((1 - self.prior_prob) / self.prior_prob)
        if self.meta_bias:
            prior = self.param("meta_bias_value",
                               nn.initializers.constant(prior), ())
        b = b + prior
        return w, b


def soft_nearest_neighbor_loss(features: jnp.ndarray, k: int) -> jnp.ndarray:
    """Soft-nearest-neighbor contrastive loss over per-shot codes.

    Reference: SoftNearestNeighborLoss (code_generator/utils.py:326-351) —
    L2-normalized features, exp(-squared euclidean distance), intra-class
    (same k-group) numerator vs all off-diagonal denominator.
    """
    n = features.shape[0]
    f = features / jnp.maximum(
        jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-12)
    sq = jnp.sum((f[:, None, :] - f[None, :, :]) ** 2, axis=-1)
    sim = jnp.exp(-sq)
    idx = jnp.arange(n)
    same_class = (idx[:, None] // k) == (idx[None, :] // k)
    off_diag = idx[:, None] != idx[None, :]
    intra = jnp.sum(jnp.where(same_class & off_diag, sim, 0.0), axis=1)
    allc = jnp.sum(jnp.where(off_diag, sim, 0.0), axis=1)
    per_item = jnp.log(jnp.maximum(intra, 1e-12) / jnp.maximum(allc, 1e-12))
    return -jnp.sum(per_item) / n
