"""ROIEncoder: transformer-based code generator variant, flax NHWC.

TPU-native rebuild of the reference's alternative hypernetwork
(code_generator/roi_encoder.py:118-281):

  ROIAlign + context attention (``FeatureFusionModuleV2`` with
  ``context_attention=True``, utils.py:106-165: pooled → conv3x3+GN+relu;
  context = mean over levels of each level pooled to 7x7; MS_CAM
  attention, utils.py:70-103) → Tokenizer (convs + FCs with relu,
  roi_encoder.py:26-79) → TransformerEncoder over the K shot tokens
  (post-LN, relu FFN — matching torch nn.TransformerEncoderLayer
  defaults, roi_encoder.py:247-256) → mean over shots →
  weight/bias MLP heads (roi_encoder.py:82-115); bias = focal prior +
  predicted delta (roi_encoder.py:193-199).

The K ≤ 10 shot axis is the only "sequence": attention is a tiny
on-chip matmul, no masking machinery needed.

NOTE (documented divergence): the reference builds its torch encoder
seq-first but feeds (batch, shots, C) (roi_encoder.py:247-256 + :193),
so as written its attention mixes across the CLASS batch and
degenerates to identity attention at eval (batch=1). This
implementation attends over the K shots of each class — the semantics
the Sylph paper describes. Checkpoint conversion maps the weights
either way (utils/convert_weights.py _convert_roi_encoder).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.roi_align import multilevel_roi_align


def _gn32(x, name):
    return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32,
                        name=name)(x).astype(x.dtype)


class MSCAM(nn.Module):
    """Multi-scale channel attention (arXiv:2009.14082; utils.py:70-103)."""

    channels: int = 256
    reduction: int = 4

    @nn.compact
    def __call__(self, x, context):
        inter = self.channels // self.reduction

        def att(y, prefix):
            y = nn.Conv(inter, (1, 1), name=f"{prefix}_conv1")(y)
            y = _gn32(y, f"{prefix}_gn1")
            y = nn.relu(y)
            y = nn.Conv(self.channels, (1, 1), name=f"{prefix}_conv2")(y)
            return _gn32(y, f"{prefix}_gn2")

        local = att(context, "local")
        glob = att(jnp.mean(context, axis=(1, 2), keepdims=True), "global")
        return x * jax.nn.sigmoid(local + glob)


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder layer matching torch defaults (relu FFN)."""

    d_model: int
    heads: int
    ff_dim: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        att = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.d_model,
            dropout_rate=self.dropout, deterministic=deterministic,
            name="self_attn")(x, x)
        att = nn.Dropout(self.dropout, deterministic=deterministic)(att)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + att)
        ff = nn.Dense(self.ff_dim, name="ff1")(x)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout, deterministic=deterministic)(ff)
        ff = nn.Dense(self.d_model, name="ff2")(ff)
        ff = nn.Dropout(self.dropout, deterministic=deterministic)(ff)
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(x + ff)


class ROIEncoder(nn.Module):
    """Configure from MODEL.META_LEARN.CODE_GENERATOR.{TOKENIZER,
    TRANSFORMER_ENCODER, HEAD} (reference default_configs.py:143-160)."""

    strides: Sequence[int] = (8, 16, 32, 64, 128)
    pooler_resolution: int = 7
    feature_channels: int = 256
    tokenizer_num_conv: int = 0
    tokenizer_conv_dim: int = 256
    tokenizer_norm: str = ""
    tokenizer_num_fc: int = 1
    tokenizer_fc_dim: int = 256
    transformer_layers: int = 1
    transformer_heads: int = 8
    transformer_dropout: float = 0.1
    head_num_fc: int = 1
    head_fc_dim: int = 512
    head_output_dim: int = 256
    prior_prob: float = 0.01
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], boxes: jnp.ndarray,
                 box_valid: jnp.ndarray, num_shots: int,
                 training: bool = True) -> Dict[str, jnp.ndarray]:
        feats = [f.astype(self.compute_dtype) for f in features]
        p = self.pooler_resolution

        def pool_one(per_level_feats, box, valid):
            return multilevel_roi_align(
                list(per_level_feats), tuple(self.strides),
                box[None, :], valid[None], output_size=p)[0]

        pooled = jax.vmap(pool_one, in_axes=(0, 0, 0))(feats, boxes, box_valid)

        # Context attention (FeatureFusionModuleV2, utils.py:140-163).
        x = nn.Conv(self.feature_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    name="fusion_conv")(pooled)
        x = _gn32(x, "fusion_gn")
        x = nn.relu(x)
        # context: every level adaptively pooled to (p, p), then averaged.
        ctx = jnp.mean(jnp.stack(
            [_adaptive_avg_pool(f, p) for f in feats]), axis=0)
        x = MSCAM(self.feature_channels, name="ms_cam")(x, ctx)

        # Tokenizer (roi_encoder.py:26-79).
        for i in range(self.tokenizer_num_conv):
            x = nn.Conv(self.tokenizer_conv_dim, (3, 3),
                        padding=[(1, 1), (1, 1)],
                        use_bias=not self.tokenizer_norm,
                        name=f"tok_conv{i}")(x)
            if self.tokenizer_norm == "GN":
                x = _gn32(x, f"tok_gn{i}")
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        for i in range(self.tokenizer_num_fc):
            x = nn.Dense(self.tokenizer_fc_dim, name=f"tok_fc{i}")(x)
            x = nn.relu(x)

        # Transformer over the shot axis.
        tokens = x.reshape(-1, num_shots, self.tokenizer_fc_dim)
        for i in range(self.transformer_layers):
            tokens = TransformerEncoderLayer(
                d_model=self.tokenizer_fc_dim, heads=self.transformer_heads,
                ff_dim=self.tokenizer_fc_dim * 4,
                dropout=self.transformer_dropout,
                name=f"encoder_layer{i}")(tokens, deterministic=not training
                                          or self.transformer_dropout == 0.0)
        class_tokens = jnp.mean(tokens, axis=1)  # (n_class, C)

        def mlp_head(y, out_dim, prefix):
            dim = self.head_fc_dim
            for i in range(self.head_num_fc):
                last = i == self.head_num_fc - 1
                y = nn.Dense(out_dim if last else dim,
                             name=f"{prefix}_fc{i}")(y)
                if not last:
                    y = nn.relu(y)
            return y

        class_weights = mlp_head(class_tokens, self.head_output_dim, "weight")
        delta_bias = mlp_head(class_tokens, 1, "bias").reshape(-1)
        prior = -math.log((1 - self.prior_prob) / self.prior_prob)
        return {"cls_conv": class_weights, "cls_bias": prior + delta_bias}


def _adaptive_avg_pool(x: jnp.ndarray, out: int) -> jnp.ndarray:
    """torch F.adaptive_avg_pool2d semantics for NHWC input."""
    b, h, w, c = x.shape
    # bin i covers [floor(i*H/out), ceil((i+1)*H/out)) — torch formula.
    def pool_axis(arr, size, axis):
        starts = [(i * size) // out for i in range(out)]
        ends = [-(-((i + 1) * size) // out) for i in range(out)]
        slices = [jnp.mean(
            jax.lax.slice_in_dim(arr, s, e, axis=axis), axis=axis,
            keepdims=True) for s, e in zip(starts, ends)]
        return jnp.concatenate(slices, axis=axis)

    x = pool_axis(x, h, 1)
    return pool_axis(x, w, 2)
