"""ResNet backbone (caffe-style R-50/R-101) in flax, NHWC.

TPU-native rebuild of the backbone the reference pulls from
detectron2/AdelaiDet (``build_fcos_resnet_fpn_backbone``, used at
meta_one_stage_detector.py:75). Key semantics preserved:

  * caffe-style bottlenecks: the spatial stride sits in the 1x1 conv
    (``STRIDE_IN_1X1=True``), matching the MSRA ImageNet weights;
  * FrozenBatchNorm: batch-norm folded to per-channel scale+bias
    constants (detectron2 freezes BN everywhere for detection); at
    checkpoint conversion running stats fold into (scale, bias), and XLA
    folds the affine into the adjacent conv at compile time;
  * stem: 7x7/2 conv + frozen BN + relu + 3x3/2 max pool;
  * torch-compatible explicit padding (XLA "SAME" places asymmetric
    padding differently for stride-2 convs, which would break converted
    checkpoints).

Compute dtype is configurable (bfloat16 by default): params live in
float32, activations are cast per-block — the standard TPU mixed
precision recipe.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# block counts per stage for each depth
RESNET_STAGES = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class FrozenBatchNorm(nn.Module):
    """BN with statistics folded into constant scale/bias.

    y = x * scale + bias, where conversion sets
    scale = gamma / sqrt(var + eps), bias = beta - mean * scale.
    Parameters are trainable pytree leaves but the train step freezes
    them via the optimizer mask (models stay pure functions).
    """

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def conv(features: int, kernel: int, stride: int = 1, name: str = None):
    pad = kernel // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(pad, pad), (pad, pad)], use_bias=False, name=name,
                   dtype=None)


class Bottleneck(nn.Module):
    """Caffe-style bottleneck: 1x1(stride) -> 3x3 -> 1x1, + shortcut."""

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    has_shortcut: bool = False

    @nn.compact
    def __call__(self, x):
        s = self.stride
        out = conv(self.bottleneck_channels, 1, s, name="conv1")(x)
        out = FrozenBatchNorm(self.bottleneck_channels, name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.bottleneck_channels, 3, 1, name="conv2")(out)
        out = FrozenBatchNorm(self.bottleneck_channels, name="bn2")(out)
        out = nn.relu(out)
        out = conv(self.out_channels, 1, 1, name="conv3")(out)
        out = FrozenBatchNorm(self.out_channels, name="bn3")(out)
        if self.has_shortcut:
            sc = conv(self.out_channels, 1, s, name="shortcut")(x)
            sc = FrozenBatchNorm(self.out_channels, name="shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """(B,H,W,C) -> (B,H/b,W/b,b*b*C), channel order (row-phase,
    col-phase, channel) — the layout ``stem_kernel_to_s2d`` assumes."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // block, block, w // block, block, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h // block, w // block, block * block * c)


def stem_kernel_to_s2d(w7) -> "np.ndarray":
    """Scatter a (7,7,C,O) stride-2 stem kernel into the equivalent
    (4,4,4C,O) stride-1 kernel over 2x2 space-to-depth input.

    The 7x7/s2/pad-3 conv touches input rows 2i-3..2i+3 = blocks
    i-2..i+1 (4 taps, block padding (2,1)); tap (d,p) covers original
    offset u = 2(d-2)+p in [-3,3], one corner tap (d=0,p=0 -> u=-4)
    falls outside the 7-tap support and stays zero. Pure reindexing —
    outputs are bit-identical in the same dtype (TPU MLPerf ResNet's
    "conv0 space-to-depth" trick: 3-channel 7x7 convs waste the MXU's
    contraction lanes; 12-channel 4x4 quadruples the arithmetic
    intensity of the first layer). Host-side numpy: this runs at
    checkpoint-load time, never on device.
    """
    import numpy as np

    w7 = np.asarray(w7)
    k, k2, c, o = w7.shape
    assert k == 7 and k2 == 7, w7.shape
    w4 = np.zeros((4, 4, 4 * c, o), w7.dtype)
    for d in range(4):
        for p in range(2):
            u = 2 * (d - 2) + p
            if not -3 <= u <= 3:
                continue
            for e in range(4):
                for q in range(2):
                    v = 2 * (e - 2) + q
                    if not -3 <= v <= 3:
                        continue
                    w4[d, e, (p * 2 + q) * c:(p * 2 + q + 1) * c, :] = \
                        w7[u + 3, v + 3]
    return w4


def stem_kernel_from_s2d(w4) -> "np.ndarray":
    """Inverse of ``stem_kernel_to_s2d``: gather the (4,4,4C,O) s2d
    kernel back into (7,7,C,O) (the scatter is injective on the 7x7
    support, so the roundtrip is exact)."""
    import numpy as np

    w4 = np.asarray(w4)
    k, k2, c4, o = w4.shape
    assert k == 4 and k2 == 4 and c4 % 4 == 0, w4.shape
    c = c4 // 4
    w7 = np.zeros((7, 7, c, o), w4.dtype)
    for d in range(4):
        for p in range(2):
            u = 2 * (d - 2) + p
            if not -3 <= u <= 3:
                continue
            for e in range(4):
                for q in range(2):
                    v = 2 * (e - 2) + q
                    if not -3 <= v <= 3:
                        continue
                    w7[u + 3, v + 3] = \
                        w4[d, e, (p * 2 + q) * c:(p * 2 + q + 1) * c, :]
    return w7


class ResNet(nn.Module):
    """ResNet with frozen BN returning a dict of stage features.

    out_features: subset of {"res2", "res3", "res4", "res5"}.
    s2d_stem: replace the 7x7/s2 stem conv with the numerically
    identical 4x4/s1 conv over 2x2 space-to-depth input (param
    ``stem_conv1`` then has shape (4,4,12,64); convert checkpoints with
    ``stem_kernel_to_s2d``).
    """

    depth: int = 50
    out_features: Sequence[str] = ("res3", "res4", "res5")
    stem_channels: int = 64
    res2_out_channels: int = 256
    compute_dtype: Any = jnp.bfloat16
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        x = x.astype(self.compute_dtype)
        # Stem
        if self.s2d_stem:
            x = space_to_depth(x, 2)
            x = nn.Conv(self.stem_channels, (4, 4), strides=(1, 1),
                        padding=[(2, 1), (2, 1)], use_bias=False,
                        name="stem_conv1", dtype=None)(x)
        else:
            x = conv(self.stem_channels, 7, 2, name="stem_conv1")(x)
        x = FrozenBatchNorm(self.stem_channels, name="stem_bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)])

        stages = RESNET_STAGES[self.depth]
        out: Dict[str, jnp.ndarray] = {}
        out_channels = self.res2_out_channels
        bottleneck_channels = out_channels // 4
        for stage_idx, num_blocks in enumerate(stages):
            name = f"res{stage_idx + 2}"
            stride = 1 if stage_idx == 0 else 2
            for b in range(num_blocks):
                x = Bottleneck(
                    out_channels=out_channels,
                    bottleneck_channels=bottleneck_channels,
                    stride=stride if b == 0 else 1,
                    has_shortcut=(b == 0),
                    name=f"{name}_block{b}",
                )(x)
            if name in self.out_features:
                out[name] = x
            out_channels *= 2
            bottleneck_channels *= 2
        return out


def resnet_feature_channels(depth: int, res2_out: int = 256
                            ) -> Dict[str, int]:
    return {f"res{i+2}": res2_out * (2 ** i) for i in range(4)}


def resnet_feature_strides() -> Dict[str, int]:
    return {"res2": 4, "res3": 8, "res4": 16, "res5": 32}
