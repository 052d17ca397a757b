"""Feature Pyramid Network P3-P7 (FCOS flavor), flax NHWC.

Equivalent of detectron2's FPN as configured by the reference's
``build_fcos_resnet_fpn_backbone`` (AdelaiDet-registered; cfg at
adet_configs.py:39 ``TOP_LEVELS=2`` — P6, P7 come from P5 via stride-2
convs with a relu between them, i.e. ``LastLevelP6P7(in_feature="p5")``).

Top-down pathway uses nearest-neighbor x2 upsampling and "sum" fusion
(MODEL.FPN.FUSE_TYPE, config/defaults.py) — all plain XLA ops that fuse
into the surrounding graph.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import flax.linen as nn
import jax.numpy as jnp


def _upsample2x(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    """P3..P5 from res3..res5 laterals, P6/P7 from P5.

    in_features: backbone stage names, ordered coarse->fine resolution
      is handled internally (pass ("res3","res4","res5")).
    """

    in_features: Sequence[str] = ("res3", "res4", "res5")
    out_channels: int = 256
    top_levels: int = 2          # number of extra levels (P6, P7)
    top_block: str = "p6p7"      # "p6p7" (FCOS) | "maxpool" (R-CNN P6)
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]) -> List[jnp.ndarray]:
        xs = [feats[f].astype(self.compute_dtype) for f in self.in_features]
        c = self.out_channels

        laterals = [
            nn.Conv(c, (1, 1), use_bias=True, name=f"lateral_{f}")(x)
            for f, x in zip(self.in_features, xs)
        ]
        # top-down: start from the coarsest
        merged = [laterals[-1]]
        for lat in laterals[-2::-1]:
            merged.append(lat + _upsample2x(merged[-1]))
        merged = merged[::-1]  # fine -> coarse

        outs = [
            nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
                    name=f"output_{f}")(m)
            for f, m in zip(self.in_features, merged)
        ]

        if self.top_block == "maxpool":
            # detectron2 LastLevelMaxPool (standard R-CNN FPN P6).
            outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
            return outs
        # P6/P7 from P5 (reference FCOS LastLevelP6P7 with relu between).
        top = outs[-1]
        for i in range(self.top_levels):
            if i > 0:
                top = nn.relu(top)
            top = nn.Conv(c, (3, 3), strides=(2, 2),
                          padding=[(1, 1), (1, 1)], use_bias=True,
                          name=f"top_block_p{6 + i}")(top)
            outs.append(top)
        return outs  # [P3, P4, P5, P6, P7]
