"""FCOS target assignment as a single batched XLA graph.

Replaces the reference's per-image python loops
(fcos_outputs.py:140-349: ``_get_ground_truth`` /
``compute_targets_for_locations`` / ``get_sample_region``) with a pure
function over padded ``GTBoxes``; batch via ``jax.vmap``. Semantics
matched:

  * ltrb regression targets per (location, gt) pair;
  * optional center sampling: positives must lie inside a radius-scaled
    sub-box around the gt center, clamped to the gt box, with the radius
    proportional to the location's own FPN stride
    (fcos_outputs.py:196-252);
  * size-of-interest gating on max(ltrb) per level
    (fcos_outputs.py:306-311);
  * minimum-area tie-break among remaining candidates
    (fcos_outputs.py:313-330);
  * background encoded as label -1 (the reference uses the sentinel id
    100000, fcos_outputs.py:102 — a mask-friendly -1 plays nicer with
    one_hot on TPU);
  * reg targets normalized by the owning level's stride
    (fcos_outputs.py:185-188).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..structures import GTBoxes

INF = 100000000.0


class FCOSTargets(NamedTuple):
    """Per-location training targets. Leading axes broadcast with inputs.

    labels:      (..., K) int32 — contiguous class id, -1 = background.
    reg_targets: (..., K, 4) float32 — ltrb / stride of the owning level.
    target_inds: (..., K) int32 — index of the matched gt box, -1 if none.
    """

    labels: jnp.ndarray
    reg_targets: jnp.ndarray
    target_inds: jnp.ndarray


def assign_fcos_targets(locations: jnp.ndarray, strides: jnp.ndarray,
                        size_ranges: jnp.ndarray, gt: GTBoxes, *,
                        center_sample: bool = True,
                        radius: float = 1.5) -> FCOSTargets:
    """Assign targets for ONE image. vmap over GTBoxes for a batch.

    Args:
      locations: (K, 2) float32 (x, y).
      strides: (K,) float32 per-location stride.
      size_ranges: (K, 2) float32 size-of-interest bounds.
      gt: padded GTBoxes with boxes (M, 4), labels (M,), valid (M,).
    """
    xs, ys = locations[:, 0], locations[:, 1]
    boxes = gt.boxes  # (M, 4)

    l = xs[:, None] - boxes[None, :, 0]
    t = ys[:, None] - boxes[None, :, 1]
    r = boxes[None, :, 2] - xs[:, None]
    b = boxes[None, :, 3] - ys[:, None]
    ltrb = jnp.stack([l, t, r, b], axis=-1)  # (K, M, 4)

    if center_sample:
        cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
        cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
        rad = strides[:, None] * radius  # (K, 1)
        # Sub-box around the center, clamped inside the gt box.
        x1 = jnp.maximum(cx[None, :] - rad, boxes[None, :, 0])
        y1 = jnp.maximum(cy[None, :] - rad, boxes[None, :, 1])
        x2 = jnp.minimum(cx[None, :] + rad, boxes[None, :, 2])
        y2 = jnp.minimum(cy[None, :] + rad, boxes[None, :, 3])
        inside = (
            (xs[:, None] - x1 > 0) & (ys[:, None] - y1 > 0)
            & (x2 - xs[:, None] > 0) & (y2 - ys[:, None] > 0))
    else:
        inside = jnp.min(ltrb, axis=-1) > 0  # (K, M)

    max_ltrb = jnp.max(ltrb, axis=-1)  # (K, M)
    cared = ((max_ltrb >= size_ranges[:, 0:1])
             & (max_ltrb <= size_ranges[:, 1:2]))

    area = ((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]))  # (M,)
    cand_area = jnp.where(inside & cared & gt.valid[None, :],
                          area[None, :], INF)  # (K, M)

    min_area = jnp.min(cand_area, axis=1)            # (K,)
    inds = jnp.argmin(cand_area, axis=1)             # (K,) first-min (torch tie)
    is_fg = min_area < INF

    labels = jnp.where(is_fg, gt.labels[inds], -1).astype(jnp.int32)
    target_inds = jnp.where(is_fg, inds, -1).astype(jnp.int32)
    reg = jnp.take_along_axis(ltrb, inds[:, None, None].repeat(4, -1),
                              axis=1)[:, 0, :]  # (K, 4)
    reg = reg / strides[:, None]
    return FCOSTargets(labels=labels, reg_targets=reg, target_inds=target_inds)


def assign_fcos_targets_batch(locations, strides, size_ranges, gt: GTBoxes,
                              *, center_sample: bool = True,
                              radius: float = 1.5) -> FCOSTargets:
    """Batched assignment: gt arrays have a leading batch axis."""
    fn = lambda g: assign_fcos_targets(  # noqa: E731
        locations, strides, size_ranges, g,
        center_sample=center_sample, radius=radius)
    return jax.vmap(fn)(gt)


def compute_ctrness_targets(reg_targets: jnp.ndarray) -> jnp.ndarray:
    """Centerness target sqrt((min_lr/max_lr) * (min_tb/max_tb)).

    Matches adet compute_ctrness_targets used at fcos_outputs.py:556,652.
    reg_targets: (..., 4) ltrb (stride-normalized ok — ratio invariant).
    """
    lr = reg_targets[..., [0, 2]]
    tb = reg_targets[..., [1, 3]]
    ctr = ((jnp.min(lr, -1) / jnp.maximum(jnp.max(lr, -1), 1e-9))
           * (jnp.min(tb, -1) / jnp.maximum(jnp.max(tb, -1), 1e-9)))
    return jnp.sqrt(jnp.clip(ctr, 0.0))
