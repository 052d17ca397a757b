"""ROIAlign (V2 / "aligned" semantics) as pure XLA gathers.

TPU-native replacement for detectron2's C++/CUDA ``ROIAlign`` op
(reference: pooler built at code_generator.py:341-348 with
POOLER_TYPE="ROIAlignV2", sampling_ratio=0, cfg default_configs.py:88-92).

Semantics matched to detectron2/torchvision ROIAlign(aligned=True):
  * continuous coordinate c maps to pixel index c*scale - 0.5;
  * ``sampling_ratio > 0``: each of the P x P output bins averages
    ``sampling_ratio^2`` bilinear samples on a regular sub-grid;
  * ``sampling_ratio == 0`` (the reference's setting): ADAPTIVE grids —
    ``grid_h = ceil(roi_h / P)`` samples per bin edge per ROI. The grid
    count is data-dependent, so on TPU we allocate a static lattice of
    ``max_grid`` slots per edge and mask slots beyond each ROI's grid
    (exact detectron2 arithmetic for grids up to ``max_grid``; larger
    grids — ROIs spanning > max_grid*P px on their assigned level, which
    FPN canonical assignment makes rare — are capped at ``max_grid``);
  * samples outside the feature map contribute zero but still count in
    the bin average (count = max(grid_h*grid_w, 1));
  * a degenerate ROI edge (grid 0 along either axis) yields zeros, as in
    the reference kernel's empty sample loop.

The gather formulation lets XLA fuse the bilinear weights with the
gather; box count and lattice are static, so the pooler compiles once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def roi_align(features: jnp.ndarray, boxes: jnp.ndarray, *,
              spatial_scale: float, output_size: int,
              sampling_ratio: int = 0, max_grid: int = 4) -> jnp.ndarray:
    """Pool ROIs from a single feature map.

    Args:
      features: (H, W, C) feature map (NHWC layout, one image).
      boxes: (N, 4) XYXY in *input image* coordinates.
      spatial_scale: 1/stride of this feature level.
      output_size: P — output is P x P.
      sampling_ratio: sub-samples per bin edge; 0 = adaptive (detectron2
        default and the reference's setting).
      max_grid: static lattice size per bin edge for the adaptive mode.

    Returns:
      (N, P, P, C) pooled features.
    """
    h, w, _ = features.shape
    n = boxes.shape[0]
    p = output_size
    s = sampling_ratio if sampling_ratio > 0 else max_grid

    boxes = boxes.astype(jnp.float32) * spatial_scale
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    # aligned=True: shift by 0.5 pixel (continuous -> index coordinates).
    x1, y1, x2, y2 = x1 - 0.5, y1 - 0.5, x2 - 0.5, y2 - 0.5
    roi_w = x2 - x1
    roi_h = y2 - y1

    bin_w = roi_w / p  # (N,)
    bin_h = roi_h / p

    if sampling_ratio > 0:
        g_h = jnp.full((n,), s, jnp.int32)
        g_w = jnp.full((n,), s, jnp.int32)
    else:
        # detectron2: grid = ceil(roi_size / P) per axis; we cap at the
        # static lattice. A non-positive roi edge gives grid 0 -> zeros.
        g_h = jnp.minimum(jnp.ceil(bin_h), s).astype(jnp.int32)
        g_w = jnp.minimum(jnp.ceil(bin_w), s).astype(jnp.int32)
        g_h = jnp.maximum(g_h, 0)
        g_w = jnp.maximum(g_w, 0)

    # Sample positions: pos[n, pi, si] = start + (pi + (si+0.5)/g) * bin
    grid_p = jnp.arange(p, dtype=jnp.float32)
    grid_s = jnp.arange(s, dtype=jnp.float32)
    offs_y = (grid_s[None] + 0.5) / jnp.maximum(g_h, 1)[:, None]  # (N, S)
    offs_x = (grid_s[None] + 0.5) / jnp.maximum(g_w, 1)[:, None]
    frac_y = grid_p[None, :, None] + offs_y[:, None, :]  # (N, P, S)
    frac_x = grid_p[None, :, None] + offs_x[:, None, :]
    ys = y1[:, None, None] + frac_y * bin_h[:, None, None]  # (N, P, S)
    xs = x1[:, None, None] + frac_x * bin_w[:, None, None]
    valid_y = grid_s[None] < g_h[:, None]  # (N, S)
    valid_x = grid_s[None] < g_w[:, None]
    count = jnp.maximum(g_h * g_w, 1).astype(jnp.float32)  # (N,)

    out = _bilinear_pool(features, ys, xs, valid_y, valid_x, count, h, w)
    return out.reshape(n, p, p, -1)


def _bilinear_pool(features, ys, xs, valid_y, valid_x, count, h, w):
    """Masked-average bilinear samples: ys/xs (N,P,S) -> (N, P*P, C)."""
    n, p, s = ys.shape
    # Full 2D sample lattice: (N, P, S, P, S)
    yy = ys[:, :, :, None, None]
    xx = xs[:, None, None, :, :]
    yy = jnp.broadcast_to(yy, (n, p, s, p, s))
    xx = jnp.broadcast_to(xx, (n, p, s, p, s))
    yf = yy.reshape(n, -1)
    xf = xx.reshape(n, -1)

    # Out-of-range samples (beyond [-1, H]/[-1, W]) contribute zero.
    inside = (yf > -1.0) & (yf < h) & (xf > -1.0) & (xf < w)
    yf = jnp.clip(yf, 0.0, h - 1)
    xf = jnp.clip(xf, 0.0, w - 1)

    y0 = jnp.floor(yf)
    x0 = jnp.floor(xf)
    y1i = jnp.minimum(y0 + 1, h - 1).astype(jnp.int32)
    x1i = jnp.minimum(x0 + 1, w - 1).astype(jnp.int32)
    ly = yf - y0
    lx = xf - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def gather(yi, xi):
        return features[yi, xi]  # (N, PPSS, C) advanced indexing -> XLA gather

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    wy1, wx1 = ly[..., None], lx[..., None]
    wy0, wx0 = 1.0 - wy1, 1.0 - wx1
    val = (v00 * wy0 * wx0 + v01 * wy0 * wx1 +
           v10 * wy1 * wx0 + v11 * wy1 * wx1)
    val = jnp.where(inside[..., None], val, 0.0)

    # Masked bin average over the (S, S) lattice slots that are live for
    # this ROI's adaptive grid: reshape (N, P, S, P, S, C).
    c = val.shape[-1]
    val = val.reshape(n, p, s, p, s, c)
    lattice = (valid_y[:, None, :, None, None, None]
               & valid_x[:, None, None, None, :, None])
    val = jnp.where(lattice, val, 0.0)
    out = val.sum(axis=(2, 4)) / count[:, None, None, None]
    return out.reshape(n, p * p, c)


@partial(jax.jit, static_argnames=("strides", "output_size", "sampling_ratio",
                                   "max_grid", "canonical_level",
                                   "canonical_box_size"))
def multilevel_roi_align(features: list, strides: tuple, boxes: jnp.ndarray,
                         valid: jnp.ndarray, *, output_size: int,
                         sampling_ratio: int = 0, max_grid: int = 4,
                         canonical_level: int = 4,
                         canonical_box_size: int = 224) -> jnp.ndarray:
    """FPN-level-assigned ROIAlign (detectron2 ROIPooler semantics).

    Pools every box from every level, then selects the assigned level
    (level = floor(canonical + log2(sqrt(area)/canonical_size)), clamped) —
    a select is cheaper on TPU than data-dependent routing, and keeps the
    graph static. Reference: detectron2 ROIPooler used via
    code_generator/utils.py:179-293 (MultilevelROIPooler).

    Args:
      features: list of (H_l, W_l, C) maps, one per level.
      strides: per-level strides.
      boxes: (N, 4) XYXY image coords; valid: (N,).

    Returns:
      (N, P, P, C) pooled features (zeros for invalid boxes).
    """
    import math

    from ..structures import box_area

    num_levels = len(features)
    min_level = int(math.log2(strides[0]))
    area = box_area(boxes)
    target = jnp.floor(canonical_level + jnp.log2(
        jnp.sqrt(jnp.maximum(area, 1e-6)) / canonical_box_size + 1e-8))
    target = jnp.clip(target, min_level, min_level + num_levels - 1).astype(jnp.int32)
    level_idx = target - min_level  # (N,) in [0, num_levels)

    pooled = jnp.stack([
        roi_align(f, boxes, spatial_scale=1.0 / s, output_size=output_size,
                  sampling_ratio=sampling_ratio, max_grid=max_grid)
        for f, s in zip(features, strides)
    ])  # (L, N, P, P, C)

    onehot = jax.nn.one_hot(level_idx, num_levels, dtype=pooled.dtype)  # (N, L)
    out = jnp.einsum("lnpqc,nl->npqc", pooled, onehot)
    return out * valid[:, None, None, None].astype(out.dtype)
