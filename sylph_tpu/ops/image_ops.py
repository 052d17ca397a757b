"""Device-side image front-end: resize + normalize + pad on TPU.

The reference preprocesses on CPU (PIL resize in the dataset mapper,
mean/std + padding in the model, meta_one_stage_detector.py:174-178).
For serving, host-side resize of every frame wastes CPU and PCIe — this
module moves the whole front-end on-device as one jitted graph:

  host: decode JPEG → copy the raw uint8 frame into a fixed staging
        canvas (no resample);
  device: bilinear shortest-edge resize (gather-based, dynamic *values*
        but static shapes), content masking, cast — ready for the
        backbone, which applies mean/std.

Because the sampling grid is computed from traced (h, w) scalars, ONE
compiled graph serves every input resolution up to the staging canvas —
the TPU replacement for per-size recompiles.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("out_hw", "short", "max_size"))
def resize_shortest_edge_device(
    staging: jnp.ndarray,       # (Hs, Ws, 3) uint8/float — raw frame at
                                # top-left, anything beyond (h, w) junk
    src_hw: jnp.ndarray,        # (2,) int32 actual frame size
    *, out_hw: Tuple[int, int], short: int, max_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """detectron2 ResizeShortestEdge on device.

    Returns (canvas (outH, outW, 3) float32 with the resized content at
    the top-left and zeros elsewhere, content_hw (2,) int32).
    """
    hs, ws, _ = staging.shape
    oh, ow = out_hw
    h = src_hw[0].astype(jnp.float32)
    w = src_hw[1].astype(jnp.float32)

    scale = short / jnp.minimum(h, w)
    scale = jnp.where(jnp.maximum(h, w) * scale > max_size,
                      max_size / jnp.maximum(h, w), scale)
    # clamp so the result fits the output canvas
    scale = jnp.minimum(scale, jnp.minimum(oh / h, ow / w))
    nh = jnp.round(h * scale)
    nw = jnp.round(w * scale)

    # bilinear sample grid over the OUTPUT canvas; pixels beyond the
    # resized content are masked to zero.
    ys = (jnp.arange(oh, dtype=jnp.float32) + 0.5) * (h / nh) - 0.5
    xs = (jnp.arange(ow, dtype=jnp.float32) + 0.5) * (w / nw) - 0.5
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    y1 = jnp.minimum(y0 + 1, h - 1.0)
    x1 = jnp.minimum(x0 + 1, w - 1.0)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]

    img = staging.astype(jnp.float32)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)

    def g(yi, xi):
        return img[yi[:, None], xi[None, :]]

    out = (g(y0i, x0i) * (1 - wy) * (1 - wx) + g(y0i, x1i) * (1 - wy) * wx
           + g(y1i, x0i) * wy * (1 - wx) + g(y1i, x1i) * wy * wx)

    row_ok = jnp.arange(oh)[:, None, None] < nh.astype(jnp.int32)
    col_ok = jnp.arange(ow)[None, :, None] < nw.astype(jnp.int32)
    out = jnp.where(row_ok & col_ok, out, 0.0)
    content = jnp.stack([nh, nw]).astype(jnp.int32)
    return out, content


@partial(jax.jit, static_argnames=("out_hw", "short", "max_size"))
def preprocess_batch_device(staging: jnp.ndarray, src_hw: jnp.ndarray, *,
                            out_hw: Tuple[int, int], short: int,
                            max_size: int):
    """vmapped front-end for a batch of staged frames."""
    fn = partial(resize_shortest_edge_device, out_hw=out_hw, short=short,
                 max_size=max_size)
    return jax.vmap(lambda im, hw: fn(im, hw))(staging, src_hw)
