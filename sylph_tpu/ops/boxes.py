"""Box delta encoding/decoding (Faster R-CNN Box2BoxTransform)."""

from __future__ import annotations

import jax.numpy as jnp


def encode_deltas(src: jnp.ndarray, target: jnp.ndarray,
                  weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Deltas that map src boxes (anchors/proposals) onto target boxes."""
    sw = jnp.maximum(src[..., 2] - src[..., 0], 1e-6)
    sh = jnp.maximum(src[..., 3] - src[..., 1], 1e-6)
    sx = src[..., 0] + 0.5 * sw
    sy = src[..., 1] + 0.5 * sh
    tw = jnp.maximum(target[..., 2] - target[..., 0], 1e-6)
    th = jnp.maximum(target[..., 3] - target[..., 1], 1e-6)
    tx = target[..., 0] + 0.5 * tw
    ty = target[..., 1] + 0.5 * th
    wx, wy, ww, wh = weights
    return jnp.stack([
        wx * (tx - sx) / sw, wy * (ty - sy) / sh,
        ww * jnp.log(tw / sw), wh * jnp.log(th / sh)], axis=-1)


def decode_deltas(src: jnp.ndarray, deltas: jnp.ndarray,
                  weights=(1.0, 1.0, 1.0, 1.0),
                  clamp: float = 4.135166556742356) -> jnp.ndarray:
    """Apply deltas to src boxes (clamp = log(1000/16), detectron2)."""
    sw = jnp.maximum(src[..., 2] - src[..., 0], 1e-6)
    sh = jnp.maximum(src[..., 3] - src[..., 1], 1e-6)
    sx = src[..., 0] + 0.5 * sw
    sy = src[..., 1] + 0.5 * sh
    wx, wy, ww, wh = weights
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.clip(deltas[..., 2] / ww, -clamp, clamp)
    dh = jnp.clip(deltas[..., 3] / wh, -clamp, clamp)
    cx = sx + dx * sw
    cy = sy + dy * sh
    w = sw * jnp.exp(dw)
    h = sh * jnp.exp(dh)
    return jnp.stack([cx - 0.5 * w, cy - 0.5 * h,
                      cx + 0.5 * w, cy + 0.5 * h], axis=-1)
