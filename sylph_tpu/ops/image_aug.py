"""Device-side color RandAugment (the train-time photometric ops).

The reference applies RandAugmentOp on the host inside the dataset
mapper (d2go AUG_OPS, Meta-FCOS-finetune.yaml:79-84); at 1024x1344 that
costs ~40 ms/image of host CPU per query — on a host with few cores the
augmentation, not the chip, bounds training throughput. Here the host
only *draws* the op ids and parameters (data/transforms.py::
draw_rand_augment, same rng stream as the host path) and the pixels are
transformed on the TPU inside the train step, where each op is a cheap
elementwise/LUT pass fused by XLA (~0.1 ms/image of HBM traffic).

Images arrive as zero-padded fixed canvases, but the host path augments
BEFORE padding — so every op here is computed over the content region
only (per-image ``(h, w)`` sizes): histogram statistics
(autocontrast/equalize/contrast) mask out padding, the SMOOTH filter's
"full window only" rule applies at the content border, and padding is
re-zeroed after the op sequence. Within the content region each op
reproduces the exact Pillow algorithm the host path uses
(PIL.ImageOps.autocontrast/equalize/posterize/solarize and
PIL.ImageEnhance.Color/Contrast/Brightness/Sharpness):

  * autocontrast(cutoff=0): per-channel lut ``trunc(ix*scale - lo*scale)``
    with lo/hi the occupied-bin extremes, identity when hi <= lo;
  * equalize: per-channel ``lut[i] = (step//2 + cumsum(h)[:i]) // step``
    with ``step = (total - last_nonzero_bin) // 255``, identity when
    step == 0;
  * Color/Contrast/Brightness/Sharpness: ``Image.blend(degenerate, im,
    factor)`` against the Pillow degenerates — ITU-R 601-2 L gray
    ((19595R + 38470G + 7471B + 0x8000) >> 16, Pillow convert.c), solid
    mean-gray (int(mean + .5)), black, and the SMOOTH 3x3 filter
    ([1,1,1;1,5,1;1,1,1]/13, borders left unfiltered);
  * posterize: keep the top ``bits`` bits; solarize: invert >= threshold.

Op ids index data/transforms.py::_COLOR_OPS — keep the two tuples in
lockstep.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

_L_R, _L_G, _L_B = 19595, 38470, 7471  # Pillow convert.c L24 coefficients


class _Region(NamedTuple):
    """Content-region context: (H, W, 1) bool mask + traced h, w."""
    mask: jnp.ndarray
    h: jnp.ndarray
    w: jnp.ndarray


def _gray_l(img: jnp.ndarray) -> jnp.ndarray:
    """Pillow convert("L"): (19595R + 38470G + 7471B + 0x8000) >> 16.

    Channels must already be RGB-ordered (``rand_augment_device``
    reverses BGR canvases before the op scan).
    """
    x = img.astype(jnp.int32)
    l24 = _L_R * x[..., 0] + _L_G * x[..., 1] + _L_B * x[..., 2] + 0x8000
    return l24 >> 16  # int32 (H, W)


def _blend(degenerate: jnp.ndarray, img: jnp.ndarray,
           factor: jnp.ndarray) -> jnp.ndarray:
    """Image.blend(degenerate, img, factor) with clipping (factor may
    extrapolate beyond [0, 1], as ImageEnhance allows). Pillow's
    ImagingBlend TRUNCATES the float result (verified against
    ImageEnhance on a value ramp), so trunc — not round — here."""
    out = degenerate + factor * (img - degenerate)
    return jnp.clip(jnp.trunc(out), 0.0, 255.0)


def _autocontrast(img: jnp.ndarray, _p: jnp.ndarray,
                  r: _Region) -> jnp.ndarray:
    lo = jnp.min(jnp.where(r.mask, img, 255.0), axis=(0, 1))
    hi = jnp.max(jnp.where(r.mask, img, 0.0), axis=(0, 1))
    scale = 255.0 / jnp.maximum(hi - lo, 1.0)
    offset = -lo * scale
    mapped = jnp.clip(jnp.trunc(img * scale + offset), 0.0, 255.0)
    return jnp.where(hi <= lo, img, mapped)


def _equalize(img: jnp.ndarray, _p: jnp.ndarray, r: _Region) -> jnp.ndarray:
    # TPU note: both the histogram and the LUT application are written
    # as compare+reduce over a broadcast 256-bin axis — XLA fuses the
    # comparison into the reduction (one VPU pass per bin tile), which
    # measures ~5x faster than a scatter-add histogram and ~6x faster
    # than a gather (lut[x]) on v5e, where 1M-element scatters/gathers
    # serialize (13-15 ms vs 2.5-3 ms at 1024x1344).
    x = img.astype(jnp.int32)
    bins = jnp.arange(256, dtype=jnp.int32)
    total = r.h * r.w

    def chan(xc: jnp.ndarray) -> jnp.ndarray:
        flat = xc.reshape(-1)
        onbin = flat[:, None] == bins  # fused into both reductions
        hist = jnp.sum(
            jnp.where(onbin & r.mask[..., 0].reshape(-1, 1), 1, 0), axis=0)
        last_idx = 255 - jnp.argmax(hist[::-1] > 0)
        step = (total - hist[last_idx]) // 255
        csum = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(hist)[:-1]])
        lut = jnp.clip((step // 2 + csum) // jnp.maximum(step, 1), 0, 255)
        mapped = jnp.sum(jnp.where(onbin, lut[None, :], 0),
                         axis=1).reshape(xc.shape)
        return jnp.where(step <= 0, xc, mapped)

    return jax.vmap(chan, in_axes=2, out_axes=2)(x).astype(img.dtype)


def _color(img: jnp.ndarray, factor: jnp.ndarray, r: _Region) -> jnp.ndarray:
    gray = _gray_l(img).astype(jnp.float32)[..., None]
    return _blend(jnp.broadcast_to(gray, img.shape), img, factor)


def _contrast(img: jnp.ndarray, factor: jnp.ndarray,
              r: _Region) -> jnp.ndarray:
    gray = _gray_l(img) * r.mask[..., 0]
    total = (r.h * r.w).astype(jnp.uint32)
    # int(mean + 0.5) in exact integer arithmetic: (2s + t) // 2t.
    # uint32: the numerator reaches 511 * H * W, which overflows int32
    # at ~4.2M content pixels (a 2048x2560 canvas); uint32 is exact to
    # ~8.4M (x64 is disabled on TPU, so int64 would silently truncate)
    s = jnp.sum(gray.astype(jnp.uint32))
    mean = ((2 * s + total) // (2 * total)).astype(jnp.float32)
    return _blend(jnp.full_like(img, mean), img, factor)


def _brightness(img: jnp.ndarray, factor: jnp.ndarray,
                r: _Region) -> jnp.ndarray:
    return _blend(jnp.zeros_like(img), img, factor)


def _sharpness(img: jnp.ndarray, factor: jnp.ndarray,
               r: _Region) -> jnp.ndarray:
    p = jnp.pad(img, ((1, 1), (1, 1), (0, 0)))
    acc = (p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
           + p[1:-1, :-2] + 5.0 * p[1:-1, 1:-1] + p[1:-1, 2:]
           + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:])
    sm = jnp.clip(jnp.floor(acc / 13.0 + 0.5), 0.0, 255.0)
    hh, ww = img.shape[:2]
    ii = jnp.arange(hh)[:, None, None]
    jj = jnp.arange(ww)[None, :, None]
    interior = (ii >= 1) & (ii <= r.h - 2) & (jj >= 1) & (jj <= r.w - 2)
    return _blend(jnp.where(interior, sm, img), img, factor)


def _posterize(img: jnp.ndarray, bits: jnp.ndarray,
               r: _Region) -> jnp.ndarray:
    q = jnp.exp2(8.0 - bits)  # exact powers of two for integer bits
    return jnp.floor(img / q) * q


def _solarize(img: jnp.ndarray, threshold: jnp.ndarray,
              r: _Region) -> jnp.ndarray:
    return jnp.where(img < threshold, img, 255.0 - img)


# order == data/transforms.py::_COLOR_OPS
_OPS = (_autocontrast, _equalize, _color, _contrast, _brightness,
        _sharpness, _posterize, _solarize)


def rand_augment_device(images: jnp.ndarray, op_ids: jnp.ndarray,
                        params: jnp.ndarray, image_sizes: jnp.ndarray,
                        bgr: bool = True) -> jnp.ndarray:
    """Apply per-image op sequences on device.

    images (B, H, W, 3) uint8 zero-padded canvases; op_ids (B, n) int32
    indexing _OPS; params (B, n) float32 (resolved op parameter, 0 where
    unused); image_sizes (B, 2) int32 content (h, w); ``bgr`` says the
    canvases are model-input BGR (INPUT.FORMAT) — the gray-based ops
    need RGB, so channels are reversed around the op scan (free: XLA
    folds the reversals into the adjacent ops). Returns uint8 with
    padding re-zeroed.
    """
    H, W = images.shape[1], images.shape[2]
    if bgr:
        images = images[..., ::-1]

    def one(img, ids, ps, hw):
        ii = jnp.arange(H)[:, None, None]
        jj = jnp.arange(W)[None, :, None]
        r = _Region(mask=(ii < hw[0]) & (jj < hw[1]), h=hw[0], w=hw[1])
        x = img.astype(jnp.float32)

        def body(x, id_p):
            i, p = id_p
            return lax.switch(i, _OPS, x, p, r), None

        x, _ = lax.scan(body, x, (ids, ps))
        return jnp.where(r.mask, jnp.clip(x, 0.0, 255.0),
                         0.0).astype(jnp.uint8)

    out = jax.vmap(one)(images, op_ids, params, image_sizes)
    return out[..., ::-1] if bgr else out
