"""Deformable convolution v2 (modulated), TPU-native.

Parity target: the reference's FCOS head towers swap the LAST tower
conv for AdelaiDet's ``DFConv2d`` when ``MODEL.FCOS.USE_DEFORMABLE``
(/root/reference/sylph/modeling/meta_fcos/fcos.py:15,80-94, config key
adet_configs.py:52 — off in every shipped sylph config, but part of the
reference surface). Semantics follow DCNv2 (Zhu et al., "Deformable
ConvNets v2"): each kernel tap samples the input at a learned
fractional offset from its integer position, bilinearly interpolated,
optionally scaled by a learned sigmoid modulation mask.

TPU-first design — instead of translating the CUDA im2col kernel:

* sampling is ONE (2,2,C) patch **gather** per kernel tap from a
  1-pixel zero-padded copy of the input (``lax.gather``) — measured 2x
  the throughput of 4 separate corner row-gathers on v5e (TPU gather
  is index-throughput-bound: ~75 GB/s effective either way, but the
  patch form issues a quarter of the index work). Per-corner validity
  masks on the blend weights reproduce the CUDA kernel's
  zero-outside-border bilinear semantics exactly (the padding row
  covers the [-1, H] fringe; masks cover arbitrarily far samples);
* ALL multiply-accumulate work then lands in ONE
  ``(B,H,W,K*Cin) x (K*Cin,Cout)`` einsum — a single MXU matmul, the
  same contraction a dense conv lowers to, so the deformable layer
  keeps the tower's matmul efficiency and only pays for the gathers;
* everything is static-shaped and jit/vmap/grad-safe (no scatter, no
  data-dependent control flow).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bilinear_sample(x_pad: jnp.ndarray, py: jnp.ndarray,
                     px: jnp.ndarray) -> jnp.ndarray:
    """Sample at fractional positions (B,H,W), bilinear, zero outside
    the border (DCN CUDA semantics).

    ``x_pad`` is the input zero-padded by 1 on each spatial side
    (B, H+2, W+2, C): one (2,2,C) patch gather per call covers all 4
    bilinear corners; the pad row makes every corner in [-1, H] a real
    (zero) read, and validity masks zero the blend weight for corners
    beyond that fringe.
    """
    B, Hp, Wp, C = x_pad.shape
    H, W = Hp - 2, Wp - 2
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy1 = py - y0
    wx1 = px - x0

    # patch start in padded coords; CLIP keeps far-outside starts legal
    # (their weights are masked to 0 below).
    starts = jnp.stack(
        [jnp.clip(y0 + 1.0, 0, H).astype(jnp.int32).reshape(B, -1),
         jnp.clip(x0 + 1.0, 0, W).astype(jnp.int32).reshape(B, -1)], -1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))
    patch = jax.vmap(lambda xb, sb: jax.lax.gather(
        xb, sb, dn, slice_sizes=(2, 2, C),
        mode=jax.lax.GatherScatterMode.CLIP))(x_pad, starts)
    patch = patch.reshape(py.shape + (2, 2, C))

    out = jnp.zeros(py.shape + (C,), x_pad.dtype)
    for dy, wy in ((0, 1.0 - wy1), (1, wy1)):
        for dx, wx in ((0, 1.0 - wx1), (1, wx1)):
            yy, xx = y0 + dy, x0 + dx
            # strictly-in-bounds mask: a corner at -1 or H reads the
            # zero pad (no numeric effect), and whenever CLIP actually
            # moved a patch start both its corners are outside this
            # range — so misaligned patch rows never contribute.
            valid = ((yy >= 0) & (yy <= H - 1) & (xx >= 0)
                     & (xx <= W - 1))
            w = (wy * wx * valid)[..., None].astype(x_pad.dtype)
            out = out + patch[..., dy, dx, :] * w
    return out


def deform_conv2d(x: jnp.ndarray, offset: jnp.ndarray,
                  mask: Optional[jnp.ndarray], kernel: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None,
                  dilation: int = 1) -> jnp.ndarray:
    """Modulated deformable conv, stride 1, SAME padding, NHWC.

    x      : (B, H, W, Cin)
    offset : (B, H, W, 2*K) — per tap t (row-major over the kernel
             window) channels [2t]=dy, [2t+1]=dx. This internal layout
             is a free choice (the offset head is learned jointly);
             it is documented here because a torch-DCN checkpoint
             import would need the corresponding interleave.
    mask   : (B, H, W, K) modulation in [0,1], or None (DCNv1)
    kernel : (kh, kw, Cin, Cout)
    """
    B, H, W, C = x.shape
    kh, kw, _, cout = kernel.shape
    K = kh * kw
    base_y = jnp.arange(H, dtype=offset.dtype)[None, :, None]
    base_x = jnp.arange(W, dtype=offset.dtype)[None, None, :]
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    taps = []
    for t in range(K):
        ki, kj = t // kw, t % kw
        py = base_y + (ki - (kh - 1) // 2) * dilation + offset[..., 2 * t]
        px = base_x + (kj - (kw - 1) // 2) * dilation + offset[..., 2 * t + 1]
        val = _bilinear_sample(x_pad, py, px)
        if mask is not None:
            val = val * mask[..., t:t + 1].astype(val.dtype)
        taps.append(val)

    # (B,H,W,K*Cin) @ (K*Cin,Cout): tap-major concat matches
    # kernel.reshape's (kh,kw,Cin) row-major flattening.
    stacked = jnp.concatenate(taps, axis=-1)
    out = jnp.einsum("bhwk,ko->bhwo", stacked,
                     kernel.reshape(K * C, cout).astype(stacked.dtype),
                     preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


class DFConv2d(nn.Module):
    """Drop-in deformable tower conv (reference fcos.py:82-94).

    A standard conv predicts per-location offsets (+ modulation when
    ``with_modulated_dcn``); the main kernel then samples through
    ``deform_conv2d``. The offset head is zero-initialized so the layer
    starts as an exact plain conv scaled by sigmoid(0)=0.5 in the
    modulated case (the identity-sampling deformable init).
    """

    features: int
    kernel_size: int = 3
    dilation: int = 1
    with_modulated_dcn: bool = True
    use_bias: bool = True
    compute_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ks = self.kernel_size
        K = ks * ks
        pad = self.dilation * (ks - 1) // 2
        off_ch = K * (3 if self.with_modulated_dcn else 2)
        om = nn.Conv(off_ch, (ks, ks), padding=[(pad, pad)] * 2,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     kernel_dilation=(self.dilation, self.dilation),
                     name="offset")(x)
        om = om.astype(jnp.float32)
        offset = om[..., :2 * K]
        mask = (nn.sigmoid(om[..., 2 * K:])
                if self.with_modulated_dcn else None)

        c_in = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.normal(0.01),
                            (ks, ks, c_in, self.features))
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,)) if self.use_bias else None)
        return deform_conv2d(x.astype(self.compute_dtype), offset, mask,
                             kernel, bias, dilation=self.dilation)
