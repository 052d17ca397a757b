"""Deformable conv v2 (ops/deform_conv.py) against an independent
numpy oracle + degenerate-case exactness.

Covers the reference surface MODEL.FCOS.USE_DEFORMABLE
(/root/reference/sylph/modeling/meta_fcos/fcos.py:80-94): the last
tower conv becomes a modulated deformable conv.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sylph_tpu.ops.deform_conv import DFConv2d, deform_conv2d


def _oracle(x, offset, mask, kernel, bias, dilation=1):
    """Direct-loop DCNv2, zero outside borders (independent of the
    jax implementation: per-output-pixel scalar loops)."""
    B, H, W, C = x.shape
    kh, kw, _, cout = kernel.shape
    out = np.zeros((B, H, W, cout), np.float64)

    def sample(b, py, px):
        if py <= -1 or py >= H or px <= -1 or px >= W:
            return np.zeros(C)
        y0, x0 = int(np.floor(py)), int(np.floor(px))
        wy1, wx1 = py - y0, px - x0
        acc = np.zeros(C)
        for yy, wy in ((y0, 1 - wy1), (y0 + 1, wy1)):
            for xx, wx in ((x0, 1 - wx1), (x0 + 1, wx1)):
                if 0 <= yy < H and 0 <= xx < W:
                    acc += x[b, yy, xx] * (wy * wx)
        return acc

    for b in range(B):
        for oy in range(H):
            for ox in range(W):
                for t in range(kh * kw):
                    ki, kj = t // kw, t % kw
                    py = oy + (ki - (kh - 1) // 2) * dilation \
                        + offset[b, oy, ox, 2 * t]
                    px = ox + (kj - (kw - 1) // 2) * dilation \
                        + offset[b, oy, ox, 2 * t + 1]
                    v = sample(b, py, px)
                    if mask is not None:
                        v = v * mask[b, oy, ox, t]
                    out[b, oy, ox] += v @ kernel[ki, kj]
    return out + (0 if bias is None else bias)


@pytest.mark.parametrize("modulated", [True, False])
def test_matches_numpy_oracle(modulated):
    rng = np.random.RandomState(0)
    B, H, W, C, cout = 2, 5, 6, 3, 4
    x = rng.randn(B, H, W, C).astype(np.float32)
    offset = (rng.randn(B, H, W, 18) * 1.7).astype(np.float32)
    mask = rng.rand(B, H, W, 9).astype(np.float32) if modulated else None
    kernel = rng.randn(3, 3, C, cout).astype(np.float32) * 0.3
    bias = rng.randn(cout).astype(np.float32)

    got = jax.jit(deform_conv2d)(
        jnp.asarray(x), jnp.asarray(offset),
        None if mask is None else jnp.asarray(mask),
        jnp.asarray(kernel), jnp.asarray(bias))
    want = _oracle(x, offset, mask, kernel, bias)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_zero_offset_equals_plain_conv():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 7, 8, 5).astype(np.float32)
    kernel = rng.randn(3, 3, 5, 6).astype(np.float32)
    got = deform_conv2d(jnp.asarray(x), jnp.zeros((1, 7, 8, 18)),
                        jnp.ones((1, 7, 8, 9)), jnp.asarray(kernel))
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(kernel), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_integer_offset_is_a_shift():
    # every tap shifted +1 in x == conv over the left-shifted,
    # zero-padded input
    rng = np.random.RandomState(2)
    x = rng.randn(1, 6, 6, 2).astype(np.float32)
    kernel = rng.randn(3, 3, 2, 3).astype(np.float32)
    offset = np.zeros((1, 6, 6, 18), np.float32)
    offset[..., 1::2] = 1.0  # dx = +1 for all 9 taps
    got = deform_conv2d(jnp.asarray(x), jnp.asarray(offset), None,
                        jnp.asarray(kernel))
    x_shift = np.concatenate([x[:, :, 1:], np.zeros((1, 6, 1, 2),
                                                    np.float32)], 2)
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x_shift), jnp.asarray(kernel), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # column 0 differs by construction: conv SAME-padding zeroes the
    # column the deformable sampler can still reach (x[:, :, 0]).
    np.testing.assert_allclose(np.asarray(got)[:, :, 1:],
                               np.asarray(want)[:, :, 1:],
                               rtol=1e-4, atol=1e-4)


def test_module_init_is_half_plain_conv_and_trains():
    """Zero-init offset head => offsets 0, modulation sigmoid(0)=0.5:
    the module starts as 0.5 x the plain conv with its kernel, and the
    whole thing is differentiable (finite grads incl. offset conv)."""
    m = DFConv2d(4, compute_dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(3).randn(2, 6, 6, 3),
                    jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": params}, x)

    want = 0.5 * jax.lax.conv_general_dilated(
        x, params["kernel"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + params["bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    def loss(p):
        return (m.apply({"params": p}, x) ** 2).mean()

    grads = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # the offset head must receive gradient through the sampling
    assert float(jnp.abs(grads["offset"]["kernel"]).max()) > 0


def test_fcos_head_use_deformable_shapes():
    from sylph_tpu.models.fcos_head import FCOSHead
    head = FCOSHead(num_classes=7, num_cls_convs=2, num_box_convs=2,
                    use_deformable=True, compute_dtype=jnp.float32,
                    num_levels=2)
    feats = [jnp.zeros((1, 8, 8, 256)), jnp.zeros((1, 4, 4, 256))]
    params = jax.jit(head.init)(jax.random.PRNGKey(0), feats)["params"]
    # last tower conv is the deformable one (has an offset submodule)
    assert "offset" in params["cls_tower"]["conv1"]
    assert "offset" not in params["cls_tower"]["conv0"]
    out = jax.jit(head.apply)({"params": params}, feats)
    assert out.logits.shape == (1, 8 * 8 + 4 * 4, 7)
