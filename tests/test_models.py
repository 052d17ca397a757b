"""Model stack tests: shape contracts, forward modes, torch conv parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sylph_tpu.models.meta_arch import MetaOneStageDetector
from sylph_tpu.ops.locations import build_location_grid

CANVAS = (128, 128)
STRIDES = (8, 16, 32, 64, 128)


def tiny_model(**kw):
    defaults = dict(
        depth=18, num_classes=8, num_cls_convs=1, num_box_convs=1,
        compute_dtype=jnp.float32,
        code_generator_kwargs={"tower_layers": (("GN", "ReLU"),)},
    )
    defaults.update(kw)
    return MetaOneStageDetector(**defaults)


@pytest.fixture(scope="module")
def episodic_setup():
    model = tiny_model()
    rng = jax.random.PRNGKey(0)
    e, shot, q = 2, 2, 1
    sup = jnp.zeros((e * shot, *CANVAS, 3), jnp.float32)
    boxes = jnp.tile(jnp.asarray([[10.0, 10.0, 80.0, 90.0]]), (e * shot, 1))
    valid = jnp.ones((e * shot,), bool)
    qry = jnp.zeros((e * q, *CANVAS, 3), jnp.float32)
    variables = model.init(
        rng, sup, boxes, valid, qry, shot,
        method=MetaOneStageDetector.forward_episodic_train)
    return model, variables, (sup, boxes, valid, qry, shot)


def test_base_forward_shapes():
    model = tiny_model(code_generator_name="none")
    x = jnp.zeros((2, *CANVAS, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    grid = build_location_grid(CANVAS, STRIDES, [64, 128, 256, 512])
    k = grid.num_locations
    assert out.logits.shape == (2, k, 8)
    assert out.reg.shape == (2, k, 4)
    assert out.ctrness.shape == (2, k)
    assert out.iou.shape == (2, k)
    # reg is post-relu -> nonnegative
    assert float(jnp.min(out.reg)) >= 0.0
    # prior-prob bias init -> sigmoid(logits) near 0.01 at init
    p = jax.nn.sigmoid(np.asarray(out.logits)).mean()
    assert 0.003 < p < 0.05


def test_episodic_train_forward(episodic_setup):
    model, variables, (sup, boxes, valid, qry, shot) = episodic_setup
    out, codes = model.apply(
        variables, sup, boxes, valid, qry, shot,
        method=MetaOneStageDetector.forward_episodic_train)
    e = sup.shape[0] // shot
    assert codes["cls_conv"].shape == (e, 256)
    assert codes["cls_bias"].shape == (e,)
    assert out.logits.shape[-1] == e  # way == episodes in batch
    assert np.isfinite(np.asarray(codes["cls_conv"])).all()


def test_class_code_then_instances(episodic_setup):
    model, variables, (sup, boxes, valid, _, shot) = episodic_setup
    # registration phase: all support images belong to ONE class
    raw = model.apply(variables, sup, boxes, valid, sup.shape[0], False,
                      method=MetaOneStageDetector.forward_class_code)
    assert raw["cls_conv"].shape == (1, 256)
    normed = model.apply(variables, raw,
                         method=MetaOneStageDetector.normalize_code)
    # normalization: post GN + l2 + scale => unit-ish norm
    n = float(jnp.linalg.norm(normed["cls_conv"][0]))
    assert 0.5 < n < 2.0
    # bias gets the focal prior offset
    assert float(normed["cls_bias"][0]) < 0

    # build a padded bank of 4 classes, only first valid
    bank = {
        "cls_conv": jnp.tile(normed["cls_conv"], (4, 1)),
        "cls_bias": jnp.tile(normed["cls_bias"], (4,)),
    }
    img = jnp.zeros((1, *CANVAS, 3), jnp.float32)
    out = model.apply(variables, img, bank,
                      method=MetaOneStageDetector.forward_instances)
    assert out.logits.shape[-1] == 4


def test_conv_padding_matches_torch():
    """Stride-2 3x3 conv: flax explicit padding must equal torch pad=1.

    This is what guarantees converted detectron2 checkpoints reproduce
    reference activations (XLA SAME padding would differ).
    """
    import torch
    import flax.linen as nn

    rng = np.random.RandomState(0)
    x = rng.randn(1, 10, 10, 4).astype(np.float32)
    w = rng.randn(3, 3, 4, 6).astype(np.float32)

    conv = nn.Conv(6, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                   use_bias=False)
    out = conv.apply({"params": {"kernel": jnp.asarray(w)}}, jnp.asarray(x))

    tw = torch.from_numpy(w).permute(3, 2, 0, 1)  # OIHW
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    tout = torch.nn.functional.conv2d(tx, tw, stride=2, padding=1)
    np.testing.assert_allclose(
        np.asarray(out), tout.permute(0, 2, 3, 1).numpy(),
        rtol=1e-4, atol=1e-4)


def test_maxpool_matches_torch():
    import torch
    import flax.linen as nn

    rng = np.random.RandomState(1)
    x = rng.randn(1, 8, 8, 3).astype(np.float32)
    out = nn.max_pool(jnp.asarray(x), (3, 3), strides=(2, 2),
                      padding=[(1, 1), (1, 1)])
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    tout = torch.nn.functional.max_pool2d(tx, 3, stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(out),
                               tout.permute(0, 2, 3, 1).numpy(), rtol=1e-5)


def test_roi_encoder_variant():
    model = tiny_model(code_generator_name="ROIEncoder",
                       code_generator_kwargs={})
    rng = jax.random.PRNGKey(0)
    shot = 2
    sup = jnp.zeros((2 * shot, *CANVAS, 3), jnp.float32)
    boxes = jnp.tile(jnp.asarray([[8.0, 8.0, 60.0, 70.0]]), (2 * shot, 1))
    valid = jnp.ones((2 * shot,), bool)
    variables = model.init(
        {"params": rng, "dropout": jax.random.PRNGKey(1)},
        sup, boxes, valid, shot, False,
        method=MetaOneStageDetector.forward_class_code)
    codes = model.apply(
        variables, sup, boxes, valid, shot, False,
        method=MetaOneStageDetector.forward_class_code)
    assert codes["cls_conv"].shape == (2, 256)
    assert codes["cls_bias"].shape == (2,)
    # ROIEncoder bias folds the focal prior in directly
    assert np.asarray(codes["cls_bias"]).mean() < 0


def test_s2d_stem_exact_and_merge():
    """2x2 space-to-depth stem is numerically identical to the 7x7/s2
    stem, and merge_params auto-scatters a stored 7x7 kernel into the
    s2d layout (TPU MLPerf ResNet "conv0 space-to-depth")."""
    from sylph_tpu.models.resnet import ResNet, stem_kernel_to_s2d
    from sylph_tpu.train.checkpoint import merge_params

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 64, 96, 3).astype(np.float32))
    m0 = ResNet(depth=18, compute_dtype=jnp.float32, s2d_stem=False)
    m1 = ResNet(depth=18, compute_dtype=jnp.float32, s2d_stem=True)
    p0 = m0.init(jax.random.PRNGKey(0), x)["params"]
    p1 = m1.init(jax.random.PRNGKey(1), x)["params"]
    assert p1["stem_conv1"]["kernel"].shape == (4, 4, 12, 64)

    # direct kernel scatter
    p1s = jax.tree.map(lambda a: a, p0)
    p1s["stem_conv1"]["kernel"] = stem_kernel_to_s2d(
        p0["stem_conv1"]["kernel"])
    y0 = m0.apply({"params": p0}, x)
    y1 = m1.apply({"params": p1s}, x)
    for k in y0:
        np.testing.assert_allclose(np.asarray(y0[k]), np.asarray(y1[k]),
                                   atol=1e-4)

    # merge_params applies the same scatter when loading a 7x7
    # checkpoint into an s2d model
    merged = merge_params(p1, p0)
    np.testing.assert_allclose(
        np.asarray(merged["stem_conv1"]["kernel"]),
        np.asarray(p1s["stem_conv1"]["kernel"]), atol=0)
    y2 = m1.apply({"params": merged}, x)
    for k in y0:
        np.testing.assert_allclose(np.asarray(y0[k]), np.asarray(y2[k]),
                                   atol=1e-4)


def test_s2d_stem_kernel_roundtrip():
    """s2d scatter is exactly invertible; merge_params converts BOTH
    directions, so checkpoints trained with either stem layout load
    into either model."""
    from sylph_tpu.models.resnet import (stem_kernel_from_s2d,
                                         stem_kernel_to_s2d)
    from sylph_tpu.train.checkpoint import merge_params

    w7 = np.random.RandomState(0).randn(7, 7, 3, 64).astype(np.float32)
    w4 = stem_kernel_to_s2d(w7)
    np.testing.assert_array_equal(stem_kernel_from_s2d(w4), w7)

    # s2d checkpoint -> plain model via merge_params
    init = {"stem_conv1": {"kernel": np.zeros((7, 7, 3, 64), np.float32)}}
    loaded = {"stem_conv1": {"kernel": w4}}
    merged = merge_params(init, loaded)
    np.testing.assert_array_equal(merged["stem_conv1"]["kernel"], w7)
