"""Full-model golden parity vs an independent torch reimplementation.

The strongest conversion/fidelity evidence available without real COCO
data (BASELINE milestone #4): generate a random reference-named state
dict, run the complete torch graph (tests/torch_reference.py — R-50 +
FPN + MetaFCOSHead + CodeGenerator, reference fcos.py:382-667 /
code_generator.py:924-1002), convert the state dict, and require the
flax model to reproduce per-location logits/reg/ctrness/iou, generated
class codes, the conditioned forward, and the decoded per-box outputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sylph_tpu.models.meta_arch import MetaOneStageDetector
from sylph_tpu.train.checkpoint import merge_params
from sylph_tpu.utils.convert_weights import convert_detectron2_checkpoint

from test_ops import np_roi_align
from torch_reference import (make_meta_fcos_sd, torch_backbone_fpn,
                             torch_code_generator, torch_fcos_head)

CANVAS = (128, 256)
SUPPORT_CANVAS = (128, 128)
NUM_CLASSES = 80
STRIDES = (8, 16, 32, 64, 128)


@pytest.fixture(scope="module")
def golden():
    rng = np.random.RandomState(7)
    sd = make_meta_fcos_sd(rng, num_classes=NUM_CLASSES)
    converted = convert_detectron2_checkpoint(sd)

    model = MetaOneStageDetector(
        depth=50, num_classes=NUM_CLASSES, compute_dtype=jnp.float32,
        code_generator_name="CodeGenerator")

    query = (rng.rand(1, *CANVAS, 3) * 255).astype(np.float32)
    shot, n_cls = 2, 2
    support = (rng.rand(shot * n_cls, *SUPPORT_CANVAS, 3) * 255) \
        .astype(np.float32)
    boxes = np.array([[12.0, 10.0, 80.0, 90.0],
                      [30.0, 20.0, 100.0, 110.0],
                      [5.0, 6.0, 120.0, 96.0],
                      [40.0, 32.0, 104.0, 120.0]], np.float32)

    base_init = jax.jit(lambda r: model.init(r, jnp.asarray(query)))(
        jax.random.PRNGKey(0))["params"]
    epi_init = jax.jit(lambda r: model.init(
        r, jnp.asarray(support), jnp.asarray(boxes),
        jnp.ones((len(boxes),), bool), jnp.asarray(query), shot,
        method=MetaOneStageDetector.forward_episodic_train))(
        jax.random.PRNGKey(0))["params"]

    return dict(sd=sd, model=model, query=query, support=support,
                boxes=boxes, shot=shot,
                base_params=merge_params(base_init, converted),
                epi_params=merge_params(epi_init, converted))


@pytest.mark.slow
def test_base_forward_matches_torch(golden):
    sd, model, query = golden["sd"], golden["model"], golden["query"]
    t_feats = torch_backbone_fpn(sd, query)
    t_logits, t_reg, t_ctr, t_iou = torch_fcos_head(sd, t_feats)

    out = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, method=MetaOneStageDetector.forward_base))(
        golden["base_params"], jnp.asarray(query))

    # Activations are O(100) through the backbone; per-location head
    # outputs are O(1) after the GN towers. 50 fp32 conv layers of
    # XLA-vs-torch accumulation-order differences land ~1e-3.
    np.testing.assert_allclose(np.asarray(out.logits), t_logits,
                               rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.reg), t_reg,
                               rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.ctrness), t_ctr,
                               rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.iou), t_iou,
                               rtol=1e-3, atol=5e-3)


@pytest.mark.slow
def test_class_codes_match_torch(golden):
    sd, model = golden["sd"], golden["model"]
    support, boxes, shot = golden["support"], golden["boxes"], golden["shot"]

    t_feats = torch_backbone_fpn(sd, support)
    (t_code, t_raw) = torch_code_generator(
        sd, t_feats, boxes, shot, np_roi_align)

    params = golden["epi_params"]
    raw = jax.jit(lambda p: model.apply(
        {"params": p}, jnp.asarray(support), jnp.asarray(boxes),
        jnp.ones((len(boxes),), bool), shot, False,
        method=MetaOneStageDetector.forward_class_code))(params)
    np.testing.assert_allclose(np.asarray(raw["cls_conv"]), t_raw[0],
                               rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(raw["cls_bias"]), t_raw[1],
                               rtol=1e-3, atol=5e-3)

    norm = jax.jit(lambda p, c: model.apply(
        {"params": p}, c, method=MetaOneStageDetector.normalize_code))(
        params, {k: jnp.asarray(v) for k, v in raw.items()})
    np.testing.assert_allclose(np.asarray(norm["cls_conv"]),
                               t_code["cls_conv"], rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(norm["cls_bias"]),
                               t_code["cls_bias"], rtol=1e-3, atol=5e-3)


@pytest.mark.slow
def test_conditioned_forward_and_decode_match_torch(golden):
    from sylph_tpu.ops.decode import DecodeCfg, decode_proposals
    from sylph_tpu.ops.locations import build_location_grid

    sd, model, query = golden["sd"], golden["model"], golden["query"]
    support, boxes, shot = golden["support"], golden["boxes"], golden["shot"]

    t_sfeats = torch_backbone_fpn(sd, support)
    t_code, _ = torch_code_generator(sd, t_sfeats, boxes, shot, np_roi_align)
    t_qfeats = torch_backbone_fpn(sd, query)
    t_logits, t_reg, t_ctr, t_iou = torch_fcos_head(
        sd, t_qfeats, class_code=t_code)

    params = golden["epi_params"]

    def fwd(p, q, s, b):
        raw = model.apply({"params": p}, s, b, jnp.ones((len(boxes),), bool),
                          shot, False,
                          method=MetaOneStageDetector.forward_class_code)
        code = model.apply({"params": p}, raw,
                           method=MetaOneStageDetector.normalize_code)
        return model.apply({"params": p}, q, code,
                           method=MetaOneStageDetector.forward_instances)

    out = jax.jit(fwd)(params, jnp.asarray(query), jnp.asarray(support),
                       jnp.asarray(boxes))
    np.testing.assert_allclose(np.asarray(out.logits), t_logits,
                               rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out.reg), t_reg,
                               rtol=1e-3, atol=5e-3)

    # Per-box decoded parity: run the same decode on both dense sets.
    grid = build_location_grid(CANVAS, STRIDES, [64, 128, 256, 512])
    args = (jnp.asarray(grid.locations), jnp.asarray(grid.strides),
            jnp.asarray(grid.level_ids), jnp.asarray([[CANVAS[0], CANVAS[1]]]),
            DecodeCfg(), tuple(h * w for h, w in grid.level_sizes))
    det_f = decode_proposals(out.logits, out.reg, out.ctrness, out.iou, *args)
    det_t = decode_proposals(jnp.asarray(t_logits), jnp.asarray(t_reg),
                             jnp.asarray(t_ctr), jnp.asarray(t_iou), *args)
    kf, kt = np.asarray(det_f.valid[0]), np.asarray(det_t.valid[0])
    assert kf.sum() == kt.sum() and kf.sum() > 0
    np.testing.assert_allclose(np.asarray(det_f.boxes[0])[kf],
                               np.asarray(det_t.boxes[0])[kt], atol=0.05)
    np.testing.assert_allclose(np.asarray(det_f.scores[0])[kf],
                               np.asarray(det_t.scores[0])[kt], atol=1e-3)
    assert (np.asarray(det_f.classes[0])[kf]
            == np.asarray(det_t.classes[0])[kt]).all()
