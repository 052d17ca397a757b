"""Variant smoke tests: ROIEncoder episodic training, OWD training and
decode, TFA runner one-step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sylph_tpu.models.meta_arch import MetaOneStageDetector
from sylph_tpu.ops.fcos_losses import FCOSLossCfg
from sylph_tpu.ops.locations import build_location_grid
from sylph_tpu.parallel.mesh import create_mesh, shard_batch
from sylph_tpu.train.optimizer import build_optimizer
from sylph_tpu.train.steps import (make_episodic_train_step,
                                   make_pretrain_train_step)
from sylph_tpu.train.train_state import create_train_state

CANVAS = (128, 128)
STRIDES = (8, 16, 32, 64, 128)
SOI = [64, 128, 256, 512]


def _episodic_batch(n, shot, q=1):
    rng = np.random.RandomState(1)
    return {
        "support_images": rng.rand(n * shot, *CANVAS, 3).astype(np.float32),
        "support_boxes": np.tile(np.array([[10, 10, 80, 90.0]], np.float32),
                                 (n * shot, 1)),
        "support_box_valid": np.ones((n * shot,), bool),
        "query_images": rng.rand(n * q, *CANVAS, 3).astype(np.float32),
        "query_gt_boxes": np.tile(
            np.array([[[12, 12, 70, 88.0]]], np.float32), (n * q, 2, 1)),
        "query_gt_labels": np.tile(np.array([[1, 0]], np.int32), (n * q, 1)),
        "query_gt_valid": np.tile(np.array([[True, False]]), (n * q, 1)),
        "episode_class_ids": (np.arange(n) % 5).astype(np.int32),
    }


@pytest.mark.slow
def test_roi_encoder_episodic_training_step():
    """Transformer code generator trains under shard_map with dropout."""
    mesh = create_mesh()
    n = jax.device_count()
    shot = 2
    model = MetaOneStageDetector(
        depth=18, num_classes=8, num_cls_convs=1, num_box_convs=1,
        compute_dtype=jnp.float32, code_generator_name="ROIEncoder",
        code_generator_kwargs={})
    batch = _episodic_batch(n, shot)
    params = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((shot, *CANVAS, 3)), jnp.zeros((shot, 4)),
        jnp.ones((shot,), bool), jnp.zeros((1, *CANVAS, 3)), shot,
        method=MetaOneStageDetector.forward_episodic_train)["params"]
    tx, _ = build_optimizer(params, base_lr=5e-4, warmup_iters=0,
                            freeze_cfg={"backbone": True, "episodic": True})
    state = create_train_state(params, tx)
    grid = build_location_grid(CANVAS, STRIDES, SOI)
    step = make_episodic_train_step(model, tx, grid, FCOSLossCfg(), mesh,
                                    num_shots=shot)
    state, metrics = step(state, shard_batch(mesh, batch),
                          jax.random.PRNGKey(3))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # the transformer encoder actually has params
    cg = state.params["code_generator"]
    assert "encoder_layer0" in cg


@pytest.mark.slow
def test_owd_pretrain_step_and_decode():
    """OWD: no cls loss, iou-quality keys; decode single-channel."""
    mesh = create_mesh()
    n = jax.device_count()
    model = MetaOneStageDetector(
        depth=18, num_classes=8, num_cls_convs=1, num_box_convs=1,
        compute_dtype=jnp.float32, code_generator_name="none")
    rng = np.random.RandomState(0)
    batch = {
        "images": rng.rand(n, *CANVAS, 3).astype(np.float32),
        "gt_boxes": np.tile(np.array([[[8, 8, 90, 100.0]]], np.float32),
                            (n, 2, 1)),
        "gt_labels": np.zeros((n, 2), np.int32),
        "gt_valid": np.tile(np.array([[True, False]]), (n, 1)),
    }
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, *CANVAS, 3)))["params"]
    cfg = FCOSLossCfg(owd=True, box_quality=("ctrness", "iou"))
    tx, _ = build_optimizer(params, base_lr=0.01, warmup_iters=0,
                            freeze_cfg={"owd": True})
    state = create_train_state(params, tx)
    grid = build_location_grid(CANVAS, STRIDES, SOI)
    step = make_pretrain_train_step(model, tx, grid, cfg, mesh)
    state, metrics = step(state, shard_batch(mesh, batch))
    assert "loss_fcos_cls" not in metrics
    assert {"loss_fcos_iou", "loss_fcos_ctr", "loss_fcos_loc"} <= \
        set(metrics)
