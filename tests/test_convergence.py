"""Overfit test: episodic training must drive the loss down.

One fixed synthetic episode, ~40 steps of the real shard_map train step
— the episodic focal loss (conditioned on hypernetwork-generated codes)
must drop by a large factor, proving gradients flow end to end through
backbone → code generator → conditional head.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sylph_tpu.models.meta_arch import MetaOneStageDetector
from sylph_tpu.ops.fcos_losses import FCOSLossCfg
from sylph_tpu.ops.locations import build_location_grid
from sylph_tpu.parallel.mesh import create_mesh, shard_batch
from sylph_tpu.train.optimizer import build_optimizer
from sylph_tpu.train.steps import make_episodic_train_step
from sylph_tpu.train.train_state import create_train_state

CANVAS = (64, 64)


@pytest.mark.slow
def test_episodic_training_overfits_one_episode():
    mesh = create_mesh()
    n = jax.device_count()
    shot = 1
    model = MetaOneStageDetector(
        depth=18, num_classes=4, num_cls_convs=1, num_box_convs=1,
        compute_dtype=jnp.float32,
        code_generator_kwargs={"tower_layers": (("GN", "ReLU"),)})

    rng = np.random.RandomState(0)
    # one distinctive support/query pair replicated across devices
    sup_img = rng.rand(1, *CANVAS, 3).astype(np.float32) * 255
    qry_img = sup_img.copy()
    batch = {
        "support_images": np.tile(sup_img, (n * shot, 1, 1, 1)),
        "support_boxes": np.tile(np.array([[8, 8, 52, 56.0]], np.float32),
                                 (n * shot, 1)),
        "support_box_valid": np.ones((n * shot,), bool),
        "query_images": np.tile(qry_img, (n, 1, 1, 1)),
        "query_gt_boxes": np.tile(np.array([[[8, 8, 52, 56.0]]], np.float32),
                                  (n, 1, 1)),
        "query_gt_labels": np.zeros((n, 1), np.int32),
        "query_gt_valid": np.ones((n, 1), bool),
        "episode_class_ids": np.zeros((n,), np.int32),
    }

    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((shot, *CANVAS, 3)), jnp.zeros((shot, 4)),
        jnp.ones((shot,), bool), jnp.zeros((1, *CANVAS, 3)), shot,
        method=MetaOneStageDetector.forward_episodic_train)["params"]
    tx, _ = build_optimizer(params, base_lr=0.02, warmup_iters=0,
                            weight_decay=0.0, clip_grad_norm=1.0)
    state = create_train_state(params, tx)
    grid = build_location_grid(CANVAS, (8, 16, 32, 64, 128),
                               [64, 128, 256, 512])
    step = make_episodic_train_step(model, tx, grid, FCOSLossCfg(), mesh,
                                    num_shots=shot)

    sb = shard_batch(mesh, batch)
    losses = []
    for it in range(40):
        state, metrics = step(state, sb, jax.random.PRNGKey(it))
        losses.append(float(np.asarray(metrics["loss_fcos_cls"])))
    first = np.mean(losses[:3])
    last = np.mean(losses[-3:])
    assert np.isfinite(last)
    assert last < first * 0.5, (first, last)
