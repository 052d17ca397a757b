"""Training-layer tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from sylph_tpu.models.meta_arch import MetaOneStageDetector
from sylph_tpu.ops.fcos_losses import FCOSLossCfg
from sylph_tpu.ops.locations import build_location_grid
from sylph_tpu.parallel.mesh import create_mesh, shard_batch
from sylph_tpu.train.optimizer import build_freeze_mask, build_optimizer
from sylph_tpu.train.steps import (make_episodic_train_step,
                                   make_pretrain_train_step)
from sylph_tpu.train.train_state import create_train_state

CANVAS = (128, 128)
STRIDES = (8, 16, 32, 64, 128)
SOI = [64, 128, 256, 512]


def _tiny_model(**kw):
    d = dict(depth=18, num_classes=8, num_cls_convs=1, num_box_convs=1,
             compute_dtype=jnp.float32,
             code_generator_kwargs={"tower_layers": (("GN", "ReLU"),)})
    d.update(kw)
    return MetaOneStageDetector(**d)


def test_freeze_mask_paths():
    model = _tiny_model(code_generator_name="none")
    x = jnp.zeros((1, *CANVAS, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    mask = build_freeze_mask(params, {"backbone": True, "episodic": True})
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    by_path = {"/".join(str(getattr(k, "key", k)) for k in p): v
               for p, v in flat}
    assert not any(v for p, v in by_path.items() if p.startswith("backbone/"))
    assert not any(v for p, v in by_path.items() if "cls_logits" in p)
    assert any(v for p, v in by_path.items() if "bbox_pred" in p)
    # BACKBONE.FREEZE covers the FPN too (detectron2 combined backbone)
    assert not any(v for p, v in by_path.items() if p.startswith("fpn/"))


def test_pretrain_step_runs_and_freezes():
    mesh = create_mesh()
    model = _tiny_model(code_generator_name="none")
    n = jax.device_count()
    b = n  # one image per device
    images = np.random.RandomState(0).rand(b, *CANVAS, 3).astype(np.float32)
    gt_boxes = np.tile(np.array([[8, 8, 90, 100.0]], np.float32), (b, 4, 1))
    gt_labels = np.zeros((b, 4), np.int32)
    gt_valid = np.zeros((b, 4), bool)
    gt_valid[:, 0] = True
    batch = {"images": images, "gt_boxes": gt_boxes,
             "gt_labels": gt_labels, "gt_valid": gt_valid}

    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, *CANVAS, 3)))["params"]
    tx, _ = build_optimizer(params, base_lr=0.01, warmup_iters=0,
                            freeze_cfg={"backbone": True})
    state = create_train_state(params, tx)
    grid = build_location_grid(CANVAS, STRIDES, SOI)
    step = make_pretrain_train_step(model, tx, grid, FCOSLossCfg(), mesh)

    before = jax.tree.map(np.asarray, params)
    state, metrics = step(state, shard_batch(mesh, batch))
    assert set(metrics) == {"loss_fcos_cls", "loss_fcos_ctr", "loss_fcos_loc"}
    for v in metrics.values():
        assert np.isfinite(float(v))
    # backbone frozen, head moved
    after = state.params
    bb_same = jax.tree.map(
        lambda a, b_: np.allclose(a, np.asarray(b_)),
        before["backbone"], after["backbone"])
    assert all(jax.tree.leaves(bb_same))
    head_kernel = np.asarray(after["fcos_head"]["bbox_pred"]["kernel"])
    assert not np.allclose(head_kernel,
                           np.asarray(before["fcos_head"]["bbox_pred"]["kernel"]))


def test_episodic_step_runs():
    mesh = create_mesh()
    model = _tiny_model()
    n = jax.device_count()
    e, shot, q = n, 2, 1  # one episode per device
    rng = np.random.RandomState(1)
    batch = {
        "support_images": rng.rand(e * shot, *CANVAS, 3).astype(np.float32),
        "support_boxes": np.tile(np.array([[10, 10, 80, 90.0]], np.float32),
                                 (e * shot, 1)),
        "support_box_valid": np.ones((e * shot,), bool),
        "query_images": rng.rand(e * q, *CANVAS, 3).astype(np.float32),
        "query_gt_boxes": np.tile(np.array([[[12, 12, 70, 88.0]]], np.float32),
                                  (e * q, 3, 1)),
        "query_gt_labels": np.stack(
            [np.array([i % 5, 99, 0], np.int32) for i in range(e * q)]),
        "query_gt_valid": np.tile(np.array([[True, True, False]]), (e * q, 1)),
        "episode_class_ids": np.arange(e, dtype=np.int32) % 5,
    }

    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((shot, *CANVAS, 3)), jnp.zeros((shot, 4)),
        jnp.ones((shot,), bool), jnp.zeros((1, *CANVAS, 3)), shot,
        method=MetaOneStageDetector.forward_episodic_train)["params"]
    tx, _ = build_optimizer(params, base_lr=5e-4, warmup_iters=0,
                            clip_grad_norm=1.0,
                            freeze_cfg={"backbone": True, "episodic": True,
                                        "bbox_branch": True})
    state = create_train_state(params, tx, use_ema=True)
    grid = build_location_grid(CANVAS, STRIDES, SOI)
    step = make_episodic_train_step(model, tx, grid, FCOSLossCfg(), mesh,
                                    num_shots=shot)

    state, metrics = step(state, shard_batch(mesh, batch),
                          jax.random.PRNGKey(7))
    assert "loss_fcos_cls" in metrics
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(state.step) == 1
    # EMA tracked
    assert state.ema_params is not None
    # second step reuses the compiled graph
    state, _ = step(state, shard_batch(mesh, batch), jax.random.PRNGKey(8))
    assert int(state.step) == 2


def test_multi_step_scan_matches_sequential():
    """K scanned steps in one dispatch == K sequential dispatches
    (same batches, same per-step RNG keys)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from sylph_tpu.models.meta_arch import MetaOneStageDetector
    from sylph_tpu.ops.fcos_losses import FCOSLossCfg
    from sylph_tpu.ops.locations import build_location_grid
    from sylph_tpu.parallel.mesh import create_mesh, shard_batch
    from sylph_tpu.train.optimizer import build_optimizer
    from sylph_tpu.train.steps import make_episodic_train_step
    from sylph_tpu.train.train_state import create_train_state

    canvas = (128, 128)
    mesh = create_mesh()
    n = mesh.devices.size
    shot, q, k = 1, 1, 2

    model = MetaOneStageDetector(
        depth=18, num_classes=6, num_cls_convs=1, num_box_convs=1,
        compute_dtype=jnp.float32,
        code_generator_kwargs={"tower_layers": (("GN", "ReLU"),)})
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((shot, *canvas, 3)),
        jnp.zeros((shot, 4)), jnp.ones((shot,), bool),
        jnp.zeros((q, *canvas, 3)), shot,
        method=MetaOneStageDetector.forward_episodic_train)["params"]
    tx, _ = build_optimizer(params, base_lr=1e-3, warmup_iters=0)
    grid = build_location_grid(canvas, (8, 16, 32, 64, 128),
                               [64, 128, 256, 512])

    def batch(seed):
        rng = np.random.RandomState(seed)
        e = n
        return {
            "support_images": rng.rand(e * shot, *canvas, 3)
            .astype(np.float32),
            "support_boxes": np.tile(
                np.array([[10, 10, 90, 100.0]], np.float32), (e * shot, 1)),
            "support_box_valid": np.ones((e * shot,), bool),
            "query_images": rng.rand(e * q, *canvas, 3).astype(np.float32),
            "query_gt_boxes": np.tile(
                np.array([[[12, 12, 80, 96.0]]], np.float32), (e * q, 2, 1)),
            "query_gt_labels": np.tile(np.array([[1, 0]], np.int32),
                                       (e * q, 1)),
            "query_gt_valid": np.tile(np.array([[True, False]]), (e * q, 1)),
            "episode_class_ids": (np.arange(e) % 5).astype(np.int32),
        }

    batches = [batch(s) for s in range(k)]
    keys = [jax.random.fold_in(jax.random.PRNGKey(7), i) for i in range(k)]

    # sequential (copy params — the step donates its state buffers)
    step1 = make_episodic_train_step(model, tx, grid, FCOSLossCfg(), mesh,
                                     num_shots=shot)
    s_seq = create_train_state(jax.tree.map(jnp.array, params), tx)
    for b, key in zip(batches, keys):
        s_seq, m_seq = step1(s_seq, shard_batch(mesh, b), key)

    # one scanned dispatch
    from jax.sharding import NamedSharding, PartitionSpec as P
    stepk = make_episodic_train_step(model, tx, grid, FCOSLossCfg(), mesh,
                                     num_shots=shot, steps_per_call=k)
    stacked = jax.tree.map(
        lambda *xs: jax.device_put(np.stack(xs),
                                   NamedSharding(mesh, P(None, "data"))),
        *batches)
    s_scan = create_train_state(jax.tree.map(jnp.array, params), tx)
    s_scan, m_scan = stepk(s_scan, stacked, jnp.stack(keys))

    assert int(np.asarray(s_scan.step)) == k
    for key in m_seq:
        assert m_scan[key].shape[0] == k
        np.testing.assert_allclose(float(m_scan[key][-1]),
                                   float(np.asarray(m_seq[key])), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        s_seq.params, s_scan.params)


def test_pretrain_loss_invariant_to_mesh_size():
    """The psum-based loss normalizers (reference reduce_sum,
    fcos_outputs.py:648-685) must make the reported global loss — and
    the resulting update — identical whether the batch runs on one
    device or sharded 8 ways. Also pins the single-device fast path
    (plain jit, no collectives) against the shard_map path."""
    model = _tiny_model(code_generator_name="none")
    n = jax.device_count()
    b = n
    rng = np.random.RandomState(1)
    images = rng.rand(b, *CANVAS, 3).astype(np.float32)
    gt_boxes = np.tile(np.array([[8, 8, 90, 100.0]], np.float32), (b, 2, 1))
    gt_boxes[:, 1] = np.array([20, 20, 60, 70.0])
    gt_labels = np.tile(np.array([[1, 3]], np.int32), (b, 1))
    gt_valid = np.ones((b, 2), bool)
    # vary per-image box counts so normalizers actually differ per shard
    gt_valid[::2, 1] = False
    batch = {"images": images, "gt_boxes": gt_boxes,
             "gt_labels": gt_labels, "gt_valid": gt_valid}

    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, *CANVAS, 3)))["params"]
    grid = build_location_grid(CANVAS, STRIDES, SOI)

    results = {}
    for name, mesh in (("mesh8", create_mesh(n)), ("mesh1", create_mesh(1))):
        tx, _ = build_optimizer(params, base_lr=0.01, warmup_iters=0)
        state = create_train_state(params, tx)
        step = make_pretrain_train_step(model, tx, grid, FCOSLossCfg(),
                                        mesh)
        state, metrics = step(state, shard_batch(mesh, batch))
        results[name] = (jax.tree.map(np.asarray, metrics),
                         np.asarray(state.params["fcos_head"]["bbox_pred"]
                                    ["kernel"]))

    m8, k8 = results["mesh8"]
    m1, k1 = results["mesh1"]
    for key in m1:
        np.testing.assert_allclose(float(m8[key]), float(m1[key]),
                                   rtol=2e-5, err_msg=key)
    np.testing.assert_allclose(k8, k1, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_grad_accum_matches_full_batch_pretrain():
    """grad_accum=M must reproduce the unaccumulated step exactly:
    normalizers are precomputed cross-micro means, micro grads are
    averaged (train/steps.py _accum_normalizers/_accum_grads)."""
    model = _tiny_model(code_generator_name="none")
    n = 4
    rng = np.random.RandomState(3)
    images = rng.rand(n, *CANVAS, 3).astype(np.float32)
    gt_boxes = np.tile(np.array([[8, 8, 90, 100.0]], np.float32), (n, 2, 1))
    gt_labels = np.tile(np.array([[1, 3]], np.int32), (n, 1))
    gt_valid = np.ones((n, 2), bool)
    gt_valid[::2, 1] = False
    batch = {"images": images, "gt_boxes": gt_boxes,
             "gt_labels": gt_labels, "gt_valid": gt_valid}
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, *CANVAS, 3)))["params"]
    grid = build_location_grid(CANVAS, STRIDES, SOI)
    mesh = create_mesh(1)

    results = {}
    for name, accum in (("full", 1), ("accum", 2)):
        tx, _ = build_optimizer(params, base_lr=0.01, warmup_iters=0)
        state = create_train_state(jax.tree.map(jnp.array, params), tx)
        step = make_pretrain_train_step(model, tx, grid, FCOSLossCfg(),
                                        mesh, grad_accum=accum)
        state, metrics = step(state, shard_batch(mesh, batch))
        s = state.unpack() if hasattr(state, "unpack") else state
        results[name] = (jax.tree.map(np.asarray, metrics), s.params)

    m_f, p_f = results["full"]
    m_a, p_a = results["accum"]
    for k in m_f:
        np.testing.assert_allclose(float(m_a[k]), float(m_f[k]),
                                   rtol=1e-5, err_msg=k)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6), p_f, p_a)


@pytest.mark.slow
def test_grad_accum_matches_mesh_sharding_episodic():
    """Episodic grad_accum=2 on ONE device == the same batch sharded
    over a 2-device mesh: micro-groups are virtual data-parallel ranks
    (per-group episode way + cross-group normalizers), the same
    semantics the reference gets from more DDP GPUs."""
    model = _tiny_model()
    shot, q, e = 1, 1, 2
    rng = np.random.RandomState(5)
    batch = {
        "support_images": rng.rand(e * shot, *CANVAS, 3).astype(np.float32),
        "support_boxes": np.tile(np.array([[10, 10, 90, 100.0]], np.float32),
                                 (e * shot, 1)),
        "support_box_valid": np.ones((e * shot,), bool),
        "query_images": rng.rand(e * q, *CANVAS, 3).astype(np.float32),
        "query_gt_boxes": np.tile(
            np.array([[[12, 12, 80, 96.0]]], np.float32), (e * q, 2, 1)),
        "query_gt_labels": np.tile(np.array([[1, 0]], np.int32), (e * q, 1)),
        "query_gt_valid": np.tile(np.array([[True, False]]), (e * q, 1)),
        "episode_class_ids": np.array([1, 3], np.int32),
    }
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((shot, *CANVAS, 3)),
        jnp.zeros((shot, 4)), jnp.ones((shot,), bool),
        jnp.zeros((q, *CANVAS, 3)), shot,
        method=MetaOneStageDetector.forward_episodic_train)["params"]
    grid = build_location_grid(CANVAS, STRIDES, SOI)
    key = jax.random.PRNGKey(11)

    results = {}
    for name, mesh, accum in (("mesh2", create_mesh(2), 1),
                              ("accum2", create_mesh(1), 2)):
        tx, _ = build_optimizer(params, base_lr=0.01, warmup_iters=0)
        state = create_train_state(jax.tree.map(jnp.array, params), tx)
        step = make_episodic_train_step(model, tx, grid, FCOSLossCfg(),
                                        mesh, num_shots=shot,
                                        grad_accum=accum)
        state, metrics = step(state, shard_batch(mesh, batch), key)
        s = state.unpack() if hasattr(state, "unpack") else state
        results[name] = (jax.tree.map(np.asarray, metrics), s.params)

    m_m, p_m = results["mesh2"]
    m_a, p_a = results["accum2"]
    for k in m_m:
        np.testing.assert_allclose(float(m_a[k]), float(m_m[k]),
                                   rtol=1e-4, err_msg=k)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-6), p_m, p_a)
