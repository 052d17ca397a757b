"""Checkpoint round-trip, filtering, merging, code-bank, code gather."""

import jax
import jax.numpy as jnp
import numpy as np

from sylph_tpu.train.checkpoint import (CheckpointManager,
                                        filter_params_by_module,
                                        load_code_bank, merge_params,
                                        save_code_bank)
from sylph_tpu.train.optimizer import build_optimizer
from sylph_tpu.train.train_state import create_train_state


def _toy_params(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "backbone": {"conv": {"kernel": rng.randn(3, 3, 4, 8)
                              .astype(np.float32)}},
        "fcos_head": {"cls_logits": {
            "kernel": rng.randn(1, 1, 8, 5).astype(np.float32),
            "bias": rng.randn(5).astype(np.float32)}},
    }


def test_checkpoint_roundtrip(tmp_path):
    params = jax.tree.map(jnp.asarray, _toy_params())
    tx, _ = build_optimizer(params, base_lr=0.1, warmup_iters=0)
    state = create_train_state(params, tx, use_ema=True)
    # advance one step so opt_state is non-trivial
    grads = jax.tree.map(jnp.ones_like, params)
    state = state.apply_updates(grads, tx)

    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    mngr.save(1, state)
    assert mngr.latest_step() == 1

    fresh = create_train_state(params, tx, use_ema=True)
    restored, step = mngr.restore(fresh)
    assert step == 1
    assert int(np.asarray(restored.step)) == 1
    np.testing.assert_allclose(
        np.asarray(restored.params["backbone"]["conv"]["kernel"]),
        np.asarray(state.params["backbone"]["conv"]["kernel"]))
    np.testing.assert_allclose(
        np.asarray(restored.ema_params["fcos_head"]["cls_logits"]["bias"]),
        np.asarray(state.ema_params["fcos_head"]["cls_logits"]["bias"]))


def test_filter_and_merge():
    params = _toy_params()
    filtered = filter_params_by_module(params, ["fcos_head/cls_logits"])
    assert "cls_logits" not in filtered.get("fcos_head", {})
    assert "backbone" in filtered

    init = _toy_params(seed=1)
    merged = merge_params(init, filtered)
    # backbone overlaid, cls_logits kept from init
    np.testing.assert_allclose(merged["backbone"]["conv"]["kernel"],
                               params["backbone"]["conv"]["kernel"])
    np.testing.assert_allclose(merged["fcos_head"]["cls_logits"]["bias"],
                               init["fcos_head"]["cls_logits"]["bias"])


def test_code_bank_roundtrip(tmp_path):
    bank = {"cls_conv": np.random.rand(7, 256).astype(np.float32),
            "cls_bias": np.random.rand(7).astype(np.float32)}
    path = str(tmp_path / "bank.npz")
    save_code_bank(path, bank, class_names=[f"c{i}" for i in range(7)])
    loaded = load_code_bank(path)
    np.testing.assert_allclose(loaded["cls_conv"], bank["cls_conv"])
    assert list(loaded["class_names"]) == [f"c{i}" for i in range(7)]


def test_gather_class_codes_over_mesh():
    """Class-axis eval parallelism: per-shard codes all_gather into the
    identical global bank (replaces all_gather_object,
    meta_fcos_runner.py:386-391)."""
    from jax.sharding import PartitionSpec as P
    from sylph_tpu.parallel.mesh import create_mesh, gather_class_codes

    mesh = create_mesh()
    n = jax.device_count()
    per = 2  # classes per device
    conv = np.arange(n * per * 4, dtype=np.float32).reshape(n * per, 4)
    bias = np.arange(n * per, dtype=np.float32)

    def shard_fn(c, b):
        return gather_class_codes({"cls_conv": c, "cls_bias": b})

    out = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=P(), check_vma=False))(conv, bias)
    np.testing.assert_allclose(np.asarray(out["cls_conv"]), conv)
    np.testing.assert_allclose(np.asarray(out["cls_bias"]), bias)


def test_merge_params_skips_shape_mismatch(caplog):
    """TFA surgical loading: a C_base-class cls_logits in the checkpoint
    must not abort the load of a NUM_CLASSES head — the mismatched leaf
    is skipped (then patched by _preload_cls_logits)."""
    init = _toy_params(seed=1)
    loaded = _toy_params(seed=0)
    loaded["fcos_head"]["cls_logits"]["kernel"] = \
        np.random.randn(1, 1, 8, 3).astype(np.float32)  # 3 != 5 classes
    merged = merge_params(init, loaded)
    # mismatched leaf keeps the init
    np.testing.assert_allclose(merged["fcos_head"]["cls_logits"]["kernel"],
                               init["fcos_head"]["cls_logits"]["kernel"])
    # matching leaves still overlaid
    np.testing.assert_allclose(merged["backbone"]["conv"]["kernel"],
                               loaded["backbone"]["conv"]["kernel"])


def test_merge_params_refuses_mostly_mismatched():
    """A checkpoint whose leaves MOSTLY mismatch the model (wrong
    architecture) must raise instead of silently loading random init
    with per-leaf warnings."""
    import pytest

    init = {"m": {f"w{i}": np.zeros((4, 4), np.float32)
                  for i in range(10)}}
    wrong = {"m": {f"w{i}": np.zeros((8, 8), np.float32)
                   for i in range(10)}}
    with pytest.raises(ValueError, match="wrong checkpoint"):
        merge_params(init, wrong)
    # a minority of mismatches (TFA surgical case) still merges fine
    mostly_ok = {"m": dict(init["m"], w0=np.zeros((8, 8), np.float32))}
    merged = merge_params(init, mostly_ok)
    assert merged["m"]["w0"].shape == (4, 4)
