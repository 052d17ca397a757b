"""Packed train-state boundary (train/packing.py).

The step functions ship the TrainState across the dispatch boundary as
one flat buffer per dtype (per-leaf dispatch cost on remote/sharded
runtimes); these tests pin the exact roundtrip and the transparent
TrainState-like accessors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sylph_tpu.train.packing import (PackedState, ensure_packed,
                                     make_pack_spec, pack_state,
                                     unpack_state)
from sylph_tpu.train.train_state import TrainState, create_train_state


def _tree():
    return {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "b": {"c": jnp.asarray(3, jnp.int32),          # scalar leaf
              "d": jnp.ones((4,), jnp.bfloat16)},
        "e": jnp.zeros((2, 2), jnp.float32),
        "f": None,                                      # empty subtree
    }


def test_roundtrip_exact():
    tree = _tree()
    packed = pack_state(tree)
    assert set(packed.bufs) == {"float32", "int32", "bfloat16"}
    assert packed.bufs["float32"].shape == (10,)
    out = unpack_state(packed)
    assert (jax.tree.structure(out) == jax.tree.structure(tree))

    def check(va, vb):
        assert va.dtype == vb.dtype and va.shape == vb.shape
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    jax.tree.map(check, tree, out)


def test_roundtrip_under_jit():
    tree = _tree()
    spec = make_pack_spec(tree)

    @jax.jit
    def bump(packed):
        t = unpack_state(packed)
        t = jax.tree.map(lambda x: x + 1, t)
        return pack_state(t, spec)

    out = unpack_state(bump(pack_state(tree)))
    np.testing.assert_array_equal(np.asarray(out["b"]["c"]), 4)
    np.testing.assert_allclose(np.asarray(out["a"]),
                               np.arange(6).reshape(2, 3) + 1)


def test_trainstate_accessors():
    params = {"w": jnp.ones((3, 2)), "b": jnp.zeros((2,))}
    tx = optax.sgd(0.1, momentum=0.9)
    state = create_train_state(params, tx, use_ema=True)
    packed = ensure_packed(state)
    assert isinstance(packed, PackedState)
    assert ensure_packed(packed) is packed
    assert int(np.asarray(packed.step)) == 0
    np.testing.assert_array_equal(np.asarray(packed.params["w"]),
                                  np.ones((3, 2)))
    assert packed.ema_params is not None
    st = packed.unpack()
    assert isinstance(st, TrainState)
    # spec is static/hashable -> jit caches on it
    assert hash(packed.spec) == hash(make_pack_spec(state))
