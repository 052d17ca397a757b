"""TFA-specific features: cosine classifier head, cls-logits surgery."""

import jax
import jax.numpy as jnp
import numpy as np

from sylph_tpu.models.fcos_head import FCOSHead


def _levels(b=1, c=32):
    return [jnp.zeros((b, 16 // (2 ** i) or 1, 16 // (2 ** i) or 1, c),
                      jnp.float32) for i in range(5)]


def test_cosine_head_scale_invariance():
    """Cosine logits must be invariant to scaling the classifier weight."""
    head = FCOSHead(num_classes=4, num_cls_convs=1, num_box_convs=1,
                    l2_norm_cls_weight=True, compute_dtype=jnp.float32)
    feats = [jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 32)
                         .astype(np.float32))] + _levels()[1:]
    variables = head.init(jax.random.PRNGKey(0), feats)
    # use O(1) weights so the GN eps is negligible (at the 0.01-std init
    # the eps term breaks exact invariance — true of torch GN as well)
    p = jax.tree.map(lambda x: x, variables["params"])
    p["cosine_weight"] = jax.random.normal(jax.random.PRNGKey(3),
                                           p["cosine_weight"].shape)
    out1 = head.apply({"params": p}, feats)
    # scale the raw weight 10x — GN+L2 normalization cancels it
    p2 = dict(p)
    p2["cosine_weight"] = p["cosine_weight"] * 10.0
    out2 = head.apply({"params": p2}, feats)
    np.testing.assert_allclose(np.asarray(out1.logits),
                               np.asarray(out2.logits), rtol=1e-4,
                               atol=1e-4)
    # and no plain cls_logits params were created
    assert "cls_logits" not in variables["params"]


def test_cosine_head_bounded_logits():
    head = FCOSHead(num_classes=4, num_cls_convs=1, num_box_convs=1,
                    l2_norm_cls_weight=True, compute_dtype=jnp.float32)
    feats = [jnp.asarray(np.random.RandomState(1).randn(1, 8, 8, 32)
                         .astype(np.float32) * 100)] + _levels()[1:]
    variables = head.init(jax.random.PRNGKey(0), feats)
    out = head.apply(variables, feats)
    # logits = exp(0) * cos * |feat| is finite; prior bias present
    assert np.isfinite(np.asarray(out.logits)).all()
