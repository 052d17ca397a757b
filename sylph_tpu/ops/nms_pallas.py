"""Pallas TPU kernel for greedy batched NMS.

The XLA formulation (ops/nms.py) runs the select-and-suppress loop as a
``lax.scan`` — ``post_nms_topk`` sequential HLO iterations, each a full
argmax + IoU row over HBM-resident candidate tensors. This kernel keeps
the whole candidate set (K ≤ a few thousand boxes) in VMEM and runs the
entire greedy loop inside one ``pallas_call``:

  * grid = batch; each program owns one image's candidates — the four
    coordinate planes and the score vector are laid out as (1, K) rows
    (lane-major, the layout Mosaic vectorizes best);
  * per step: VPU max/argmax over the alive-score row, winner fields
    via masked reductions (Mosaic has no dynamic scalar gather), one
    broadcast IoU row, suppression mask update — zero HBM traffic until
    the final (max_outputs,) index row is written back;
  * boxes are pre-offset by class (the standard multiclass trick), so
    the kernel itself is class-agnostic.

Semantics identical to ops/nms.py::nms_select (greedy picks in score
order == NMS survivors + global top-k cap, fcos_outputs.py:1010-1028).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e10


def _nms_kernel(x1_ref, y1_ref, x2_ref, y2_ref, scores_ref, valid_ref,
                out_idx_ref, out_ok_ref, *, iou_threshold: float,
                max_outputs: int, k: int):
    x1 = x1_ref[0]            # (1, K) rows in VMEM
    y1 = y1_ref[0]
    x2 = x2_ref[0]
    y2 = y2_ref[0]
    alive = jnp.where(valid_ref[0] != 0, scores_ref[0], NEG_INF)  # (1, K)

    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)
    out_iota = jax.lax.broadcasted_iota(jnp.int32, (1, max_outputs), 1)

    def step(t, carry):
        alive, idx_vec, ok_vec = carry
        best = jnp.max(alive)
        i = jnp.argmax(alive[0]).astype(jnp.int32)
        ok = best > NEG_INF / 2
        sel = iota == i
        pick = lambda v: jnp.max(jnp.where(sel, v, NEG_INF))  # noqa: E731
        bx1, by1 = pick(x1), pick(y1)
        bx2, by2 = pick(x2), pick(y2)
        barea = pick(area)
        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        union = jnp.maximum(area + barea - inter, 1e-9)
        iou = inter / union
        suppress = (iou > iou_threshold) | sel
        slot = out_iota == t
        idx_vec = jnp.where(slot, jnp.where(ok, i, 0), idx_vec)
        ok_vec = jnp.where(slot, jnp.int32(ok), ok_vec)
        alive = jnp.where(ok & suppress, NEG_INF, alive)
        return alive, idx_vec, ok_vec

    idx0 = jnp.zeros((1, max_outputs), jnp.int32)
    ok0 = jnp.zeros((1, max_outputs), jnp.int32)
    _, idx_vec, ok_vec = jax.lax.fori_loop(0, max_outputs, step,
                                           (alive, idx0, ok0))
    out_idx_ref[0] = idx_vec
    out_ok_ref[0] = ok_vec


@partial(jax.jit, static_argnames=("iou_threshold", "max_outputs"))
def batched_nms_pallas(boxes: jnp.ndarray, scores: jnp.ndarray,
                       valid: jnp.ndarray, iou_threshold: float,
                       max_outputs: int):
    """Greedy NMS per batch item, one pallas program per image.

    boxes (B, K, 4) — already class-offset for multiclass behavior;
    scores (B, K); valid (B, K) bool.
    Returns (idx (B, max_outputs) int32, ok (B, max_outputs) bool).
    """
    b, k, _ = boxes.shape
    kernel = partial(_nms_kernel, iou_threshold=iou_threshold,
                     max_outputs=max_outputs, k=k)
    row = lambda x: x.astype(jnp.float32)[:, None, :]       # noqa: E731
    plane_spec = pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, max_outputs), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    idx, ok = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[plane_spec] * 6,
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, max_outputs), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, max_outputs), jnp.int32),
        ],
    )(row(boxes[..., 0]), row(boxes[..., 1]), row(boxes[..., 2]),
      row(boxes[..., 3]), row(scores),
      valid.astype(jnp.int32)[:, None, :])
    return idx[:, 0, :], ok[:, 0, :].astype(bool)
