"""jitted, mesh-sharded train steps.

One compiled graph per mode — the whole reference hot loop
(SimpleTrainer.run_step + DDP allreduce, SURVEY.md §3.1) becomes a
single ``shard_map``-ped function:

  * batch sharded over the 1-D data mesh, params/state replicated;
  * the episodic step reproduces DDP episode semantics: each shard
    generates codes for its *local* episode classes and conditions its
    query images on exactly those (the reference's per-GPU "way",
    fcos.py:625-667);
  * loss normalizers psum across shards (ops/fcos_losses.py), gradients
    pmean — numerically the reference's reduce_sum + DDP average;
  * query GT is filtered to the episode's classes on-device via an
    isin mask (the reference filters per-image on host,
    meta_one_stage_detector.py:184-224).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.meta_arch import MetaOneStageDetector
from ..ops.assigner import assign_fcos_targets_batch
from ..ops.fcos_losses import (FCOSLossCfg, fcos_episodic_losses,
                               fcos_pretrain_losses)
from ..structures import GTBoxes
from .train_state import TrainState

AXIS = "data"


def _grid_arrays(grid):
    return (jnp.asarray(grid.locations), jnp.asarray(grid.strides),
            jnp.asarray(grid.size_ranges))


def _maybe_scan(local_step, steps_per_call: int, with_rng: bool):
    """Wrap a (state, batch[, rng]) -> (state, metrics) local step into a
    K-step lax.scan over batches stacked on a new leading axis.

    One device dispatch then runs K optimizer steps — amortizing the
    per-launch host overhead that dominates remote-attached TPUs (the
    reference's SimpleTrainer pays one launch per step; XLA runs the
    scanned steps back to back). Metrics come back stacked (K, ...).
    """
    if steps_per_call <= 1:
        return local_step

    if with_rng:
        def multi(state, batches, rngs):
            def body(s, xs):
                b, r = xs
                return local_step(s, b, r)
            return jax.lax.scan(body, state, (batches, rngs))
    else:
        def multi(state, batches):
            return jax.lax.scan(local_step, state, batches)
    return multi


def make_pretrain_train_step(model: MetaOneStageDetector, tx, grid,
                             loss_cfg: FCOSLossCfg, mesh: Mesh,
                             center_sample: bool = True,
                             radius: float = 1.5,
                             steps_per_call: int = 1) -> Callable:
    """Pretraining step. Batch: {images (B,H,W,3), gt_boxes (B,M,4),
    gt_labels (B,M), gt_valid (B,M)} with B divisible by mesh size.
    steps_per_call > 1: batch arrays gain a leading K axis and one call
    runs K scanned steps (metrics stacked (K,))."""
    locations, strides, size_ranges = _grid_arrays(grid)

    def local_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
        def loss_fn(params):
            out = model.apply({"params": params}, batch["images"],
                              method=MetaOneStageDetector.forward_base)
            gt = GTBoxes(batch["gt_boxes"], batch["gt_labels"],
                         batch["gt_valid"])
            targets = assign_fcos_targets_batch(
                locations, strides, size_ranges, gt,
                center_sample=center_sample, radius=radius)
            losses = fcos_pretrain_losses(
                out.logits, out.reg, out.ctrness, out.iou, targets,
                loss_cfg, axis_name=AXIS)
            return sum(losses.values()), losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        grads = jax.lax.pmean(grads, AXIS)
        new_state = state.apply_updates(grads, tx)
        metrics = {k: jax.lax.pmean(v, AXIS) for k, v in losses.items()}
        return new_state, metrics

    fn = _maybe_scan(local_step, steps_per_call, with_rng=False)
    batch_spec = P(None, AXIS) if steps_per_call > 1 else P(AXIS)
    sharded = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(), batch_spec), out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))


def make_episodic_train_step(model: MetaOneStageDetector, tx, grid,
                             loss_cfg: FCOSLossCfg, mesh: Mesh,
                             num_shots: int,
                             center_sample: bool = True,
                             radius: float = 1.5,
                             pretrained_kernel=None,
                             steps_per_call: int = 1) -> Callable:
    """Episodic meta-training step.

    Batch (leading axes divisible by mesh size; E episodes):
      support_images (E*shot, Hs, Ws, 3), support_boxes (E*shot, 4),
      support_box_valid (E*shot,), query_images (E*Q, H, W, 3),
      query_gt_{boxes,labels,valid} (E*Q, M, ...),
      episode_class_ids (E,) int32 contiguous dataset ids.
    """
    locations, strides, size_ranges = _grid_arrays(grid)

    def local_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(AXIS))

        def loss_fn(params):
            out, codes = model.apply(
                {"params": params}, batch["support_images"],
                batch["support_boxes"], batch["support_box_valid"],
                batch["query_images"], num_shots,
                method=MetaOneStageDetector.forward_episodic_train,
                rngs={"dropout": rng})
            episode_ids = batch["episode_class_ids"]  # (E_local,)
            # Filter query GT to the episode classes (reference _get_gt).
            labels = batch["query_gt_labels"]
            in_episode = jnp.any(
                labels[..., None] == episode_ids[None, None, :], axis=-1)
            gt = GTBoxes(batch["query_gt_boxes"], labels,
                         batch["query_gt_valid"] & in_episode)
            targets = assign_fcos_targets_batch(
                locations, strides, size_ranges, gt,
                center_sample=center_sample, radius=radius)
            losses = fcos_episodic_losses(
                out.logits, out.reg, out.ctrness, targets, episode_ids,
                loss_cfg, axis_name=AXIS, class_code=codes,
                pretrained_kernel=pretrained_kernel)
            if "snnl" in codes:
                losses["loss_snnl"] = codes["snnl"]
            return sum(losses.values()), losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        grads = jax.lax.pmean(grads, AXIS)
        new_state = state.apply_updates(grads, tx)
        metrics = {k: jax.lax.pmean(v, AXIS) for k, v in losses.items()}
        return new_state, metrics

    fn = _maybe_scan(local_step, steps_per_call, with_rng=True)
    batch_spec = P(None, AXIS) if steps_per_call > 1 else P(AXIS)
    sharded = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(P(), batch_spec, P()), out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))
