"""jitted, mesh-sharded train steps.

One compiled graph per mode — the whole reference hot loop
(SimpleTrainer.run_step + DDP allreduce, SURVEY.md §3.1) becomes a
single jitted function:

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

Two dispatch-level optimizations (both exact):

  * **single-device fast path** — on a 1-chip mesh the shard_map wrapper
    and collectives are identity; skipping them avoids the sharded
    dispatch machinery entirely;
  * **packed state boundary** (train/packing.py) — the TrainState
    crosses the dispatch boundary as one flat buffer per dtype instead
    of ~900 leaves, eliminating a per-leaf host cost that dominated the
    step wall-clock on remote-attached chips. Step functions accept a
    TrainState or PackedState and return a PackedState; host code reads
    ``state.params`` etc. transparently.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.meta_arch import MetaOneStageDetector
from ..ops.assigner import assign_fcos_targets_batch
from ..ops.fcos_losses import (FCOSLossCfg, fcos_episodic_losses,
                               fcos_pretrain_losses)
from ..structures import GTBoxes
from .packing import ensure_packed, pack_state, unpack_state
from .train_state import TrainState

AXIS = "data"


def _grid_arrays(grid):
    return (jnp.asarray(grid.locations), jnp.asarray(grid.strides),
            jnp.asarray(grid.size_ranges))


def _pmean(x, axis: Optional[str]):
    return jax.lax.pmean(x, axis) if axis else x


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


def finalize_step(make_local_step: Callable[[Optional[str]], Callable],
                  mesh: Optional[Mesh], with_rng: bool,
                  steps_per_call: int = 1) -> Callable:
    """Build the dispatchable step from an axis-parametrized local step.

    ``make_local_step(axis)`` returns ``(state, batch[, rng]) ->
    (state, metrics)`` using collectives over ``axis`` (None = no
    collectives). On a multi-device mesh the local step runs under
    shard_map (batch sharded, state replicated); on one device it runs
    plain. Either way the state crosses the jit boundary packed.
    """
    n = mesh.size if mesh is not None else 1
    axis = AXIS if n > 1 else None
    fn = _maybe_scan(make_local_step(axis), steps_per_call, with_rng)
    if n > 1:
        batch_spec = P(None, AXIS) if steps_per_call > 1 else P(AXIS)
        in_specs = ((P(), batch_spec, P()) if with_rng
                    else (P(), batch_spec))
        fn = jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                           out_specs=(P(), P()), check_vma=False)

    if with_rng:
        def packed(ps, batch, rng):
            st, metrics = fn(unpack_state(ps), batch, rng)
            return pack_state(st, ps.spec), metrics
    else:
        def packed(ps, batch):
            st, metrics = fn(unpack_state(ps), batch)
            return pack_state(st, ps.spec), metrics
    jpacked = jax.jit(packed, donate_argnums=(0,))

    if with_rng:
        def stepper(state, batch, rng):
            return jpacked(ensure_packed(state), batch, rng)
    else:
        def stepper(state, batch):
            return jpacked(ensure_packed(state), batch)
    return stepper


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

    def make_local_step(axis: Optional[str]):
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
                    loss_cfg, axis_name=axis)
                return sum(losses.values()), losses

            (_, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            grads = _pmean(grads, axis)
            new_state = state.apply_updates(grads, tx)
            metrics = {k: _pmean(v, axis) for k, v in losses.items()}
            return new_state, metrics
        return local_step

    return finalize_step(make_local_step, mesh, with_rng=False,
                         steps_per_call=steps_per_call)


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

    def make_local_step(axis: Optional[str]):
        def local_step(state: TrainState, batch, rng):
            if axis:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

            def loss_fn(params):
                out, codes = model.apply(
                    {"params": params}, batch["support_images"],
                    batch["support_boxes"], batch["support_box_valid"],
                    batch["query_images"], num_shots,
                    method=MetaOneStageDetector.forward_episodic_train,
                    rngs={"dropout": rng})
                episode_ids = batch["episode_class_ids"]  # (E_local,)
                # Filter query GT to the episode classes (reference
                # _get_gt).
                labels = batch["query_gt_labels"]
                in_episode = jnp.any(
                    labels[..., None] == episode_ids[None, None, :],
                    axis=-1)
                gt = GTBoxes(batch["query_gt_boxes"], labels,
                             batch["query_gt_valid"] & in_episode)
                targets = assign_fcos_targets_batch(
                    locations, strides, size_ranges, gt,
                    center_sample=center_sample, radius=radius)
                losses = fcos_episodic_losses(
                    out.logits, out.reg, out.ctrness, targets, episode_ids,
                    loss_cfg, axis_name=axis, class_code=codes,
                    pretrained_kernel=pretrained_kernel)
                if "snnl" in codes:
                    losses["loss_snnl"] = codes["snnl"]
                return sum(losses.values()), losses

            (_, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            grads = _pmean(grads, axis)
            new_state = state.apply_updates(grads, tx)
            metrics = {k: _pmean(v, axis) for k, v in losses.items()}
            return new_state, metrics
        return local_step

    return finalize_step(make_local_step, mesh, with_rng=True,
                         steps_per_call=steps_per_call)
