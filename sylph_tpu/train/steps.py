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
from ..ops.image_aug import rand_augment_device
from ..ops.assigner import (assign_fcos_targets_batch,
                            compute_ctrness_targets)
from ..ops.fcos_losses import (FCOSLossCfg, fcos_episodic_losses,
                               fcos_pretrain_losses)
from ..structures import GTBoxes
from .packing import ensure_packed, pack_state, unpack_state
from .train_state import TrainState

AXIS = "data"


def _accum_normalizers(targets, axis: Optional[str], m: int):
    """Cross-(virtual-)device loss normalizers for gradient accumulation.

    Accumulation treats the m micro-batches as m extra data-parallel
    ranks: the reference reduce_sum normalizer becomes the mean of
    per-micro positive counts across all micros on all devices — i.e.
    (local sum / m) pmean'd over the real mesh axis. Each micro loss is
    divided by this shared value and the per-micro gradients are
    AVERAGED — exact virtual-rank semantics (grad_accum=m on d devices
    == the same batch on m*d devices), which is also identical to the
    unaccumulated step except in degenerate batches with fewer than
    m * n_devices positive locations, where the per-rank clamps engage
    (the reference's multi-GPU math has the same world-size floor).
    Normalizers are pure functions of the targets, so they are computed
    once outside the scan."""
    pos = targets.labels >= 0
    posf = pos.astype(jnp.float32)
    ctr_t = jnp.where(pos, compute_ctrness_targets(targets.reg_targets),
                      0.0)
    # Clamp AFTER dividing by m: a micro-group is a virtual rank, so the
    # per-rank floor of 1 positive applies per micro — the reference's
    # effective floor is likewise world_size positives across the whole
    # batch (each rank divides by max(total/W, 1) and DDP averages W
    # rank gradients). Matches the unaccumulated step whenever the
    # batch has >= m * n_devices positive locations (always, outside
    # degenerate nearly-empty batches).
    num_pos_avg = jnp.maximum(_pmean(jnp.sum(posf) / m, axis), 1.0)
    loss_denorm = jnp.maximum(_pmean(jnp.sum(ctr_t) / m, axis), 1e-6)
    return num_pos_avg, loss_denorm


def _accum_grads(loss_fn_at, params, xs, m: int):
    """Average value_and_grad(loss_fn_at(xs_i)) over a lax.scan — one
    micro-batch of activations live at a time (the memory trade that
    lets a 48-episode reference batch fit one chip)."""
    _, losses_shape = jax.eval_shape(
        lambda p: loss_fn_at(jax.tree.map(lambda x: x[0], xs))(p), params)
    zeros_l = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                           losses_shape)
    zeros_g = jax.tree.map(jnp.zeros_like, params)

    def body(carry, xs_i):
        acc_l, acc_g = carry
        (_, losses), grads = jax.value_and_grad(
            loss_fn_at(xs_i), has_aux=True)(params)
        return (jax.tree.map(jnp.add, acc_l, losses),
                jax.tree.map(jnp.add, acc_g, grads)), None

    (losses, grads), _ = jax.lax.scan(body, (zeros_l, zeros_g), xs)
    scale = 1.0 / m
    return (jax.tree.map(lambda x: x * scale, losses),
            jax.tree.map(lambda x: x * scale, grads))


def _apply_device_aug(batch, img_key: str, ops_key: str, params_key: str,
                      sizes_key: str):
    """Apply device-side RandAugment when the loader shipped drawn op
    ids (INPUT.RAND_AUGMENT + TPU.DEVICE_RANDAUG): raw uint8 canvases
    transform on-chip instead of costing host CPU (ops/image_aug.py).
    Canvases are INPUT.FORMAT=BGR — the mapper guards the device mode
    to that format."""
    if ops_key not in batch:
        return batch
    batch = dict(batch)
    batch[img_key] = rand_augment_device(
        batch[img_key], batch.pop(ops_key), batch.pop(params_key),
        batch.pop(sizes_key), bgr=True)
    return batch


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
    # AOT handle for introspection (utils/profiling.py::memory_report):
    # `stepper.lower(state, ...)` → jax.stages.Lowered whose
    # .compile().memory_analysis() is XLA's exact HBM accounting for
    # the step executable (args + outputs + temps + code).
    stepper.lower = lambda state, *a: jpacked.lower(
        ensure_packed(state), *a)
    return stepper


def make_pretrain_train_step(model: MetaOneStageDetector, tx, grid,
                             loss_cfg: FCOSLossCfg, mesh: Mesh,
                             center_sample: bool = True,
                             radius: float = 1.5,
                             steps_per_call: int = 1,
                             grad_accum: int = 1) -> Callable:
    """Pretraining step. Batch: {images (B,H,W,3), gt_boxes (B,M,4),
    gt_labels (B,M), gt_valid (B,M)} with B divisible by mesh size.
    steps_per_call > 1: batch arrays gain a leading K axis and one call
    runs K scanned steps (metrics stacked (K,)). grad_accum > 1: each
    device's batch is split into that many micro-batches scanned inside
    the step — exact virtual-rank (reference multi-GPU) semantics, and
    identical to the unaccumulated step outside degenerate nearly-empty
    batches (see _accum_normalizers) at 1/grad_accum the activation
    memory."""
    locations, strides, size_ranges = _grid_arrays(grid)

    def make_local_step(axis: Optional[str]):
        def local_step(state: TrainState, batch: Dict[str, jnp.ndarray]):
            batch = _apply_device_aug(batch, "images", "aug_ops",
                                      "aug_params", "image_sizes")
            gt = GTBoxes(batch["gt_boxes"], batch["gt_labels"],
                         batch["gt_valid"])

            if grad_accum <= 1:
                targets = assign_fcos_targets_batch(
                    locations, strides, size_ranges, gt,
                    center_sample=center_sample, radius=radius)

                def loss_fn(params):
                    out = model.apply(
                        {"params": params}, batch["images"],
                        method=MetaOneStageDetector.forward_base)
                    losses = fcos_pretrain_losses(
                        out.logits, out.reg, out.ctrness, out.iou,
                        targets, loss_cfg, axis_name=axis)
                    return sum(losses.values()), losses

                (_, losses), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
            else:
                m = grad_accum

                def micro(x):
                    return x.reshape(m, x.shape[0] // m, *x.shape[1:])

                # Assign targets per micro-group under lax.map: the
                # assigner's pairwise (B, K_locations, M_gt, 4)
                # intermediate is 148 GB at the reference pretrain
                # shape (batch 128, 1024² canvas, M=100) if built for
                # the whole batch — per micro it is B/m of that, and
                # only the compact (labels, reg_targets) output is
                # kept stacked. Results are identical (the assigner is
                # per-image math).
                targets_m = jax.lax.map(
                    lambda g: assign_fcos_targets_batch(
                        locations, strides, size_ranges, g,
                        center_sample=center_sample, radius=radius),
                    jax.tree.map(micro, gt))
                npa, ld = _accum_normalizers(targets_m, axis, m)

                # targets are small — thread them through scan xs; the
                # image tensor is NOT: reshaping (B,H,W,3) u8 into a
                # scan operand makes XLA materialize it in a tiled
                # layout that lane-pads C=3 -> 128 (42.7x — a batch-128
                # 1024^2 canvas "grew" to 16 GB and OOM'd a v5e).
                # Scanning an index and dynamic-slicing the captured
                # batch keeps the full tensor in its compact argument
                # layout; only one micro-batch is ever relaid out.
                mb = batch["images"].shape[0] // m
                xs = (jnp.arange(m), targets_m)

                def loss_fn_at(xs_i):
                    gi, tg = xs_i
                    imgs = jax.lax.dynamic_slice_in_dim(
                        batch["images"], gi * mb, mb, axis=0)

                    def loss_fn(params):
                        out = model.apply(
                            {"params": params}, imgs,
                            method=MetaOneStageDetector.forward_base)
                        losses = fcos_pretrain_losses(
                            out.logits, out.reg, out.ctrness, out.iou,
                            tg, loss_cfg, axis_name=None,
                            num_pos_avg=npa, loss_denorm=ld)
                        return sum(losses.values()), losses
                    return loss_fn

                losses, grads = _accum_grads(loss_fn_at, state.params,
                                             xs, m)

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
                             steps_per_call: int = 1,
                             grad_accum: int = 1) -> Callable:
    """Episodic meta-training step.

    Batch (leading axes divisible by mesh size; E episodes):
      support_images (E*shot, Hs, Ws, 3), support_boxes (E*shot, 4),
      support_box_valid (E*shot,), query_images (E*Q, H, W, 3),
      query_gt_{boxes,labels,valid} (E*Q, M, ...),
      episode_class_ids (E,) int32 contiguous dataset ids.

    grad_accum > 1 splits each device's E episodes into grad_accum
    micro-groups scanned inside the step. A micro-group behaves exactly
    like an extra data-parallel rank: its queries are conditioned on
    (and its GT filtered to) only its OWN episode classes, and the loss
    normalizers are the cross-micro means — the same semantics the
    reference gets from more DDP GPUs (fcos.py:625-667 per-GPU "way").
    """
    locations, strides, size_ranges = _grid_arrays(grid)

    def make_local_step(axis: Optional[str]):
        def local_step(state: TrainState, batch, rng):
            batch = _apply_device_aug(batch, "query_images",
                                      "query_aug_ops", "query_aug_params",
                                      "query_image_sizes")
            if axis:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

            if grad_accum <= 1:
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
                        out.logits, out.reg, out.ctrness, targets,
                        episode_ids, loss_cfg, axis_name=axis,
                        class_code=codes,
                        pretrained_kernel=pretrained_kernel)
                    if "snnl" in codes:
                        losses["loss_snnl"] = codes["snnl"]
                    return sum(losses.values()), losses

                (_, losses), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
            else:
                m = grad_accum
                ids = batch["episode_class_ids"]
                ids_m = ids.reshape(m, -1)                   # (m, E/m)
                labels = batch["query_gt_labels"]            # (Bq, M)
                bq, mx = labels.shape
                # per-micro GT filtering: group g's queries see only
                # group g's episode classes (virtual-rank semantics)
                lab_m = labels.reshape(m, bq // m, mx)
                in_ep = jnp.any(
                    lab_m[..., None] == ids_m[:, None, None, :],
                    axis=-1).reshape(bq, mx)
                gt = GTBoxes(batch["query_gt_boxes"], labels,
                             batch["query_gt_valid"] & in_ep)

                def micro(x):
                    return x.reshape(m, x.shape[0] // m, *x.shape[1:])

                # per-micro target assignment under lax.map — the
                # assigner's pairwise (B, K, M, 4) intermediate scales
                # with the FULL batch if assigned in one shot (148 GB
                # at the batch-128 pretrain shape); chunking keeps only
                # the compact stacked outputs (see the pretrain step)
                targets_m = jax.lax.map(
                    lambda g: assign_fcos_targets_batch(
                        locations, strides, size_ranges, g,
                        center_sample=center_sample, radius=radius),
                    jax.tree.map(micro, gt))
                npa, ld = _accum_normalizers(targets_m, axis, m)

                # images cross into the scan by index + dynamic_slice,
                # NOT as scan xs: a big (B,H,W,3) u8 scan operand can be
                # materialized in a lane-padded tiled layout (C=3 -> 128,
                # a 42.7x copy that OOM'd the pretrain step); slicing
                # the captured batch keeps its compact argument layout.
                smb = batch["support_images"].shape[0] // m
                qmb = batch["query_images"].shape[0] // m
                xs = ((micro(batch["support_boxes"]),
                       micro(batch["support_box_valid"]),
                       targets_m, ids_m,
                       jnp.arange(m)))

                def loss_fn_at(xs_i):
                    sb, sv, tg, eids, gi = xs_i
                    sup = jax.lax.dynamic_slice_in_dim(
                        batch["support_images"], gi * smb, smb, axis=0)
                    q = jax.lax.dynamic_slice_in_dim(
                        batch["query_images"], gi * qmb, qmb, axis=0)

                    def loss_fn(params):
                        out, codes = model.apply(
                            {"params": params}, sup, sb, sv, q, num_shots,
                            method=(MetaOneStageDetector
                                    .forward_episodic_train),
                            rngs={"dropout": jax.random.fold_in(rng, gi)})
                        losses = fcos_episodic_losses(
                            out.logits, out.reg, out.ctrness, tg, eids,
                            loss_cfg, axis_name=None, class_code=codes,
                            pretrained_kernel=pretrained_kernel,
                            num_pos_avg=npa, loss_denorm=ld)
                        if "snnl" in codes:
                            losses["loss_snnl"] = codes["snnl"]
                        return sum(losses.values()), losses
                    return loss_fn

                losses, grads = _accum_grads(loss_fn_at, state.params,
                                             xs, m)

            grads = _pmean(grads, axis)
            new_state = state.apply_updates(grads, tx)
            metrics = {k: _pmean(v, axis) for k, v in losses.items()}
            return new_state, metrics
        return local_step

    return finalize_step(make_local_step, mesh, with_rng=True,
                         steps_per_call=steps_per_call)
