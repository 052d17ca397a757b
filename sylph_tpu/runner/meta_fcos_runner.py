"""MetaFCOS runner: pretrain + episodic meta-train + meta-test.

TPU-native counterpart of the reference runner layer
(sylph/runner/meta_fcos_runner.py):

  * ``get_default_cfg`` — the composed config tree (config/defaults.py
    already merges the d2go/adet/sylph key families, reference
    default_configs.py + adet_configs.py);
  * ``build_model`` — MetaOneStageDetector from cfg, params initialized
    for the mode implied by EPISODIC_LEARNING, with MODEL.WEIGHTS
    loading (orbax / npz / converted torch) and
    WEIGHTS_FILTER_BY_MODULE filtering (:232-288);
  * ``do_train`` — dispatch on EPISODIC_LEARNING (:441-449): the
    d2go SimpleTrainer + hooks assembly (:290-379) becomes a jitted
    shard_map step + host loop with checkpoint/metrics/abnormal-loss
    hooks;
  * ``do_test`` — the two-phase meta-test with REPEAT_TEST aggregation
    (:451-672) via evaluation.MetaTestDriver;
  * ``get_evaluator`` — dispatch on dataset/evaluator type (:116-149).

Variants: MetaFCOSROIEncoderRunner (ROIEncoder code generator,
meta_fcos_roi_encoder_runner.py:24-37) and TFAFewShotDetectionRunner
(finetune baseline through the pretraining path, tfa_runner.py:23-39).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CfgNode, get_default_cfg
from ..data.catalog import DatasetCatalog, MetadataCatalog
from ..data.loader import build_episodic_train_loader
from ..data.mapper import EpisodicMapper
from ..data.meta_dataset import MetaDataset
from ..evaluation.evaluators import (AREvaluator, COCOMetaEvaluator,
                                     COCOOWDEvaluator, FewshotLVISEvaluator)
from ..evaluation.meta_eval import MetaTestDriver
from ..models.meta_arch import MetaOneStageDetector
from ..ops.decode import DecodeCfg
from ..ops.fcos_losses import FCOSLossCfg
from ..ops.locations import build_location_grid
from ..parallel.mesh import create_mesh, shard_batch
from ..train.checkpoint import (CheckpointManager, filter_params_by_module,
                                merge_params)
from ..train.optimizer import build_optimizer
from ..train.steps import (make_episodic_train_step,
                           make_pretrain_train_step)
from ..train.train_state import create_train_state
from ..utils.precision import eval_resident_params
from ..utils.events import (AbnormalLossChecker, MetricsWriter,
                            write_eval_results_tb)


def _codegen_kwargs(cfg) -> Dict:
    cg = cfg.MODEL.META_LEARN.CODE_GENERATOR
    if cg.NAME == "ROIEncoder":
        return dict(
            pooler_resolution=cg.ROI_BOX.POOLER_RESOLUTION,
            tokenizer_num_conv=cg.TOKENIZER.NUM_CONV,
            tokenizer_conv_dim=cg.TOKENIZER.CONV_DIM,
            tokenizer_norm=cg.TOKENIZER.NORM,
            tokenizer_num_fc=cg.TOKENIZER.NUM_FC,
            tokenizer_fc_dim=cg.TOKENIZER.FC_DIM,
            transformer_layers=cg.TRANSFORMER_ENCODER.LAYERS,
            transformer_heads=cg.TRANSFORMER_ENCODER.HEADS,
            transformer_dropout=cg.TRANSFORMER_ENCODER.DROPOUT,
            head_num_fc=cg.HEAD.NUM_FC, head_fc_dim=cg.HEAD.FC_DIM,
            head_output_dim=cg.HEAD.OUTPUT_DIM)
    return dict(
        pooler_resolution=cg.ROI_BOX.POOLER_RESOLUTION,
        out_channel=cg.OUT_CHANNEL,
        tower_layers=tuple(tuple(t) for t in cg.TOWER_LAYERS),
        cls_layer=tuple(cg.CLS_LAYER), bias_layer=tuple(cg.BIAS_LAYER),
        weight_layer=tuple(cg.WEIGHT_LAYER),
        scale_layer=tuple(cg.SCALE_LAYER), use_bias=cg.USE_BIAS,
        conv_l2_norm=cg.CONV_L2_NORM, bias_l2_norm=cg.BIAS_L2_NORM,
        post_norm=cg.POST_NORM, use_weight_scale=cg.USE_WEIGHT_SCALE,
        compress_code_w_max=cg.COMPRESS_CODE_W_MAX,
        meta_bias=cg.META_BIAS, contrastive_loss=cg.CONTRASTIVE_LOSS)


def build_model_from_cfg(cfg) -> MetaOneStageDetector:
    episodic = cfg.MODEL.META_LEARN.EPISODIC_LEARNING
    dtype = (jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16"
             else jnp.float32)
    return MetaOneStageDetector(
        depth=cfg.MODEL.RESNETS.DEPTH,
        backbone_out_features=tuple(cfg.MODEL.FPN.IN_FEATURES),
        fpn_out_channels=cfg.MODEL.FPN.OUT_CHANNELS,
        fpn_top_levels=cfg.MODEL.FPN.TOP_LEVELS,
        num_classes=cfg.MODEL.FCOS.NUM_CLASSES,
        num_cls_convs=cfg.MODEL.FCOS.NUM_CLS_CONVS,
        num_box_convs=cfg.MODEL.FCOS.NUM_BOX_CONVS,
        num_share_convs=cfg.MODEL.FCOS.NUM_SHARE_CONVS,
        fcos_norm=cfg.MODEL.FCOS.NORM,
        use_scale=cfg.MODEL.FCOS.USE_SCALE,
        prior_prob=cfg.MODEL.FCOS.PRIOR_PROB,
        cls_kernel_size=cfg.MODEL.FCOS.CLS_LOGITS_KERNEL_SIZE,
        l2_norm_cls_weight=cfg.MODEL.FCOS.L2_NORM_CLS_WEIGHT,
        use_deformable=cfg.MODEL.FCOS.USE_DEFORMABLE,
        fpn_strides=tuple(cfg.MODEL.FCOS.FPN_STRIDES),
        code_generator_name=(cfg.MODEL.META_LEARN.CODE_GENERATOR.NAME
                             if episodic else "none"),
        code_generator_kwargs=_codegen_kwargs(cfg) if episodic else None,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        remat_backbone=cfg.TPU.REMAT_BACKBONE,
        stop_backbone_grad=cfg.MODEL.BACKBONE.FREEZE,
        s2d_stem=cfg.TPU.S2D_STEM,
        compute_dtype=dtype)


def _freeze_cfg(cfg) -> Dict:
    pg = cfg.MODEL.PROPOSAL_GENERATOR
    return {
        "backbone": cfg.MODEL.BACKBONE.FREEZE,
        "backbone_exclude": list(cfg.MODEL.BACKBONE.FREEZE_EXCLUDE),
        "proposal_generator": pg.FREEZE,
        "cls_tower": pg.FREEZE_CLS_TOWER,
        "cls_logits": pg.FREEZE_CLS_LOGITS,
        "bbox_branch": pg.FREEZE_BBOX_BRANCH,
        "bbox_tower": pg.FREEZE_BBOX_TOWER,
        "owd": pg.OWD,
        "code_generator": cfg.MODEL.META_LEARN.CODE_GENERATOR.FREEZE,
        "episodic": cfg.MODEL.META_LEARN.EPISODIC_LEARNING,
        "roi_heads": ("ROI_HEADS" in cfg.MODEL
                      and cfg.MODEL.ROI_HEADS.get("FREEZE", False)),
        "roi_heads_feat": ("ROI_HEADS" in cfg.MODEL
                           and cfg.MODEL.ROI_HEADS.get("FREEZE_FEAT",
                                                       False)),
    }


def _loss_cfg(cfg) -> FCOSLossCfg:
    pg = cfg.MODEL.PROPOSAL_GENERATOR
    return FCOSLossCfg(
        focal_alpha=cfg.MODEL.FCOS.LOSS_ALPHA,
        focal_gamma=cfg.MODEL.FCOS.LOSS_GAMMA,
        loc_loss_type=cfg.MODEL.FCOS.LOC_LOSS_TYPE,
        box_quality=tuple(sorted(cfg.MODEL.FCOS.BOX_QUALITY)),
        iou_mask=cfg.MODEL.FCOS.IOU_MASK,
        owd=pg.OWD,
        freeze_cls_logits=pg.FREEZE_CLS_LOGITS,
        box_branch_loss_on=not (pg.FREEZE_BBOX_BRANCH or pg.FREEZE),
        distill_weight=cfg.MODEL.META_LEARN.CODE_GENERATOR
        .DISTILLATION_LOSS_WEIGHT,
    )


def _decode_cfg(cfg, train: bool = False) -> DecodeCfg:
    f = cfg.MODEL.FCOS
    return DecodeCfg(
        pre_nms_thresh=(f.INFERENCE_TH_TRAIN if train else
                        f.INFERENCE_TH_TEST),
        pre_nms_topk=(f.PRE_NMS_TOPK_TRAIN if train else
                      f.PRE_NMS_TOPK_TEST),
        post_nms_topk=(f.POST_NMS_TOPK_TRAIN if train else
                       f.POST_NMS_TOPK_TEST),
        nms_thresh=f.NMS_TH, thresh_with_ctr=f.THRESH_WITH_CTR,
        box_quality=tuple(sorted(f.BOX_QUALITY)),
        owd=cfg.MODEL.PROPOSAL_GENERATOR.OWD,
        approx_topk=cfg.TPU.APPROX_TOPK)


def _print_memory_report(step_fn, state, *args) -> bool:
    """Print XLA's HBM accounting for the train-step executable once
    (SYLPH_MEMORY_REPORT=1). Returns False (= report done) so the loop
    clears the flag; degrades silently where AOT lowering of the exact
    runtime arguments isn't possible."""
    try:
        from ..utils.profiling import memory_report
        rep = memory_report(step_fn.lower(state, *args))
        print("[memory] train-step HBM (XLA memory_analysis): "
              + "  ".join(f"{k}={v}" for k, v in rep.items()))
    except Exception as e:  # never break training over telemetry
        print(f"[memory] report unavailable: {e}")
    return False


def _mapper(cfg) -> EpisodicMapper:
    return EpisodicMapper(
        train_canvas=tuple(cfg.TPU.TRAIN_CANVAS),
        eval_canvas=tuple(cfg.TPU.EVAL_CANVAS),
        support_canvas=tuple(cfg.TPU.SUPPORT_CANVAS),
        max_gt_boxes=cfg.TPU.MAX_GT_BOXES,
        min_size_train=tuple(cfg.INPUT.MIN_SIZE_TRAIN),
        max_size_train=cfg.INPUT.MAX_SIZE_TRAIN,
        min_size_test=cfg.INPUT.MIN_SIZE_TEST,
        max_size_test=cfg.INPUT.MAX_SIZE_TEST,
        use_scale_jitter=cfg.INPUT.USE_SCALE_JITTER,
        rand_augment=("device" if cfg.INPUT.RAND_AUGMENT
                      and cfg.TPU.get("DEVICE_RANDAUG", False)
                      else cfg.INPUT.RAND_AUGMENT),
        fmt=cfg.INPUT.FORMAT)


class MetaFCOSRunner:
    """See module docstring."""

    # ------------------------------------------------------------------ cfg
    @classmethod
    def get_default_cfg(cls) -> CfgNode:
        return get_default_cfg()

    # ---------------------------------------------------------------- model
    def build_model(self, cfg) -> Tuple[MetaOneStageDetector, Dict]:
        model = build_model_from_cfg(cfg)
        episodic = cfg.MODEL.META_LEARN.EPISODIC_LEARNING
        rng = jax.random.PRNGKey(max(cfg.SEED, 0))
        sc = tuple(cfg.TPU.SUPPORT_CANVAS)
        tc = tuple(cfg.TPU.TRAIN_CANVAS)
        # jit the initializer: unjitted flax init dispatches thousands of
        # tiny eager ops (very slow through a remote-TPU tunnel)
        if episodic:
            shot = cfg.MODEL.META_LEARN.SHOT
            init_fn = jax.jit(lambda r: model.init(
                r, jnp.zeros((shot, *sc, 3)), jnp.zeros((shot, 4)),
                jnp.ones((shot,), bool), jnp.zeros((1, *tc, 3)), shot,
                method=MetaOneStageDetector.forward_episodic_train))
            variables = init_fn(
                {"params": rng, "dropout": jax.random.PRNGKey(1)})
        else:
            variables = jax.jit(
                lambda r: model.init(r, jnp.zeros((1, *tc, 3))))(rng)
        params = variables["params"]
        params = self._load_weights(cfg, params)
        self._log_model_stats(cfg, params)
        # device-resident params: merge_params/conversion leave numpy
        # leaves, and a numpy pytree re-uploads EVERY weight on every
        # jitted eval call (~700 ms/call through the remote tunnel).
        return model, jax.tree.map(jnp.asarray, params)

    @staticmethod
    def _log_model_stats(cfg, params):
        """Parameter-count summary at build time (the reference attaches
        an fvcore FLOP-count callback, meta_fcos_runner.py:297,475; exact
        executable FLOPs are available via utils.profiling.flop_count)."""
        from ..train.optimizer import build_freeze_mask
        total = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
        mask = build_freeze_mask(params, _freeze_cfg(cfg))
        trainable = sum(
            int(np.prod(l.shape))
            for l, m in zip(jax.tree.leaves(params), jax.tree.leaves(mask))
            if m)
        print(f"[model] params: {total/1e6:.2f}M total, "
              f"{trainable/1e6:.2f}M trainable")

    def _load_weights(self, cfg, params):
        """MODEL.WEIGHTS loading with module filtering (reference
        _weight_preprocess, meta_fcos_runner.py:232-288)."""
        path = cfg.MODEL.WEIGHTS
        if not path:
            return params
        if path.endswith((".pth", ".pkl")):
            from ..utils.convert_weights import (
                convert_detectron2_checkpoint, load_torch_state_dict)
            loaded = convert_detectron2_checkpoint(
                load_torch_state_dict(path),
                num_tower_convs=max(cfg.MODEL.FCOS.NUM_CLS_CONVS,
                                    cfg.MODEL.FCOS.NUM_BOX_CONVS))
        else:
            # native formats (.npz / orbax dir): raw template-free read,
            # so a checkpoint with a different head size still loads —
            # merge_params skips the mismatched leaves
            from ..train.checkpoint import load_params_any
            loaded = load_params_any(path)
        loaded = filter_params_by_module(
            loaded, list(cfg.MODEL.WEIGHTS_FILTER_BY_MODULE))
        return merge_params(params, loaded)

    # ------------------------------------------------------------- training
    def do_train(self, cfg, model=None, params=None):
        if model is None:
            model, params = self.build_model(cfg)
        if cfg.MODEL.META_LEARN.EPISODIC_LEARNING:
            return self._train_episodic(cfg, model, params)
        return self._train_pretrain(cfg, model, params)

    def _common_train_setup(self, cfg, params):
        mesh = create_mesh()
        tx, schedule = build_optimizer(
            params, base_lr=cfg.SOLVER.BASE_LR,
            momentum=cfg.SOLVER.MOMENTUM,
            weight_decay=cfg.SOLVER.WEIGHT_DECAY,
            weight_decay_norm=cfg.SOLVER.WEIGHT_DECAY_NORM,
            steps=tuple(cfg.SOLVER.STEPS), gamma=cfg.SOLVER.GAMMA,
            warmup_iters=cfg.SOLVER.WARMUP_ITERS,
            warmup_factor=cfg.SOLVER.WARMUP_FACTOR,
            clip_grad_norm=(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE
                            if cfg.SOLVER.CLIP_GRADIENTS.ENABLED else 0.0),
            freeze_cfg=_freeze_cfg(cfg))
        state = create_train_state(params, tx,
                                   use_ema=cfg.MODEL_EMA.ENABLED,
                                   ema_decay=cfg.MODEL_EMA.DECAY)
        ckpt = (CheckpointManager(os.path.join(cfg.OUTPUT_DIR, "ckpt"))
                if cfg.OUTPUT_DIR else None)
        if ckpt is not None:
            state, start = ckpt.restore(state)
        writer = MetricsWriter(cfg.OUTPUT_DIR)
        checker = AbnormalLossChecker()
        return mesh, tx, schedule, state, ckpt, writer, checker

    def _train_loop(self, cfg, mesh, state, step_fn, batches, schedule,
                    ckpt, writer, checker, episodic: bool,
                    eval_fn=None):
        max_iter = cfg.SOLVER.MAX_ITER
        eval_period = cfg.TEST.EVAL_PERIOD
        k = max(1, cfg.TPU.get("STEPS_PER_CALL", 1))
        rng = jax.random.PRNGKey(7)
        it = int(np.asarray(state.step))
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..utils.profiling import fence_large_leaves
        # mesh-committed arrays force the slow sharded-dispatch path;
        # on one device plain placement is equivalent (see shard_batch)
        stacked_sharding = (NamedSharding(mesh, P(None, "data"))
                            if mesh.size > 1 else None)

        # Device-side double buffering: a worker thread runs host
        # decode/augment AND the host->device transfer for batch i+1
        # while the device executes step i (the reference gets the same
        # overlap from DataLoader workers + CUDA async copies; here the
        # transfer must be overlapped explicitly because the step
        # dispatch would otherwise wait on it).
        def put_stacked(*xs):
            stacked = np.stack(xs)
            if jax.process_count() > 1:
                # multi-host: each process holds its LOCAL slice of the
                # global batch; assemble the global array from
                # process-local shards (same as shard_batch's k=1 path)
                return jax.make_array_from_process_local_data(
                    stacked_sharding, stacked)
            return jax.device_put(stacked, stacked_sharding)

        def groups():
            bit = iter(batches)
            while True:
                try:
                    group = [next(bit) for _ in range(k)]
                except StopIteration:
                    return  # finite loader exhausted (PEP 479)
                if k > 1:
                    sb = jax.tree.map(put_stacked, *group)
                else:
                    sb = shard_batch(mesh, group[0])
                # Force large transfers to completion HERE, in the
                # prefetch thread, where they overlap the running step —
                # lazily they serialize H2D with compute at step time
                # (measured on the 48-episode/1024x1344 schedule: ~33 s
                # steps lazy vs ~7 s fenced). Policy + tunnel rationale:
                # utils/profiling.py::fence_large_leaves.
                fence_large_leaves(sb)
                yield sb

        from ..data.loader import _prefetch
        device_batches = _prefetch(groups, depth=2)

        # one-shot compile-time HBM report (SYLPH_MEMORY_REPORT=1):
        # XLA memory_analysis of the step executable — the tunnel's
        # PJRT client has no runtime memory_stats (see
        # utils/profiling.py::memory_report)
        mem_report = bool(os.environ.get("SYLPH_MEMORY_REPORT"))
        # SYLPH_TIME_LOOP=1: per-iter host-loop stage split — time spent
        # waiting for data (assembly+H2D behind the prefetch threads) vs
        # waiting on the device step. The first thing to read when
        # throughput drops: it says WHICH pipeline stage is the wall.
        time_loop = bool(os.environ.get("SYLPH_TIME_LOOP"))

        while it < max_iter:
            t_loop = time.perf_counter()
            if k > 1:
                if it + k > max_iter:
                    # a K-group would overshoot the schedule; stop at the
                    # largest multiple of K (explicit, never silent) —
                    # saving the progress made since the last periodic
                    # checkpoint (the `it >= max_iter` terminal save is
                    # unreachable on this path)
                    print(f"[train] stopping at iter {it}: MAX_ITER "
                          f"{max_iter} is not a multiple of "
                          f"TPU.STEPS_PER_CALL={k}")
                    if ckpt is not None:
                        ckpt.save(it, state)
                    break
                # K host batches stacked on a leading scan axis — one
                # dispatch runs K optimizer steps (train/steps.py scan)
                sb = next(device_batches)
                t_data = time.perf_counter()
                if episodic:
                    rngs = jnp.stack([jax.random.fold_in(rng, it + i)
                                      for i in range(k)])
                    if mem_report:
                        mem_report = _print_memory_report(
                            step_fn, state, sb, rngs)
                    state, metrics = step_fn(state, sb, rngs)
                else:
                    if mem_report:
                        mem_report = _print_memory_report(
                            step_fn, state, sb)
                    state, metrics = step_fn(state, sb)
                metrics = jax.tree.map(np.asarray, metrics)
                per_step = [{key: float(v[i]) for key, v in metrics.items()}
                            for i in range(k)]
            else:
                sb = next(device_batches)
                t_data = time.perf_counter()
                if episodic:
                    r = jax.random.fold_in(rng, it)
                    if mem_report:
                        mem_report = _print_memory_report(
                            step_fn, state, sb, r)
                    state, metrics = step_fn(state, sb, r)
                else:
                    if mem_report:
                        mem_report = _print_memory_report(
                            step_fn, state, sb)
                    state, metrics = step_fn(state, sb)
                per_step = [{key: float(np.asarray(v))
                             for key, v in metrics.items()}]
            if time_loop:
                t_step = time.perf_counter()
                print(f"[loop-timing] data_wait {t_data - t_loop:.2f}s  "
                      f"step_wait {t_step - t_data:.2f}s")
            for m in per_step:
                it += 1
                problems = checker.check(m)
                for key, msg in problems.items():
                    print(f"[abnormal-loss] {key}: {msg}")
                writer.write(it, m, lr=float(schedule(it)))
            if ckpt is not None and (it % cfg.SOLVER.CHECKPOINT_PERIOD < k
                                     or it >= max_iter):
                ckpt.save(it, state)
            if (eval_fn is not None and eval_period > 0
                    and it % eval_period < k and it < max_iter):
                # periodic eval hook (reference TEST.EVAL_PERIOD,
                # meta_fcos_runner.py:353-357)
                eval_fn(self.eval_params(cfg, state), it)
        writer.close()
        # steps return a PackedState (train/packing.py); hand callers a
        # plain TrainState again
        return state.unpack() if hasattr(state, "unpack") else state

    def _train_pretrain(self, cfg, model, params):
        mesh, tx, schedule, state, ckpt, writer, checker = \
            self._common_train_setup(cfg, params)
        grid = build_location_grid(
            tuple(cfg.TPU.TRAIN_CANVAS), tuple(cfg.MODEL.FCOS.FPN_STRIDES),
            list(cfg.MODEL.FCOS.SIZES_OF_INTEREST))
        step = make_pretrain_train_step(
            model, tx, grid, _loss_cfg(cfg), mesh,
            center_sample=cfg.MODEL.FCOS.CENTER_SAMPLE,
            radius=cfg.MODEL.FCOS.POS_RADIUS,
            steps_per_call=max(1, cfg.TPU.get("STEPS_PER_CALL", 1)),
            grad_accum=max(1, cfg.TPU.GRAD_ACCUM))
        loader = self._pretrain_loader(cfg, mesh)
        return model, self._train_loop(cfg, mesh, state, step, loader,
                                       schedule, ckpt, writer, checker,
                                       episodic=False)

    def _train_episodic(self, cfg, model, params):
        mesh, tx, schedule, state, ckpt, writer, checker = \
            self._common_train_setup(cfg, params)
        grid = build_location_grid(
            tuple(cfg.TPU.TRAIN_CANVAS), tuple(cfg.MODEL.FCOS.FPN_STRIDES),
            list(cfg.MODEL.FCOS.SIZES_OF_INTEREST))
        pretrained_kernel = None
        lc = _loss_cfg(cfg)
        if lc.distill_weight > 0:
            pretrained_kernel = self._cls_logits_kernel(params)
        step = make_episodic_train_step(
            model, tx, grid, lc, mesh, num_shots=cfg.MODEL.META_LEARN.SHOT,
            center_sample=cfg.MODEL.FCOS.CENTER_SAMPLE,
            radius=cfg.MODEL.FCOS.POS_RADIUS,
            pretrained_kernel=pretrained_kernel,
            steps_per_call=max(1, cfg.TPU.get("STEPS_PER_CALL", 1)),
            grad_accum=max(1, cfg.TPU.GRAD_ACCUM))
        loader = self._episodic_loader(cfg, mesh)

        def eval_fn(params, it):
            print(f"[eval @ iter {it}]")
            for name, res in self.do_test(cfg, model, params,
                                          step=it).items():
                print(name, {k: round(v, 3)
                             for k, v in res["bbox"].items()
                             if isinstance(v, float)})

        return model, self._train_loop(cfg, mesh, state, step, loader,
                                       schedule, ckpt, writer, checker,
                                       episodic=True, eval_fn=eval_fn)

    @staticmethod
    def _cls_logits_kernel(params):
        """(C_base, 256) weight + (C_base,) bias of the pretrained 1x1
        cls_logits conv (distillation target, fcos.py:219-227)."""
        k = np.asarray(params["fcos_head"]["cls_logits"]["kernel"])
        b = np.asarray(params["fcos_head"]["cls_logits"]["bias"])
        return (jnp.asarray(k.reshape(-1, k.shape[-1]).T),
                jnp.asarray(b))

    # -------------------------------------------------------------- loaders
    def _episodic_loader(self, cfg, mesh):
        name = cfg.DATASETS.TRAIN[0]
        ds = MetaDataset(DatasetCatalog.get(name), "episodic_train_both",
                         num_shot=cfg.MODEL.META_LEARN.SHOT,
                         num_query_shot=cfg.MODEL.META_LEARN.QUERY_SHOT)
        return build_episodic_train_loader(
            ds, _mapper(cfg),
            episodes_per_batch=cfg.SOLVER.IMS_PER_BATCH,
            seed=max(cfg.SEED, 0), sampler=cfg.DATALOADER.SAMPLER_TRAIN,
            repeat_thresh=cfg.DATALOADER.REPEAT_THRESHOLD,
            # the K-step-scan loop holds K batches before stacking them
            retain=max(2, cfg.TPU.get("STEPS_PER_CALL", 1)))

    def _pretrain_loader(self, cfg, mesh):
        """Plain detection batches from the pretrain dataset:
        epoch-shuffled, or image-level repeat-factor sampled for LVIS
        (DATALOADER.SAMPLER_TRAIN, matching detectron2's
        build_detection_train_loader used by the reference's d2go
        runner)."""
        from ..data.loader import build_pretrain_loader

        name = cfg.DATASETS.TRAIN[0]
        try:
            # few-shot subsets honor MODEL.TFA.TRAIN_SHOT (the reference
            # reads it through its global cfg at registration time)
            data = DatasetCatalog.get(name, shot=cfg.MODEL.TFA.TRAIN_SHOT)
        except TypeError:
            data = DatasetCatalog.get(name)
        if isinstance(data, dict) and "records" not in data:
            raise ValueError(
                f"{name} is an episodic meta-dataset; the non-episodic "
                "pretrain loader needs a *_pretrain_* dataset (or set "
                "MODEL.META_LEARN.EPISODIC_LEARNING: true)")
        records = data["records"] if isinstance(data, dict) else data
        return build_pretrain_loader(
            records, _mapper(cfg), batch_size=cfg.SOLVER.IMS_PER_BATCH,
            seed=max(cfg.SEED, 0), sampler=cfg.DATALOADER.SAMPLER_TRAIN,
            repeat_thresh=cfg.DATALOADER.REPEAT_THRESHOLD,
            retain=max(2, cfg.TPU.get("STEPS_PER_CALL", 1)))

    # ------------------------------------------------------------------ eval
    def get_evaluator(self, cfg, dataset_name: str, query_records, metadata):
        """Evaluator dispatch on the dataset's evaluator_type (reference
        meta_fcos_runner.py:116-149 dispatches on
        MetadataCatalog.evaluator_type): coco_meta_learn → OWD or
        COCOMetaEvaluator, lvis/tao_meta_learn → FewshotLVISEvaluator,
        anything else → the generic COCO+AR table (the
        GeneralizedRCNNRunner fallback)."""
        etype = metadata.get("evaluator_type") or (
            "lvis_meta_learn" if dataset_name.startswith("lvis")
            else "coco_meta_learn" if "_meta_" in dataset_name
            else "coco")
        novel = None
        if metadata.get("split") == "all":
            novel = metadata.get("novel_dataset_ids")
        # OWD overrides everything: class-agnostic predictions must be
        # scored class-agnostically (the reference threads agnostic_eval
        # into its COCO evaluator for every dataset type)
        if cfg.MODEL.PROPOSAL_GENERATOR.OWD:
            return COCOOWDEvaluator(query_records, metadata)
        if etype in ("lvis", "lvis_meta_learn", "tao_meta_learn"):
            return FewshotLVISEvaluator(
                query_records, metadata,
                categories=metadata.get("categories"),
                max_dets=cfg.TEST.DETECTIONS_PER_IMAGE)
        if etype == "coco_meta_learn":
            return COCOMetaEvaluator(query_records, metadata,
                                     novel_dataset_ids=novel)
        return AREvaluator(query_records, metadata,
                           novel_dataset_ids=novel)

    @staticmethod
    def eval_params(cfg, state):
        """Pick EMA weights for eval when enabled (reference
        meta_fcos_runner.py:692-699). Unpacks a PackedState once —
        each property access would re-run the full unpack."""
        if hasattr(state, "unpack"):
            state = state.unpack()
        if cfg.MODEL_EMA.ENABLED and state.ema_params is not None:
            return state.ema_params
        return state.params

    def _do_test_plain(self, cfg, model, params) -> Dict[str, Dict]:
        """Non-episodic evaluation (pretrain / TFA finetune path)."""
        grid = build_location_grid(
            tuple(cfg.TPU.EVAL_CANVAS), tuple(cfg.MODEL.FCOS.FPN_STRIDES),
            list(cfg.MODEL.FCOS.SIZES_OF_INTEREST))
        results = {}
        # one jitted infer shared by every test dataset — identical
        # shapes must not recompile per dataset name
        infer = _make_plain_fcos_infer(model, params, grid,
                                       _decode_cfg(cfg))
        for name in cfg.DATASETS.TEST:
            data = DatasetCatalog.get(name)
            if isinstance(data, dict) and "records" in data:
                records, meta = data["records"], data["metadata"]
            else:  # meta-format dict: evaluate on its query list
                records, meta = data[-1], data["metadata"]
            evaluator = self.get_evaluator(cfg, name, records, meta)
            results[name] = _plain_eval_loop(
                infer, records, _mapper(cfg),
                meta["thing_dataset_id_to_contiguous_id"], evaluator,
                batch_size=cfg.TPU.EVAL_BATCH)
        return results

    def do_test(self, cfg, model, params,
                step: int = 0) -> Dict[str, Dict]:
        params = eval_resident_params(cfg, params)
        if not cfg.MODEL.META_LEARN.EPISODIC_LEARNING:
            results = self._do_test_plain(cfg, model, params)
            write_eval_results_tb(results, cfg.OUTPUT_DIR, step)
            return results
        results = {}
        grid = build_location_grid(
            tuple(cfg.TPU.EVAL_CANVAS), tuple(cfg.MODEL.FCOS.FPN_STRIDES),
            list(cfg.MODEL.FCOS.SIZES_OF_INTEREST))
        for name in cfg.DATASETS.TEST:
            dataset_dict = DatasetCatalog.get(name)
            # all-GT base-class codes only make sense on splits that
            # contain base classes (reference meta_fcos_runner.py:520-532)
            split = dataset_dict["metadata"].get("split", "")
            use_base = (cfg.MODEL.META_LEARN.USE_ALL_GTS_IN_BASE_CLASSES
                        and split in ("all", "base"))
            driver = MetaTestDriver(
                model, params, dataset_dict, _mapper(cfg), grid,
                _decode_cfg(cfg), eval_shot=cfg.MODEL.META_LEARN.EVAL_SHOT,
                evaluator_factory=lambda recs, meta, n=name:
                    self.get_evaluator(cfg, n, recs, meta),
                save_dir=(os.path.join(cfg.OUTPUT_DIR, "class_codes", name)
                          if cfg.OUTPUT_DIR else None),
                use_all_gts_in_base=use_base,
                base_max_records=cfg.MODEL.META_LEARN.BASE_EVAL_SHOT * 10,
                eval_batch=cfg.TPU.EVAL_BATCH,
                # multi-device: shard phase-1 class registration over the
                # mesh (reference rank-sharding, meta_fcos_runner.py:381);
                # single-device: vmapped class batching instead
                mesh=(create_mesh() if jax.device_count() > 1 else None),
                class_batch=cfg.TPU.CLASS_BATCH)
            results[name] = driver.run_repeated(cfg.TEST.REPEAT_TEST)
        # reference flattens meta-test results into TB scalars
        # (meta_fcos_runner.py:614-671) — mean±std plus per-seed runs
        write_eval_results_tb(results, cfg.OUTPUT_DIR, step)
        return results


def _make_plain_fcos_infer(model, params, grid, dcfg):
    """Jitted base-detector inference (trained cls_logits, no bank)."""
    from ..ops.decode import decode_proposals

    locations = jnp.asarray(grid.locations)
    strides = jnp.asarray(grid.strides)
    level_ids = jnp.asarray(grid.level_ids)
    splits = tuple(h * w for h, w in grid.level_sizes)

    @jax.jit
    def infer_p(p, images, sizes):
        out = model.apply({"params": p}, images,
                          method=MetaOneStageDetector.forward_base)
        return decode_proposals(out.logits, out.reg, out.ctrness, out.iou,
                                locations, strides, level_ids, sizes,
                                dcfg, splits)

    return lambda images, sizes: infer_p(params, images, sizes)


def _plain_eval_loop(infer, records, mapper, id_map, evaluator,
                     batch_size: int = 4):
    """Base-detector evaluation shared by the one- and two-stage paths
    (reference do_test non-episodic branch via d2go).

    Streams: each batch of records is decoded/mapped on the thread pool
    just before its device step — never materializing the full test set
    as float32 canvases in host memory.
    """
    from ..data.loader import _POOL
    from ..evaluation.postprocess import detections_to_coco_results

    contiguous_to_dataset = {v: k for k, v in id_map.items()}
    for i in range(0, len(records), batch_size):
        chunk = list(_POOL.map(mapper.map_query_eval,
                               records[i:i + batch_size]))
        n = len(chunk)
        while len(chunk) < batch_size:
            chunk.append(chunk[-1])
        det = infer(jnp.asarray(np.stack([m["image"] for m in chunk])),
                    jnp.asarray(np.stack([m["image_size"]
                                          for m in chunk])))
        det = jax.tree.map(np.asarray, det)
        evaluator.process(detections_to_coco_results(
            det, [m["image_id"] for m in chunk],
            np.stack([m["image_size"] for m in chunk]),
            np.stack([np.asarray([m["orig_height"], m["orig_width"]])
                      for m in chunk]),
            contiguous_to_dataset,
            batch_valid=np.arange(batch_size) < n))
    return evaluator.evaluate()


class MetaFCOSROIEncoderRunner(MetaFCOSRunner):
    """ROIEncoder code-generator variant (reference
    meta_fcos_roi_encoder_runner.py:24-37)."""

    @classmethod
    def get_default_cfg(cls):
        cfg = super().get_default_cfg()
        cfg.MODEL.META_LEARN.CODE_GENERATOR.NAME = "ROIEncoder"
        return cfg


class TFAFewShotDetectionRunner(MetaFCOSRunner):
    """TFA finetune baseline: non-episodic training through the pretrain
    path with surgical freezing (reference tfa_runner.py:23-39; cosine
    head option via MODEL.FCOS.L2_NORM_CLS_WEIGHT)."""

    @classmethod
    def get_default_cfg(cls):
        cfg = super().get_default_cfg()
        cfg.MODEL.META_LEARN.EPISODIC_LEARNING = False
        cfg.MODEL.TFA.FINETINE = True
        return cfg

    def build_model(self, cfg):
        model, params = super().build_model(cfg)
        if (cfg.MODEL.TFA.USE_PRETRAINED_BASE_CLS_LOGITS
                and cfg.MODEL.WEIGHTS
                and cfg.DATASETS.BASE_CLASSES_SPLIT
                and cfg.DATASETS.TRAIN):
            params = jax.tree.map(jnp.asarray,
                                  self._preload_cls_logits(cfg, params))
        return model, params

    def _preload_cls_logits(self, cfg, params):
        """TFA surgery: copy the pretrained base-class rows of the 1x1
        cls_logits into the expanded head at the positions the current
        (all-classes) dataset assigns them (reference
        _preload_cls_logits_weights, fcos.py:344-380).

        The base rows come from the checkpoint already merged into
        ``params`` (MODEL.WEIGHTS is a base-classes model whose
        cls_logits has C_base columns — merge_params keeps the fresh
        C_all head when shapes differ, so we re-read the raw file).
        Works for detectron2 ``.pth``/``.pkl`` AND this framework's own
        native checkpoints (``.npz`` / orbax dir) — the TFA flow usually
        starts from our own pretrain output. Surgery that was requested
        but cannot be performed warns LOUDLY instead of silently
        returning unpatched params."""
        import logging
        log = logging.getLogger(__name__)

        path = cfg.MODEL.WEIGHTS
        if path.endswith((".pth", ".pkl")):
            from ..utils.convert_weights import (
                convert_detectron2_checkpoint, load_torch_state_dict)
            loaded = convert_detectron2_checkpoint(
                load_torch_state_dict(path))
        else:
            from ..train.checkpoint import load_params_any
            try:
                loaded = load_params_any(path)
            except Exception as e:  # noqa: BLE001 — surfaced below
                log.warning(
                    "[TFA] cls-logits surgery REQUESTED "
                    "(MODEL.TFA.USE_PRETRAINED_BASE_CLS_LOGITS) but "
                    "MODEL.WEIGHTS=%r could not be read natively (%s) — "
                    "surgery SKIPPED, base rows stay at random init", path, e)
                return params
        head = loaded.get("fcos_head", {}).get("cls_logits")
        if not head or "kernel" not in head:
            log.warning(
                "[TFA] cls-logits surgery REQUESTED but checkpoint %r has "
                "no fcos_head/cls_logits (cosine head or headless "
                "checkpoint?) — surgery SKIPPED", path)
            return params
        base_k = np.asarray(head["kernel"])   # (1, 1, 256, C_base)
        base_b = np.asarray(head["bias"])
        base_map = MetadataCatalog.get(
            cfg.DATASETS.BASE_CLASSES_SPLIT)
        cur = DatasetCatalog.get(cfg.DATASETS.TRAIN[0])["metadata"]
        base_ids = base_map.get("thing_dataset_id_to_contiguous_id")
        if base_ids is None:  # lazily-registered: load the dataset
            base_ids = DatasetCatalog.get(
                cfg.DATASETS.BASE_CLASSES_SPLIT)["metadata"][
                    "thing_dataset_id_to_contiguous_id"]
        cur_ids = cur["thing_dataset_id_to_contiguous_id"]
        k = np.asarray(params["fcos_head"]["cls_logits"]["kernel"]).copy()
        b = np.asarray(params["fcos_head"]["cls_logits"]["bias"]).copy()
        for did, bi in base_ids.items():
            if did in cur_ids:
                ci = cur_ids[did]
                k[..., ci] = base_k[..., bi]
                b[ci] = base_b[bi]
        params["fcos_head"]["cls_logits"]["kernel"] = k
        params["fcos_head"]["cls_logits"]["bias"] = b
        print(f"[TFA] preloaded {len(base_ids)} base cls_logits rows")
        return params


def create_runner(name: str) -> MetaFCOSRunner:
    from .meta_faster_rcnn_runner import (MetaFasterRCNNRunner,
                                          TFAFasterRCNNRunner)

    table = {
        "MetaFCOSRunner": MetaFCOSRunner,
        "MetaFCOSROIEncoderRunner": MetaFCOSROIEncoderRunner,
        "TFAFewShotDetectionRunner": TFAFewShotDetectionRunner,
        "MetaFasterRCNNRunner": MetaFasterRCNNRunner,
        "TFAFasterRCNNRunner": TFAFasterRCNNRunner,
    }
    # accept reference-style dotted names
    key = name.split(".")[-1]
    return table[key]()
