"""Meta Faster R-CNN runner (two-stage variant).

Reference: sylph/runner/meta_faster_rcnn_runner.py:25-41 (config
assembly incl. add_customized_mask_rcnn_config, default_configs.py:
163-198). The upstream two-stage path is not self-contained
(BiStandardROIHeads missing — SURVEY.md §2.1); this runner drives the
standard-equivalent FewShotRCNN in models/rcnn.py.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CfgNode
from ..models.rcnn import FewShotRCNN, build_anchor_grid
from ..structures import GTBoxes
from ..utils.events import write_eval_results_tb
from .meta_fcos_runner import MetaFCOSRunner, _codegen_kwargs


def add_rcnn_config(cfg: CfgNode) -> CfgNode:
    """RPN/ROI keys (reference Base-RCNN-FPN.yaml + detectron2 defaults)."""
    cfg.MODEL.RPN = CfgNode()
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 2000
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 1000
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 1000
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 1000
    cfg.MODEL.RPN.NMS_THRESH = 0.7
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 256
    cfg.MODEL.RPN.POSITIVE_FRACTION = 0.5
    cfg.MODEL.ANCHOR_GENERATOR = CfgNode()
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [[32], [64], [128], [256], [512]]
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[0.5, 1.0, 2.0]]
    cfg.MODEL.ROI_HEADS = CfgNode()
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 80
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 512
    cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION = 0.25
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.05
    cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST = 0.5
    cfg.MODEL.ROI_HEADS.FREEZE = False
    cfg.MODEL.ROI_HEADS.FREEZE_FEAT = False       # TFA-RCNN (tfa_rcnn.py:30)
    cfg.MODEL.ROI_HEADS.COSINE_SCALE = -1.0       # tfa_fast_rcnn.py:52-55
    cfg.MODEL.ROI_BOX_HEAD = CfgNode()
    cfg.MODEL.ROI_BOX_HEAD.NUM_FC = 2
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 1024
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    return cfg


class MetaFasterRCNNRunner(MetaFCOSRunner):
    @classmethod
    def get_default_cfg(cls) -> CfgNode:
        cfg = super().get_default_cfg()
        add_rcnn_config(cfg)
        cfg.MODEL.META_ARCHITECTURE = "FewShotDetector"
        cfg.MODEL.RESNETS.OUT_FEATURES = ["res2", "res3", "res4", "res5"]
        cfg.MODEL.FPN.IN_FEATURES = ["res2", "res3", "res4", "res5"]
        # R-CNN code generator emits FC-dim (1024) codes
        cfg.MODEL.META_LEARN.CODE_GENERATOR.OUT_CHANNEL = 1024
        return cfg

    def build_model(self, cfg) -> Tuple[FewShotRCNN, Dict]:
        episodic = cfg.MODEL.META_LEARN.EPISODIC_LEARNING
        dtype = (jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16"
                 else jnp.float32)
        model = FewShotRCNN(
            depth=cfg.MODEL.RESNETS.DEPTH,
            backbone_out_features=tuple(cfg.MODEL.RESNETS.OUT_FEATURES),
            fpn_out_channels=cfg.MODEL.FPN.OUT_CHANNELS,
            num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
            fc_dim=cfg.MODEL.ROI_BOX_HEAD.FC_DIM,
            cosine_sim=cfg.MODEL.FCOS.L2_NORM_CLS_WEIGHT,
            cosine_scale=cfg.MODEL.ROI_HEADS.COSINE_SCALE,
            code_generator_name=("CodeGenerator" if episodic else "none"),
            code_generator_kwargs=_codegen_kwargs(cfg) if episodic else None,
            pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
            pixel_std=tuple(cfg.MODEL.PIXEL_STD),
            anchor_ratios=tuple(cfg.MODEL.ANCHOR_GENERATOR
                                .ASPECT_RATIOS[0]),
            stop_backbone_grad=cfg.MODEL.BACKBONE.FREEZE,
            s2d_stem=cfg.TPU.S2D_STEM,
            compute_dtype=dtype)
        shot = cfg.MODEL.META_LEARN.SHOT
        sc = tuple(cfg.TPU.SUPPORT_CANVAS)
        tc = tuple(cfg.TPU.TRAIN_CANVAS)
        grid = build_anchor_grid(
            tc, sizes=tuple(s[0] for s in cfg.MODEL.ANCHOR_GENERATOR.SIZES))
        q = cfg.MODEL.META_LEARN.QUERY_SHOT
        # jitted init: unjitted eager dispatch through the remote-TPU
        # tunnel is ~1000x slower (CLAUDE.md)
        if episodic:
            args = self._example_args(cfg, shot, q, sc, tc, grid)
            variables = jax.jit(lambda r: model.init(
                {"params": r}, *args,
                method=FewShotRCNN.forward_episodic_train))(
                jax.random.PRNGKey(0))
        else:
            gt = GTBoxes(jnp.zeros((1, 1, 4)), jnp.zeros((1, 1), jnp.int32),
                         jnp.zeros((1, 1), bool))
            variables = jax.jit(lambda r: model.init(
                {"params": r},
                jnp.zeros((1, *tc, 3)), gt, jax.random.PRNGKey(0),
                jnp.asarray(grid.anchors), grid.level_splits,
                jnp.asarray([list(tc)]),
                method=FewShotRCNN.forward_pretrain_train))(
                jax.random.PRNGKey(0))
        params = self._load_weights(cfg, variables["params"])
        return model, jax.tree.map(jnp.asarray, params)

    @staticmethod
    def _example_args(cfg, shot, q, sc, tc, grid):
        gt = GTBoxes(jnp.zeros((q, 1, 4)), jnp.zeros((q, 1), jnp.int32),
                     jnp.zeros((q, 1), bool))
        return (jnp.zeros((shot, *sc, 3)), jnp.zeros((shot, 4)),
                jnp.ones((shot,), bool), jnp.zeros((q, *tc, 3)), gt,
                jnp.zeros((1,), jnp.int32), jax.random.PRNGKey(0),
                jnp.asarray(grid.anchors), grid.level_splits,
                jnp.tile(jnp.asarray([list(tc)]), (q, 1)), shot)

    def do_test(self, cfg, model, params, step: int = 0):
        """Two-phase meta-test with the TWO-STAGE query path: the driver
        dispatches phase 2 through FewShotRCNN.forward_instances instead
        of the FCOS decode (reference FewShotDetector
        "meta_learn_test_instance", few_shot_rcnn.py:230-306). Non-
        episodic (pretrain / TFA-RCNN) evaluates the plain base
        classifier via forward_base_instances."""
        import os

        from ..evaluation.meta_eval import MetaTestDriver, make_rcnn_infer
        from ..runner.meta_fcos_runner import _mapper
        from ..utils.precision import eval_resident_params

        params = eval_resident_params(cfg, params)
        if not cfg.MODEL.META_LEARN.EPISODIC_LEARNING:
            results = self._do_test_plain_rcnn(cfg, model, params)
            write_eval_results_tb(results, cfg.OUTPUT_DIR, step)
            return results

        ec = tuple(cfg.TPU.EVAL_CANVAS)
        grid = build_anchor_grid(
            ec, sizes=tuple(s[0] for s in cfg.MODEL.ANCHOR_GENERATOR.SIZES))

        def infer_factory(model, params, bank):
            f = make_rcnn_infer(
                model, bank, grid,
                rpn_post_nms=cfg.MODEL.RPN.POST_NMS_TOPK_TEST,
                rpn_pre_nms=cfg.MODEL.RPN.PRE_NMS_TOPK_TEST,
                score_thresh=cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
                nms_thresh=cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
                max_dets=cfg.TEST.DETECTIONS_PER_IMAGE)
            return lambda imgs, sizes: f(params, imgs, sizes)

        results = {}
        for name in cfg.DATASETS.TEST:
            from ..data.catalog import DatasetCatalog
            dataset_dict = DatasetCatalog.get(name)
            driver = MetaTestDriver(
                model, params, dataset_dict, _mapper(cfg), grid=None,
                decode_cfg=None,
                eval_shot=cfg.MODEL.META_LEARN.EVAL_SHOT,
                evaluator_factory=lambda recs, meta, n=name:
                    self.get_evaluator(cfg, n, recs, meta),
                save_dir=(os.path.join(cfg.OUTPUT_DIR, "class_codes", name)
                          if cfg.OUTPUT_DIR else None),
                eval_batch=cfg.TPU.EVAL_BATCH,
                infer_factory=infer_factory,
                class_batch=cfg.TPU.CLASS_BATCH)
            results[name] = driver.run_repeated(cfg.TEST.REPEAT_TEST)
        write_eval_results_tb(results, cfg.OUTPUT_DIR, step)
        return results

    def _do_test_plain_rcnn(self, cfg, model, params):
        """Base-classifier two-stage evaluation (TFA-RCNN / pretrain):
        the shared streaming eval loop over forward_base_instances."""
        from ..data.catalog import DatasetCatalog
        from ..runner.meta_fcos_runner import _mapper, _plain_eval_loop

        ec = tuple(cfg.TPU.EVAL_CANVAS)
        grid = build_anchor_grid(
            ec, sizes=tuple(s[0] for s in cfg.MODEL.ANCHOR_GENERATOR.SIZES))
        anchors = jnp.asarray(grid.anchors)
        splits = tuple(grid.level_splits)

        @jax.jit
        def infer_p(p, images, sizes):
            return model.apply(
                {"params": p}, images, anchors, splits, sizes,
                cfg.MODEL.RPN.POST_NMS_TOPK_TEST,
                cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
                cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
                cfg.TEST.DETECTIONS_PER_IMAGE,
                rpn_pre_nms=cfg.MODEL.RPN.PRE_NMS_TOPK_TEST,
                method=FewShotRCNN.forward_base_instances)

        infer = lambda images, sizes: infer_p(params, images, sizes)  # noqa: E731
        results = {}
        for name in cfg.DATASETS.TEST:
            data = DatasetCatalog.get(name)
            if isinstance(data, dict) and "records" in data:
                records, meta = data["records"], data["metadata"]
            else:
                records, meta = data[-1], data["metadata"]
            evaluator = self.get_evaluator(cfg, name, records, meta)
            results[name] = _plain_eval_loop(
                infer, records, _mapper(cfg),
                meta["thing_dataset_id_to_contiguous_id"], evaluator,
                batch_size=cfg.TPU.EVAL_BATCH)
        return results

    @staticmethod
    def _sgd_step_factory(tx, loss_apply):
        """Shared SGD scaffolding for the two-stage steps: fold the
        data-axis index into the rng, value_and_grad the supplied
        ``loss_apply(params, batch, rng, axis) -> losses``, pmean
        grads/metrics across shards, apply updates."""
        def make_local_step(axis):
            def local_step(state, batch, rng):
                if axis:
                    rng = jax.random.fold_in(rng,
                                             jax.lax.axis_index(axis))

                def loss_fn(p):
                    losses = loss_apply(p, batch, rng, axis)
                    return sum(losses.values()), losses

                (_, losses), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                if axis:
                    grads = jax.lax.pmean(grads, axis)
                    losses = {k: jax.lax.pmean(v, axis)
                              for k, v in losses.items()}
                return state.apply_updates(grads, tx), losses
            return local_step
        return make_local_step

    def do_train(self, cfg, model=None, params=None):
        """Two-stage training loop (episodic or plain pretrain/TFA)."""
        if model is None:
            model, params = self.build_model(cfg)
        if not cfg.MODEL.META_LEARN.EPISODIC_LEARNING:
            return self._train_pretrain_rcnn(cfg, model, params)
        mesh, tx, schedule, state, ckpt, writer, checker = \
            self._common_train_setup(cfg, params)
        tc = tuple(cfg.TPU.TRAIN_CANVAS)
        grid = build_anchor_grid(
            tc, sizes=tuple(s[0] for s in cfg.MODEL.ANCHOR_GENERATOR.SIZES))
        anchors = jnp.asarray(grid.anchors)
        shot = cfg.MODEL.META_LEARN.SHOT

        def loss_apply(p, batch, rng, axis):
            labels = batch["query_gt_labels"]
            in_ep = jnp.any(
                labels[..., None]
                == batch["episode_class_ids"][None, None, :], -1)
            gt = GTBoxes(batch["query_gt_boxes"], labels,
                         batch["query_gt_valid"] & in_ep)
            sizes = jnp.tile(jnp.asarray([list(tc)]),
                             (batch["query_images"].shape[0], 1))
            return model.apply(
                {"params": p}, batch["support_images"],
                batch["support_boxes"], batch["support_box_valid"],
                batch["query_images"], gt, batch["episode_class_ids"],
                rng, anchors, grid.level_splits, sizes, shot,
                axis, cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN,
                cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
                rpn_pre_nms=cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN,
                method=FewShotRCNN.forward_episodic_train)

        make_local_step = self._sgd_step_factory(tx, loss_apply)

        from ..train.steps import finalize_step
        k = max(1, cfg.TPU.get("STEPS_PER_CALL", 1))
        step = finalize_step(make_local_step, mesh, with_rng=True,
                             steps_per_call=k)
        loader = self._episodic_loader(cfg, mesh)
        state = self._train_loop(cfg, mesh, state, step, loader, schedule,
                                 ckpt, writer, checker, episodic=True)
        return model, state

    def _train_pretrain_rcnn(self, cfg, model, params):
        """Plain Faster R-CNN training (TFA-RCNN finetune / pretrain):
        standard RPN + ROI losses, no hypernetwork."""
        mesh, tx, schedule, state, ckpt, writer, checker = \
            self._common_train_setup(cfg, params)
        tc = tuple(cfg.TPU.TRAIN_CANVAS)
        grid = build_anchor_grid(
            tc, sizes=tuple(s[0] for s in cfg.MODEL.ANCHOR_GENERATOR.SIZES))
        anchors = jnp.asarray(grid.anchors)

        def loss_apply(p, batch, rng, axis):
            gt = GTBoxes(batch["gt_boxes"], batch["gt_labels"],
                         batch["gt_valid"])
            sizes = jnp.tile(jnp.asarray([list(tc)]),
                             (batch["images"].shape[0], 1))
            return model.apply(
                {"params": p}, batch["images"], gt, rng, anchors,
                grid.level_splits, sizes, axis,
                cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN,
                cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
                rpn_pre_nms=cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN,
                method=FewShotRCNN.forward_pretrain_train)

        make_local_step = self._sgd_step_factory(tx, loss_apply)

        from ..train.steps import finalize_step
        k = max(1, cfg.TPU.get("STEPS_PER_CALL", 1))
        step = finalize_step(make_local_step, mesh, with_rng=True,
                             steps_per_call=k)
        loader = self._pretrain_loader(cfg, mesh)
        state = self._train_loop(cfg, mesh, state, step, loader, schedule,
                                 ckpt, writer, checker, episodic=True)
        return model, state


class TFAFasterRCNNRunner(MetaFasterRCNNRunner):
    """TFA two-stage baseline — the reference GeneralizedRCNNFewShot
    (meta_arch/tfa_rcnn.py:18-34: a plain GeneralizedRCNN whose ctor
    freezes backbone / proposal generator / roi box-head features by
    flag) finetuned with the cosine ROI output layer
    (roi_heads/tfa_fast_rcnn.py:22-86 CosineSimOutputLayers). Training
    runs the plain (non-episodic) pretrain path; freezing is the
    optimizer mask; base-class classifier rows are transplanted from
    the pretrained base detector (the TFA 'two-stage fine-tuning'
    weight surgery, analogous to the one-stage fcos.py:344-380)."""

    @classmethod
    def get_default_cfg(cls) -> CfgNode:
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
                                  self._preload_roi_cls_rows(cfg, params))
        return model, params

    def _preload_roi_cls_rows(self, cfg, params):
        """TFA surgery for the two-stage head: copy the pretrained
        base-class classifier rows (and the background row) from the
        base detector's ``box_head`` into the expanded all-classes
        head at the positions the current dataset assigns them. The
        base checkpoint may carry a linear ``cls_score`` (plain base
        pretrain) or a ``cosine_weight``; the target head may be
        either as well — only the row direction matters for the
        cosine layer, so a linear->cosine transplant is exact up to
        the per-row normalization the cosine layer applies anyway."""
        import logging

        from ..data.catalog import DatasetCatalog, MetadataCatalog
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
                    "[TFA-RCNN] cls surgery REQUESTED but MODEL.WEIGHTS="
                    "%r could not be read natively (%s) — surgery "
                    "SKIPPED, base rows stay at random init", path, e)
                return params
        bh = loaded.get("box_head", {})
        # base rows as (C_base+1, fc_dim): cosine stores rows, the
        # linear cls_score kernel stores columns (fc_dim, C_base+1)
        if "cosine_weight" in bh:
            base_rows = np.asarray(bh["cosine_weight"])
            base_bias = None
        elif "cls_score" in bh and "kernel" in bh.get("cls_score", {}):
            base_rows = np.asarray(bh["cls_score"]["kernel"]).T
            base_bias = np.asarray(bh["cls_score"]["bias"])
        else:
            log.warning(
                "[TFA-RCNN] cls surgery REQUESTED but checkpoint %r has "
                "no box_head classifier — surgery SKIPPED", path)
            return params

        base_map = MetadataCatalog.get(cfg.DATASETS.BASE_CLASSES_SPLIT)
        base_ids = base_map.get("thing_dataset_id_to_contiguous_id")
        if base_ids is None:  # lazily-registered: load the dataset
            base_ids = DatasetCatalog.get(
                cfg.DATASETS.BASE_CLASSES_SPLIT)["metadata"][
                    "thing_dataset_id_to_contiguous_id"]
        cur_ids = DatasetCatalog.get(cfg.DATASETS.TRAIN[0])["metadata"][
            "thing_dataset_id_to_contiguous_id"]

        head = params["box_head"]
        if "cosine_weight" in head:
            w = np.asarray(head["cosine_weight"]).copy()
            n = 0
            for did, bi in base_ids.items():
                if did in cur_ids:
                    w[cur_ids[did]] = base_rows[bi]
                    n += 1
            w[-1] = base_rows[-1]                  # background row
            head["cosine_weight"] = w
        else:
            k = np.asarray(head["cls_score"]["kernel"]).copy()
            b = np.asarray(head["cls_score"]["bias"]).copy()
            n = 0
            for did, bi in base_ids.items():
                if did in cur_ids:
                    k[:, cur_ids[did]] = base_rows[bi]
                    if base_bias is not None:
                        b[cur_ids[did]] = base_bias[bi]
                    n += 1
            k[:, -1] = base_rows[-1]
            if base_bias is not None:
                b[-1] = base_bias[-1]
            head["cls_score"]["kernel"] = k
            head["cls_score"]["bias"] = b
        print(f"[TFA-RCNN] preloaded {n} base classifier rows "
              f"+ background")
        return params
