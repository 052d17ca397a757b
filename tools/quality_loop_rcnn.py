"""Quality loop for the TWO-STAGE family: MetaFasterRCNN detects.

The one-stage quality loop (ARCHITECTURE.md, tests/test_quality_loop.py)
proved the assembled Meta-FCOS chain produces real AP; the two-stage
runner previously had only plumbing-level evidence (losses finite).
This driver meta-trains FewShotRCNN briefly on the learnable synthetic
set (tests/fixtures.py::make_learnable_coco) and runs the FULL two-phase
``do_test`` — support registration, RPN proposals, ROI-align, the
code-conditioned box head, NMS, coordinate rescale, numpy COCO
evaluator — mirroring the meaning of the reference two-stage meta-test
(sylph/runner/meta_faster_rcnn_runner.py:25-41 over the shared
meta_fcos_runner.py:451-672 driver).

Usage:
  python tools/quality_loop_rcnn.py --data-root /tmp/learnable_coco \
      --output-dir output/quality_loop_rcnn [--cpu] [--iters 400]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_cfg(runner, iters, lr):
    cfg = runner.get_default_cfg()
    cfg.merge_from_file(
        "sylph://LVISv1-Detection/Meta-RCNN/Meta-RCNN-FPN-finetune.yaml")
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.BACKBONE.FREEZE = False
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 6
    cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 128
    cfg.MODEL.META_LEARN.SHOT = 2
    cfg.MODEL.META_LEARN.EVAL_SHOT = 5
    cfg.MODEL.META_LEARN.CLASS = 3
    cfg.MODEL.META_LEARN.USE_ALL_GTS_IN_BASE_CLASSES = False
    cfg.MODEL.META_LEARN.CODE_GENERATOR.OUT_CHANNEL = 128
    cfg.MODEL.META_LEARN.CODE_GENERATOR.TOWER_LAYERS = [["GN", "ReLU"]]
    cfg.TPU.TRAIN_CANVAS = [128, 128]
    cfg.TPU.EVAL_CANVAS = [128, 128]
    cfg.TPU.SUPPORT_CANVAS = [64, 64]
    cfg.TPU.MAX_GT_BOXES = 10
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.EVAL_BATCH = 4
    cfg.INPUT.MIN_SIZE_TRAIN = [128]
    cfg.INPUT.MIN_SIZE_TEST = 128
    cfg.INPUT.MAX_SIZE_TEST = 128
    cfg.INPUT.USE_SCALE_JITTER = False
    cfg.INPUT.RAND_AUGMENT = False
    # modest proposal budgets: plenty for <=2 GT boxes per 128px image,
    # and they keep the RPN NMS scan short
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 256
    cfg.MODEL.RPN.PRE_NMS_TOPK_TEST = 256
    cfg.MODEL.RPN.POST_NMS_TOPK_TRAIN = 64
    cfg.MODEL.RPN.POST_NMS_TOPK_TEST = 64
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64
    cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST = 0.05
    cfg.TEST.DETECTIONS_PER_IMAGE = 20
    cfg.TEST.REPEAT_TEST = 1
    cfg.SOLVER.IMS_PER_BATCH = 8
    cfg.SOLVER.MAX_ITER = iters
    cfg.SOLVER.BASE_LR = lr
    cfg.SOLVER.WARMUP_ITERS = min(50, iters // 4)
    cfg.SOLVER.STEPS = [int(iters * 0.8)]
    cfg.SOLVER.CHECKPOINT_PERIOD = 10 ** 9
    cfg.DATASETS.TRAIN = ["coco_meta_train_all"]
    cfg.DATASETS.TEST = ["coco_meta_val_all"]
    return cfg


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--output-dir", default="output/quality_loop_rcnn")
    p.add_argument("--iters", type=int, default=400)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--cpu", action="store_true",
                   help="force the virtual CPU mesh (regression mode)")
    args = p.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import sylph_tpu
    sylph_tpu.enable_compilation_cache()
    from sylph_tpu.data.catalog import register_all_coco
    from sylph_tpu.runner.meta_faster_rcnn_runner import MetaFasterRCNNRunner

    if not os.path.exists(os.path.join(args.data_root, "annotations")):
        from sylph_tpu.data.synthetic import make_learnable_coco
        make_learnable_coco(args.data_root, n_train=80, n_val=16,
                            img_hw=(128, 128), n_empty_val=2)
    register_all_coco(args.data_root)

    runner = MetaFasterRCNNRunner()
    cfg = build_cfg(runner, args.iters, args.lr)
    cfg.OUTPUT_DIR = args.output_dir
    cfg.freeze()
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    from sylph_tpu.utils.setup import setup_after_launch
    setup_after_launch(cfg, cfg.OUTPUT_DIR,
                       default_cfg=runner.get_default_cfg())

    model, params = runner.build_model(cfg)
    model, state = runner.do_train(cfg, model, params)
    results = runner.do_test(cfg, model, runner.eval_params(cfg, state))

    out = os.path.join(cfg.OUTPUT_DIR, "eval_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2, default=float)
    bbox = results["coco_meta_val_all"]["bbox"]
    print(json.dumps({k: bbox[k] for k in
                      ("AP", "AP50", "AP75", "nAP", "bAP") if k in bbox},
                     indent=2, default=float))


if __name__ == "__main__":
    main()
