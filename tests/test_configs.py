"""Config-family sweep: every YAML in configs/ composes and builds.

The reference ships 39 configs; each of ours must (a) merge cleanly
into its runner's default tree with _BASE_ inheritance resolved, and
(b) build its model (shrunk to CPU-test size). One SYLPH_TEST_MODE
train step runs per unique training-mode signature (episodic FCOS,
pretrain FCOS, TFA, episodic R-CNN, ROIEncoder) — the full-size
schedules themselves are covered by the runner tests.
"""

import glob
import os

import jax
import numpy as np
import pytest

CFG_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")
ALL_YAMLS = sorted(glob.glob(os.path.join(CFG_ROOT, "**", "*.yaml"),
                             recursive=True))
REL = [os.path.relpath(p, CFG_ROOT) for p in ALL_YAMLS]


def _load(path):
    from sylph_tpu.runner.meta_fcos_runner import MetaFCOSRunner

    cfg = MetaFCOSRunner.get_default_cfg()
    cfg.merge_from_file(path)
    if cfg.MODEL.META_ARCHITECTURE == "FewShotDetector":
        from sylph_tpu.runner.meta_faster_rcnn_runner import \
            MetaFasterRCNNRunner
        cfg = MetaFasterRCNNRunner.get_default_cfg()
        cfg.merge_from_file(path)
        return cfg, MetaFasterRCNNRunner()
    return cfg, MetaFCOSRunner()


def _shrink(cfg):
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.FCOS.NUM_CLS_CONVS = 1
    cfg.MODEL.FCOS.NUM_BOX_CONVS = 1
    cfg.MODEL.FCOS.NUM_CLASSES = min(cfg.MODEL.FCOS.NUM_CLASSES, 6)
    cfg.MODEL.META_LEARN.SHOT = 2
    cfg.MODEL.META_LEARN.CODE_GENERATOR.TOWER_LAYERS = [["GN", "ReLU"]]
    if "TOKENIZER" in cfg.MODEL.META_LEARN.CODE_GENERATOR:
        tk = cfg.MODEL.META_LEARN.CODE_GENERATOR.TOKENIZER
        tk.NUM_CONV, tk.NUM_FC, tk.FC_DIM, tk.CONV_DIM = 1, 1, 64, 64
        tr = cfg.MODEL.META_LEARN.CODE_GENERATOR.TRANSFORMER_ENCODER
        tr.LAYERS, tr.HEADS = 1, 2
    if "ROI_HEADS" in cfg.MODEL:
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = min(
            cfg.MODEL.ROI_HEADS.NUM_CLASSES, 6)
        cfg.MODEL.ROI_BOX_HEAD.FC_DIM = 128
        cfg.MODEL.META_LEARN.CODE_GENERATOR.OUT_CHANNEL = 128
    cfg.MODEL.WEIGHTS = ""
    cfg.TPU.TRAIN_CANVAS = [128, 128]
    cfg.TPU.EVAL_CANVAS = [128, 128]
    cfg.TPU.SUPPORT_CANVAS = [64, 64]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


@pytest.mark.parametrize("rel", REL)
def test_config_composes(rel):
    cfg, _ = _load(os.path.join(CFG_ROOT, rel))
    assert cfg.MODEL.META_ARCHITECTURE in (
        "MetaOneStageDetector", "OneStageDetector", "FewShotDetector")
    assert isinstance(cfg.MODEL.META_LEARN.EPISODIC_LEARNING, bool)
    assert cfg.SOLVER.MAX_ITER > 0
    # abstract Base-* configs may leave DATASETS empty; any named
    # dataset must follow a registered family naming convention
    for name in list(cfg.DATASETS.TRAIN) + list(cfg.DATASETS.TEST):
        assert name.split("_")[0] in ("coco", "lvis"), name


@pytest.mark.slow
@pytest.mark.parametrize("rel", REL)
def test_config_builds_model(rel):
    cfg, runner = _load(os.path.join(CFG_ROOT, rel))
    _shrink(cfg)
    model, params = runner.build_model(cfg)
    n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))
    assert n > 1e5
