"""SylphPredictor API tests: incremental registration + single-image call."""

import numpy as np
import pytest

from sylph_tpu.predictor import ClassCodeBank, SylphPredictor
from sylph_tpu.runner.meta_fcos_runner import MetaFCOSRunner


def test_code_bank_incremental():
    bank = ClassCodeBank(capacity=4, channels=8)
    i0 = bank.add("cat", np.ones(8), -4.0)
    i1 = bank.add("dog", np.full(8, 2.0), -3.0)
    assert (i0, i1) == (0, 1)
    assert bank.num_classes == 2
    assert bank.names[:2] == ["cat", "dog"]
    code = bank.as_code()
    assert code["cls_conv"].shape == (4, 8)
    np.testing.assert_allclose(np.asarray(code["cls_conv"][1]), 2.0)
    assert bool(bank.valid[1]) and not bool(bank.valid[2])


@pytest.mark.slow
def test_predictor_register_and_call(tmp_path):
    runner = MetaFCOSRunner()
    cfg = runner.get_default_cfg()
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.FCOS.NUM_CLS_CONVS = 1
    cfg.MODEL.FCOS.NUM_BOX_CONVS = 1
    cfg.MODEL.FCOS.NUM_CLASSES = 6
    cfg.MODEL.META_LEARN.EPISODIC_LEARNING = True
    cfg.MODEL.META_LEARN.SHOT = 2
    cfg.MODEL.META_LEARN.CODE_GENERATOR.TOWER_LAYERS = [["GN", "ReLU"]]
    cfg.TPU.TRAIN_CANVAS = [128, 128]
    cfg.TPU.EVAL_CANVAS = [128, 160]
    cfg.TPU.SUPPORT_CANVAS = [64, 64]
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.INPUT.MIN_SIZE_TEST = 96
    cfg.INPUT.MAX_SIZE_TEST = 160

    pred = SylphPredictor(cfg=cfg, max_classes=8)
    rng = np.random.RandomState(0)
    support = [rng.randint(0, 255, (80, 100, 3), np.uint8) for _ in range(2)]
    boxes = [np.array([10, 10, 60, 70], np.float32) for _ in range(2)]
    idx = pred.register_class("widget", support, boxes)
    assert idx == 0
    assert pred.bank.num_classes == 1

    out = pred(rng.randint(0, 255, (120, 150, 3), np.uint8))
    assert set(out) >= {"boxes", "scores", "classes", "class_names"}
    # any detections must name the registered class and fit the image
    for name in out["class_names"]:
        assert name == "widget"
    if len(out["boxes"]):
        assert out["boxes"][:, 0::2].max() <= 150 + 1e-3
        assert out["boxes"][:, 1::2].max() <= 120 + 1e-3

    # registering a second class does not recompile the query graph
    pred.register_class("gadget", support, boxes)
    out2 = pred(rng.randint(0, 255, (120, 150, 3), np.uint8))
    assert set(out2["class_names"]) <= {"widget", "gadget"}
