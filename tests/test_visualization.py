"""Episode visualization + predictor device-preprocess path tests."""

import os

import numpy as np
import pytest

from sylph_tpu.evaluation.visualization import visualize_episode


def test_visualize_episode_writes_png(tmp_path):
    rng = np.random.RandomState(0)
    shot = 2
    batch = {
        "support_images": rng.rand(shot, 64, 64, 3).astype(np.float32) * 255,
        "support_boxes": np.tile(np.array([[8, 8, 40, 44.0]], np.float32),
                                 (shot, 1)),
        "query_images": rng.rand(1, 96, 96, 3).astype(np.float32) * 255,
        "query_gt_boxes": np.array([[[10, 10, 50, 60.0],
                                     [0, 0, 0, 0]]], np.float32),
        "query_gt_valid": np.array([[True, False]]),
    }
    out = visualize_episode(batch, str(tmp_path / "vis" / "ep.png"),
                            episode=0, num_shots=shot)
    assert os.path.exists(out)
    from PIL import Image
    img = np.asarray(Image.open(out))
    # grid row: 2 support tiles + 1 query tile, RGB
    assert img.ndim == 3 and img.shape[1] > 96


@pytest.mark.slow
def test_predictor_device_preprocess(tmp_path):
    import jax.numpy as jnp
    from sylph_tpu.predictor import SylphPredictor
    from sylph_tpu.runner.meta_fcos_runner import MetaFCOSRunner

    cfg = MetaFCOSRunner.get_default_cfg()
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

    pred = SylphPredictor(cfg=cfg, max_classes=4)
    rng = np.random.RandomState(0)
    support = [rng.randint(0, 255, (80, 100, 3), np.uint8)
               for _ in range(2)]
    boxes = [np.array([10, 10, 60, 70], np.float32) for _ in range(2)]
    pred.register_class("widget", support, boxes)

    img = rng.randint(0, 255, (120, 150, 3), np.uint8)
    host = pred(img)
    dev = pred(img, device_preprocess=True)
    # both paths produce the same schema and similar detection counts
    # (resize implementations differ slightly at edges)
    assert set(dev) == set(host)
    assert abs(len(dev["boxes"]) - len(host["boxes"])) <= \
        max(3, len(host["boxes"]))
