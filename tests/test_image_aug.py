"""Device RandAugment vs the Pillow host path (ops/image_aug.py).

The device kernels claim bit-faithful Pillow semantics on the content
region of a padded canvas — these tests pin each op against
PIL.ImageOps/ImageEnhance on random images and the full mapper pipeline
in host vs device mode.
"""

import numpy as np
import pytest

from sylph_tpu.data import transforms as T
from sylph_tpu.ops.image_aug import rand_augment_device

H, W = 48, 64  # canvas
CH, CW = 37, 53  # content


def _rand_content(seed):
    return np.random.RandomState(seed).randint(
        0, 256, (CH, CW, 3), np.uint8)


def _device_apply(content_rgb, op_id, param):
    """Run one op through the batched device kernel (BGR canvas like
    production) and return the RGB content region."""
    canvas = np.zeros((1, H, W, 3), np.uint8)
    canvas[0, :CH, :CW] = content_rgb[:, :, ::-1]  # BGR
    out = np.asarray(rand_augment_device(
        canvas, np.array([[op_id]], np.int32),
        np.array([[param]], np.float32),
        np.array([[CH, CW]], np.int32), bgr=True))
    assert out.dtype == np.uint8
    # padding must stay exactly zero
    assert out[0, CH:].max() == 0 and out[0, :, CW:].max() == 0
    return out[0, :CH, :CW, ::-1]  # back to RGB


_PARAMS = {"autocontrast": 0.0, "equalize": 0.0, "color": 1.37,
           "contrast": 0.61, "brightness": 1.24, "sharpness": 0.55,
           "posterize": 3.0, "solarize": 77.0}
_EXACT = {"posterize", "solarize", "autocontrast", "equalize"}


@pytest.mark.parametrize("name", T._COLOR_OPS)
def test_op_parity_vs_pillow(name):
    from PIL import Image

    op_id = T._COLOR_OPS.index(name)
    param = _PARAMS[name]
    for seed in (0, 1, 2):
        content = _rand_content(seed)
        ref = np.asarray(T.apply_color_op(
            Image.fromarray(content), name, param))
        got = _device_apply(content, op_id, param)
        diff = np.abs(ref.astype(int) - got.astype(int))
        if name in _EXACT:
            assert diff.max() == 0, f"{name}: max diff {diff.max()}"
        else:
            # blends truncate a float32 (device) vs double (Pillow)
            # product — allow 1 LSB on a vanishing fraction of pixels
            assert diff.max() <= 1, f"{name}: max diff {diff.max()}"
            assert (diff == 0).mean() > 0.99, \
                f"{name}: only {(diff == 0).mean():.3f} exact"


def test_low_contrast_image_identity_guards():
    """Constant channels hit the hi<=lo / step==0 identity branches."""
    content = np.full((CH, CW, 3), 99, np.uint8)
    for name in ("autocontrast", "equalize"):
        got = _device_apply(content, T._COLOR_OPS.index(name), 0.0)
        np.testing.assert_array_equal(got, content)


def test_mapper_device_mode_matches_host_mode(tmp_path):
    """map_query_train in device mode + rand_augment_device == host-mode
    output (same seed): drawn ids share the rng stream and the deferred
    flip commutes with every color op."""
    from PIL import Image

    from sylph_tpu.data.mapper import EpisodicMapper

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (90, 120, 3), np.uint8)
    path = str(tmp_path / "im.png")  # png: no jpeg loss, no draft
    Image.fromarray(img).save(path)
    rec = {"file_name": path, "height": 90, "width": 120,
           "annotations": [{"bbox": [10, 10, 60, 50], "category_id": 1}]}
    kw = dict(train_canvas=(64, 96), eval_canvas=(64, 96),
              support_canvas=(48, 48), max_gt_boxes=5)
    host = EpisodicMapper(rand_augment=True, **kw)
    dev = EpisodicMapper(rand_augment="device", **kw)
    for seed in range(4):
        a = host.map_query_train(rec, np.random.RandomState(seed))
        b = dev.map_query_train(rec, np.random.RandomState(seed))
        np.testing.assert_array_equal(a["gt_boxes"], b["gt_boxes"])
        applied = np.asarray(rand_augment_device(
            b["image"][None], b["aug_ops"][None], b["aug_params"][None],
            b["image_size"][None], bgr=True))[0]
        diff = np.abs(a["image"].astype(int) - applied.astype(int))
        assert diff.max() <= 1, f"seed {seed}: max diff {diff.max()}"
        assert (diff == 0).mean() > 0.99


def test_batched_application_shapes():
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (4, H, W, 3), np.uint8)
    ids = rng.randint(0, 8, (4, 2)).astype(np.int32)
    params = np.ones((4, 2), np.float32)
    sizes = np.tile(np.array([[H, W]], np.int32), (4, 1))
    out = np.asarray(rand_augment_device(imgs, ids, params, sizes))
    assert out.shape == imgs.shape and out.dtype == np.uint8
