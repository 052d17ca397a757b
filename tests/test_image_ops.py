"""Device image front-end tests."""

import numpy as np
import jax.numpy as jnp
from PIL import Image

from sylph_tpu.ops.image_ops import (preprocess_batch_device,
                                     resize_shortest_edge_device)


def test_resize_matches_pil_closely():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (60, 90, 3), np.uint8)
    staging = np.zeros((128, 160, 3), np.uint8)
    staging[:60, :90] = img

    out, content = resize_shortest_edge_device(
        jnp.asarray(staging), jnp.asarray([60, 90], jnp.int32),
        out_hw=(128, 160), short=96, max_size=160)
    nh, nw = int(content[0]), int(content[1])
    assert nh == 96 and nw == round(90 * 96 / 60)

    ref = np.asarray(Image.fromarray(img).resize((nw, nh), Image.BILINEAR),
                     np.float32)
    got = np.asarray(out)[:nh, :nw]
    # bilinear implementations differ at edges; interior must be close
    diff = np.abs(got[2:-2, 2:-2] - ref[2:-2, 2:-2])
    assert np.median(diff) < 2.0
    # padding region is zeroed
    assert np.asarray(out)[nh:, :].max() == 0
    assert np.asarray(out)[:, nw:].max() == 0


def test_one_graph_many_sizes():
    """Different source sizes reuse the same compiled graph."""
    staging = jnp.zeros((2, 192, 192, 3), jnp.uint8)
    sizes = jnp.asarray([[60, 90], [100, 50]], jnp.int32)
    out, content = preprocess_batch_device(
        staging, sizes, out_hw=(192, 192), short=96, max_size=192)
    assert out.shape == (2, 192, 192, 3)
    c = np.asarray(content)
    assert c[0][0] == 96      # landscape: short side = height
    assert c[1][1] == 96      # portrait: short side = width


def test_max_size_cap():
    staging = jnp.zeros((128, 256, 3), jnp.uint8)
    out, content = resize_shortest_edge_device(
        staging, jnp.asarray([64, 256], jnp.int32),
        out_hw=(128, 256), short=96, max_size=200)
    # scale capped by max_size on the long side: 200/256
    assert int(content[1]) == 200
