"""Test-facing re-export of the synthetic dataset builders.

The builders live in the package (``sylph_tpu.data.synthetic``) because
SYLPH_TEST_MODE auto-generates its dataset from a production entrypoint
(tools/train_net.py) and must not depend on the tests tree.
"""

from sylph_tpu.data.synthetic import (  # noqa: F401
    ALL_IDS,
    BASE_IDS,
    LEARNABLE_COLORS,
    NOVEL_IDS,
    make_learnable_coco,
    make_learnable_lvis,
    make_synthetic_coco,
    make_synthetic_lvis,
)
