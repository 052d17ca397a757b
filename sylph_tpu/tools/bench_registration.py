"""LVIS-scale class-registration benchmark.

Measures end-to-end wall-clock for registering N classes (default 1203,
the LVIS universe) at EVAL_SHOT support images each through the real
phase-1 path (``evaluation.meta_eval.generate_class_codes``), including
host->device transfer of the uint8 support batches and device->host
fetch of the code rows — i.e. exactly what `do_test` phase 1 or
``SylphPredictor.register_dataset`` pays per class at serving time.

The reference shards this loop over GPU ranks
(/root/reference/sylph/runner/meta_fcos_runner.py:381-439); single-chip
TPU instead batches TPU.CLASS_BATCH classes per dispatch via vmap
(see meta_eval._generate_class_codes_vmapped). This script records the
measured ms/class for both the batched and the 1-class path so the
CLASS_BATCH decision in ARCHITECTURE.md stays tied to numbers.

Usage:  python -m sylph_tpu.tools.bench_registration [--classes 1203]
        [--shot 10] [--class-batch 8] [--single]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from ..evaluation.meta_eval import generate_class_codes
from ..runner.meta_fcos_runner import MetaFCOSRunner


def synthetic_support_loader(n_classes: int, shot: int, canvas,
                             seed: int = 0, distinct: int = 32):
    """Yields items shaped exactly like data.loader.build_support_set_loader
    (uint8 canvases, one padded box slot per shot).

    Pixels come from a pre-generated ring of ``distinct`` tensors:
    drawing 4.4 MB of fresh random uint8 per class costs ~100 ms of
    host RNG on a slow core, which would dominate the measurement —
    the real serving path reads decoded images, it does not synthesize
    them. Boxes still vary per class.
    """
    rng = np.random.RandomState(seed)
    h, w = canvas
    ring = [rng.randint(0, 256, (shot, h, w, 3), dtype=np.uint8)
            for _ in range(min(distinct, n_classes))]
    for ci in range(n_classes):
        x0 = rng.randint(0, w // 2, (shot, 1))
        y0 = rng.randint(0, h // 2, (shot, 1))
        boxes = np.concatenate(
            [x0, y0, x0 + rng.randint(16, w // 2, (shot, 1)),
             y0 + rng.randint(16, h // 2, (shot, 1))], 1
        ).astype(np.float32)                      # (shot, 4)
        yield {
            "support_images": ring[ci % len(ring)],
            "support_boxes": boxes,
            "support_box_valid": np.ones((shot,), bool),
            "class_id": ci,
            "class_name": f"class_{ci:04d}",
        }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--classes", type=int, default=1203)
    ap.add_argument("--shot", type=int, default=10)
    ap.add_argument("--class-batch", type=int, default=None,
                    help="default: cfg.TPU.CLASS_BATCH")
    ap.add_argument("--single", action="store_true",
                    help="also time the 1-class/dispatch path (on a "
                         "subset — it is the slow path)")
    args = ap.parse_args()

    cfg = MetaFCOSRunner.get_default_cfg()
    cfg.MODEL.META_LEARN.EPISODIC_LEARNING = True
    cfg.MODEL.META_LEARN.EVAL_SHOT = args.shot
    cfg.MODEL.META_LEARN.SHOT = args.shot
    cb = args.class_batch or cfg.TPU.CLASS_BATCH

    model, params = MetaFCOSRunner().build_model(cfg)
    canvas = tuple(cfg.TPU.SUPPORT_CANVAS)

    # warmup/compile outside the timed region (one batched dispatch)
    list(generate_class_codes(
        model, params,
        synthetic_support_loader(cb, args.shot, canvas), class_batch=cb))

    t0 = time.perf_counter()
    codes = generate_class_codes(
        model, params,
        synthetic_support_loader(args.classes, args.shot, canvas),
        class_batch=cb)
    wall = time.perf_counter() - t0
    assert len(codes) == args.classes

    result = {
        "classes": args.classes, "shot": args.shot, "class_batch": cb,
        "wall_s": round(wall, 2),
        "ms_per_class": round(wall / args.classes * 1e3, 2),
    }

    if args.single:
        n_single = min(64, args.classes)
        list(generate_class_codes(          # compile the 1-class graph
            model, params,
            synthetic_support_loader(1, args.shot, canvas)))
        t0 = time.perf_counter()
        generate_class_codes(
            model, params,
            synthetic_support_loader(n_single, args.shot, canvas))
        result["ms_per_class_single"] = round(
            (time.perf_counter() - t0) / n_single * 1e3, 2)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
