"""Self-contained serving demo: register a class from synthetic support
crops, then detect it — no datasets, no checkpoints.

  python -m sylph_tpu.tools.demo_inference [--depth 50] [--canvas 512]

Exercises the whole serving path on whatever device JAX picks (TPU when
attached): backbone → code generator → bank registration
(dynamic_update_slice, no recompile) → conditioned query inference →
Pallas NMS → decections, with timing for each stage.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--depth", type=int, default=50)
    p.add_argument("--canvas", type=int, default=512)
    p.add_argument("--shots", type=int, default=5)
    args = p.parse_args()

    import jax
    from sylph_tpu.predictor import SylphPredictor
    from sylph_tpu.runner.meta_fcos_runner import MetaFCOSRunner

    print(f"device: {jax.devices()[0]}")
    cfg = MetaFCOSRunner.get_default_cfg()
    cfg.MODEL.RESNETS.DEPTH = args.depth
    cfg.MODEL.META_LEARN.EPISODIC_LEARNING = True
    cfg.MODEL.META_LEARN.SHOT = args.shots
    cfg.TPU.EVAL_CANVAS = [args.canvas, args.canvas]
    cfg.TPU.SUPPORT_CANVAS = [256, 256]
    cfg.INPUT.MIN_SIZE_TEST = args.canvas - 64
    cfg.INPUT.MAX_SIZE_TEST = args.canvas

    t0 = time.perf_counter()
    pred = SylphPredictor(cfg=cfg, max_classes=64)
    print(f"model built+initialized in {time.perf_counter()-t0:.1f}s "
          f"(random weights — demo)")

    rng = np.random.RandomState(0)
    support = []
    boxes = []
    for _ in range(args.shots):
        img = rng.randint(0, 80, (300, 400, 3), np.uint8)
        img[60:200, 100:320] = [200, 40, 40]  # the "object"
        support.append(img)
        boxes.append(np.array([100, 60, 320, 200], np.float32))

    t0 = time.perf_counter()
    pred.register_class("red-widget", support, boxes)
    print(f"registered 'red-widget' from {args.shots} shots in "
          f"{time.perf_counter()-t0:.2f}s (includes compile)")

    query = rng.randint(0, 80, (360, 480, 3), np.uint8)
    query[100:260, 120:380] = [200, 40, 40]
    t0 = time.perf_counter()
    out = pred(query)
    print(f"first query (compile) {time.perf_counter()-t0:.2f}s")
    t0 = time.perf_counter()
    out = pred(query)
    print(f"cached query {1e3*(time.perf_counter()-t0):.1f} ms")
    n = len(out["boxes"])
    print(f"{n} detections; top-3:")
    for i in range(min(3, n)):
        print(f"  {out['class_names'][i]}  score={out['scores'][i]:.3f}  "
              f"box={np.round(out['boxes'][i], 1).tolist()}")

    # second registration must NOT recompile the query graph
    pred.register_class("another", support, boxes)
    t0 = time.perf_counter()
    pred(query)
    print(f"query after 2nd registration (no recompile): "
          f"{1e3*(time.perf_counter()-t0):.1f} ms")


if __name__ == "__main__":
    main()
