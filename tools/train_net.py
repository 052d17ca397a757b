#!/usr/bin/env python3
"""CLI: train / eval a Sylph-TPU model.

Equivalent of the reference launcher (tools/train_net.py:109-119 +
tools/setup.py):

  python tools/train_net.py --runner MetaFCOSRunner \
      --config-file sylph://COCO-Detection/Meta-FCOS/Meta-FCOS-finetune.yaml \
      [--eval-only] [--resume] [--datasets-root datasets/coco] \
      [opts KEY VALUE ...]

Differences by design: no process spawning — one process drives the
whole device mesh (jax.distributed handles multi-host); SYLPH_TEST_MODE
shrinks batch/iters/shots exactly like the reference's test-mode shrink
(tools/setup.py:170-186).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def apply_test_mode(cfg):
    """SYLPH_TEST_MODE shrink (reference tools/setup.py:170-186)."""
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 10
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.MODEL.META_LEARN.SHOT = 2
    cfg.MODEL.META_LEARN.EVAL_SHOT = 2
    cfg.MODEL.META_LEARN.CLASS = 2
    cfg.TEST.REPEAT_TEST = 1
    cfg.TPU.TEST_MODE = True
    return cfg


def auto_scale_world_size(cfg):
    """Rescale when the device count differs from REFERENCE_WORLD_SIZE
    (reference tools/setup.py:273 semantics), preferring EXACT emulation.

    When fewer devices than the reference world and the batch divides
    evenly, the reference run is emulated exactly by keeping the global
    batch / LR / schedule and accumulating ``ref/world`` micro-steps per
    optimizer step (``TPU.GRAD_ACCUM``). Each micro-group is then
    exactly one reference rank — crucially this preserves the episodic
    "way" (a rank's E episodes are the classes every query is
    classified against, fcos.py:625-667): the linear-scaling fallback
    shrinks the batch and with it the way, which measurably degrades
    few-shot discrimination (way-8 AP 84.5 vs way-1 AP 54.8-57.2 on the
    quality-loop set at IDENTICAL final train losses — see
    ARCHITECTURE.md "auto-scale diagnosis")."""
    import jax
    ref = cfg.SOLVER.REFERENCE_WORLD_SIZE
    if not ref:
        return cfg
    world = jax.device_count()
    if world == ref:
        return cfg
    if (world < ref and ref % world == 0
            and cfg.SOLVER.IMS_PER_BATCH % ref == 0):
        m = ref // world
        cap = cfg.TPU.get("PRETRAIN_MICRO_BATCH", 0)
        if not cfg.MODEL.META_LEARN.EPISODIC_LEARNING and cap > 0:
            # Non-episodic: a micro-group is NOT a semantic unit (no
            # per-rank "way"), so grad accumulation is exact at ANY
            # micro size (tests/test_train.py::
            # test_grad_accum_matches_full_batch_pretrain) and m is
            # purely a throughput/memory knob. Rank-exact 2-image
            # micros waste the MXU: the batch-128/1024² pretrain step
            # measures 5.9 s at micro 2 vs 3.2 s at micro 8
            # (tools/bench_pretrain_accum.py; micro 16 OOMs a v5e).
            per_dev = cfg.SOLVER.IMS_PER_BATCH // world
            m = max(1, -(-per_dev // cap))  # ceil(per_dev / cap)
            while per_dev % m:
                m += 1
        if cfg.TPU.GRAD_ACCUM <= 1:
            cfg.TPU.GRAD_ACCUM = m
        cfg.SOLVER.REFERENCE_WORLD_SIZE = world
        print(f"[setup] emulating {ref} ranks on {world} device(s) via "
              f"TPU.GRAD_ACCUM={cfg.TPU.GRAD_ACCUM} (exact semantics: "
              f"batch {cfg.SOLVER.IMS_PER_BATCH}, lr "
              f"{cfg.SOLVER.BASE_LR:.2e}, schedule unchanged)")
        return cfg
    scale = world / ref
    old_batch = cfg.SOLVER.IMS_PER_BATCH
    cfg.SOLVER.IMS_PER_BATCH = max(
        int(round(old_batch * scale)), world)
    # linear-scaling rule against the REALIZED batch ratio, not the
    # world ratio: when the scaled batch clamps (e.g. 8 imgs / 16 ranks
    # -> 0.5 -> 1 img on 1 chip, an 8x shrink, not 16x), scaling LR by
    # the world ratio halves the per-example LR and stretches the
    # schedule 2x past equivalence (measured: AP 58.2 vs the 82.8
    # unscaled baseline on the quality-loop set; see ARCHITECTURE.md).
    scale = cfg.SOLVER.IMS_PER_BATCH / old_batch
    inv = 1.0 / max(scale, 1e-9)
    cfg.SOLVER.BASE_LR *= scale
    # every iteration-domain quantity stretches with the schedule —
    # d2go's default_scale_d2_configs scales warmup/checkpoint/eval
    # periods alongside max_iter/steps (missing WARMUP_ITERS was a real
    # divergence: a x16-stretched schedule kept a 16x-relatively-shorter
    # warmup)
    cfg.SOLVER.MAX_ITER = int(round(cfg.SOLVER.MAX_ITER * inv))
    cfg.SOLVER.STEPS = [int(round(s * inv)) for s in cfg.SOLVER.STEPS]
    cfg.SOLVER.WARMUP_ITERS = int(round(cfg.SOLVER.WARMUP_ITERS * inv))
    cfg.SOLVER.CHECKPOINT_PERIOD = int(
        round(cfg.SOLVER.CHECKPOINT_PERIOD * inv))
    if cfg.TEST.EVAL_PERIOD:
        cfg.TEST.EVAL_PERIOD = int(round(cfg.TEST.EVAL_PERIOD * inv))
    cfg.SOLVER.REFERENCE_WORLD_SIZE = world
    print(f"[setup] auto-scaled world size {ref} -> {world} "
          f"(lr {cfg.SOLVER.BASE_LR:.2e}, batch {cfg.SOLVER.IMS_PER_BATCH}, "
          f"warmup {cfg.SOLVER.WARMUP_ITERS})")
    if (cfg.MODEL.META_LEARN.EPISODIC_LEARNING
            and cfg.SOLVER.IMS_PER_BATCH < old_batch):
        print(f"[setup] WARNING: episodic batch shrank {old_batch} -> "
              f"{cfg.SOLVER.IMS_PER_BATCH}, which shrinks the episodic "
              "way (classes per rank) — LR scaling cannot compensate "
              "(measured 84.5 -> ~55 AP on the quality-loop set). "
              "Prefer a batch divisible by REFERENCE_WORLD_SIZE so the "
              "exact TPU.GRAD_ACCUM emulation applies.")
    return cfg


def _ensure_test_mode_dataset(root: str) -> None:
    """SYLPH_TEST_MODE is a hermetic smoke: when the COCO tree at
    ``root`` is absent or incomplete, generate the synthetic fixture
    there so the smoke never depends on real data (the reference's test
    mode assumes real COCO; reference tools/setup.py:170-186 only
    shrinks the schedule)."""
    needed = [os.path.join(root, "annotations", "instances_train2017.json"),
              os.path.join(root, "annotations", "instances_val2017.json"),
              os.path.join(root, "train2017"),
              os.path.join(root, "val2017")]
    if all(os.path.exists(p) for p in needed):
        return
    from sylph_tpu.data.synthetic import make_synthetic_coco
    print(f"[test-mode] COCO tree at {root} absent/incomplete; generating "
          "the synthetic COCO fixture")
    make_synthetic_coco(root, n_empty_val=2)


def _ensure_test_mode_lvis(lvis_root: str, coco_root: str) -> None:
    """LVIS counterpart of ``_ensure_test_mode_dataset``."""
    needed = [os.path.join(lvis_root, "lvis_v1_train.json"),
              os.path.join(lvis_root, "lvis_v1_val.json")]
    if all(os.path.exists(p) for p in needed):
        return
    from sylph_tpu.data.synthetic import make_synthetic_lvis
    print(f"[test-mode] LVIS jsons at {lvis_root} absent/incomplete; "
          "generating the synthetic LVIS fixture")
    make_synthetic_lvis(lvis_root, coco_root)


from sylph_tpu.utils.setup import post_mortem_if_fail


@post_mortem_if_fail
def main():
    p = argparse.ArgumentParser()
    p.add_argument("--runner", default="MetaFCOSRunner")
    p.add_argument("--config-file", required=True)
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--resume", action="store_true", default=True)
    p.add_argument("--output-dir", default=None)
    p.add_argument("--datasets-root", default="datasets/coco")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize() "
                        "(single-host mesh needs nothing)")
    p.add_argument("--lvis-root", default="datasets/lvis")
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = p.parse_args()

    from sylph_tpu.data.catalog import register_all_coco, register_all_lvis
    from sylph_tpu.runner.meta_fcos_runner import create_runner

    import sylph_tpu
    sylph_tpu.enable_compilation_cache()

    if args.distributed:
        import jax
        jax.distributed.initialize()

    runner = create_runner(args.runner)
    cfg = runner.get_default_cfg()
    cfg.merge_from_file(args.config_file)
    opts = args.opts
    if opts and opts[0] == "opts":   # argparse REMAINDER keeps the token
        opts = opts[1:]
    if opts:
        cfg.merge_from_list(opts)
    if args.output_dir:
        cfg.OUTPUT_DIR = args.output_dir
    if os.environ.get("SYLPH_TEST_MODE"):
        apply_test_mode(cfg)
        if not args.output_dir:
            # keep the all-zero plumbing-smoke artifacts out of the
            # output root, where they read as a real (failed) eval —
            # canonical AP evidence lives in artifacts/ (see its README)
            cfg.OUTPUT_DIR = os.path.join(cfg.OUTPUT_DIR,
                                          "testmode_smoke")
    auto_scale_world_size(cfg)
    cfg.freeze()

    from sylph_tpu.utils.setup import setup_after_launch
    setup_after_launch(cfg, cfg.OUTPUT_DIR,
                       default_cfg=runner.get_default_cfg())

    uses_lvis = any(n.startswith("lvis") for n in
                    list(cfg.DATASETS.TRAIN) + list(cfg.DATASETS.TEST))
    if os.environ.get("SYLPH_TEST_MODE"):
        _ensure_test_mode_dataset(args.datasets_root)
        if uses_lvis:
            _ensure_test_mode_lvis(args.lvis_root, args.datasets_root)
    register_all_coco(args.datasets_root)
    if uses_lvis:
        register_all_lvis(args.lvis_root, args.datasets_root)

    model, params = runner.build_model(cfg)
    step = 0
    if not args.eval_only:
        model, state = runner.do_train(cfg, model, params)
        params = runner.eval_params(cfg, state)
        s = state.unpack() if hasattr(state, "unpack") else state
        step = int(s.step)
    results = runner.do_test(cfg, model, params, step=step)
    out_path = os.path.join(cfg.OUTPUT_DIR, "eval_results.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2, default=float)
    print(json.dumps({k: v.get("bbox", v) for k, v in results.items()},
                     indent=2, default=float))


if __name__ == "__main__":
    main()
