#!/usr/bin/env python3
"""Convert a detectron2/reference checkpoint to sylph_tpu params (.npz).

  python tools/convert_checkpoint.py --src model_final.pth \
      --out converted.npz [--allow-unmapped]

The output loads via MODEL.WEIGHTS (runner._load_weights handles .npz).
Every run prints the per-module-family matched/unmatched audit and
EXITS NONZERO if any non-ignorable source key went unmapped — an
unmapped weight would silently stay at random init in the target model
(reference module registration: fcos.py:382-531). --allow-unmapped
downgrades that to a warning for deliberately partial conversions.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten(v, p))
        else:
            out[p] = np.asarray(v)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True, help=".pth or .pkl checkpoint")
    p.add_argument("--out", required=True, help="output .npz path")
    p.add_argument("--num-tower-convs", type=int, default=4)
    p.add_argument("--allow-unmapped", action="store_true",
                   help="warn instead of failing on unmapped source keys")
    args = p.parse_args()

    from sylph_tpu.utils.convert_weights import (
        convert_detectron2_checkpoint, load_torch_state_dict)

    sd = load_torch_state_dict(args.src)
    report = {}
    params = convert_detectron2_checkpoint(
        sd, num_tower_convs=args.num_tower_convs, report=report)
    flat = flatten(params)
    np.savez(args.out, **flat)
    print(f"wrote {len(flat)} arrays "
          f"({sum(v.size for v in flat.values())/1e6:.2f}M params) "
          f"to {args.out}")

    print("target subtrees:", sorted({k.split("/")[0] for k in flat}))
    for fam, stats in report["by_family"].items():
        if stats["matched"] or stats["unmatched"]:
            print(f"  {fam:16s} matched {stats['matched']:4d}  "
                  f"unmatched {len(stats['unmatched'])}")
    if report["ignored"]:
        print(f"  ignored (non-weight) keys: {len(report['ignored'])}")
    if report["unmatched"]:
        print(f"UNMAPPED source keys ({len(report['unmatched'])}) — these "
              "weights would stay at RANDOM INIT:")
        for k in report["unmatched"][:40]:
            print("  ", k)
        if not args.allow_unmapped:
            sys.exit(1)


if __name__ == "__main__":
    main()
