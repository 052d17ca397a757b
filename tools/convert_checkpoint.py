#!/usr/bin/env python3
"""Convert a detectron2/reference checkpoint to sylph_tpu params (.npz).

  python tools/convert_checkpoint.py --src model_final.pth \
      --out converted.npz [--report]

The output loads via MODEL.WEIGHTS (runner._load_weights handles .npz).
--report prints which target subtrees were produced and any source keys
left unmapped — the checklist for accuracy-parity runs.
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
    p.add_argument("--report", action="store_true")
    args = p.parse_args()

    from sylph_tpu.utils.convert_weights import (
        convert_detectron2_checkpoint, load_torch_state_dict)

    sd = load_torch_state_dict(args.src)
    params = convert_detectron2_checkpoint(
        sd, num_tower_convs=args.num_tower_convs)
    flat = flatten(params)
    np.savez(args.out, **flat)
    print(f"wrote {len(flat)} arrays "
          f"({sum(v.size for v in flat.values())/1e6:.2f}M params) "
          f"to {args.out}")

    if args.report:
        subtrees = sorted({k.split("/")[0] for k in flat})
        print("target subtrees:", subtrees)
        mapped_hint = ("backbone.", "proposal_generator.fcos_head.",
                       "code_generator.", "backbone.fpn", "backbone.top_block")
        unmapped = [k for k in sd
                    if not any(k.startswith(h) for h in mapped_hint)
                    and "momentum" not in k and "anchor" not in k]
        if unmapped:
            print(f"unmapped source keys ({len(unmapped)}):")
            for k in sorted(unmapped)[:40]:
                print("  ", k)


if __name__ == "__main__":
    main()
