#!/usr/bin/env python3
"""t-SNE / PCA scatter of synthesized class codes (reference
tools/visualize_class_codes.py:74-119).

  python tools/visualize_class_codes.py --code-dir out/class_codes/<ds> \
      --out codes.png [--method pca]

Falls back from sklearn t-SNE to a pure-numpy PCA when sklearn is absent.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_codes(code_dir):
    names, vecs = [], []
    for fname in sorted(os.listdir(code_dir)):
        if fname.endswith(".npz"):
            data = np.load(os.path.join(code_dir, fname))
            vecs.append(np.asarray(data["cls_conv"]).reshape(-1))
            names.append(fname[:-4])
    return names, np.stack(vecs)


def embed(x, method):
    if method == "tsne":
        try:
            from sklearn.manifold import TSNE
            return TSNE(n_components=2,
                        perplexity=min(30, len(x) - 1)).fit_transform(x)
        except ImportError:
            print("sklearn unavailable; falling back to PCA")
    x = x - x.mean(0)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    return x @ vt[:2].T


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--code-dir", required=True)
    p.add_argument("--out", default="class_codes.png")
    p.add_argument("--method", choices=["tsne", "pca"], default="tsne")
    args = p.parse_args()

    names, vecs = load_codes(args.code_dir)
    xy = embed(vecs, args.method)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(10, 10))
        ax.scatter(xy[:, 0], xy[:, 1], s=12)
        for (x, y), n in zip(xy, names):
            ax.annotate(n, (x, y), fontsize=6)
        ax.set_title(f"class codes ({args.method})")
        fig.savefig(args.out, dpi=150)
        print(f"wrote {args.out}")
    except ImportError:
        np.savetxt(args.out + ".txt",
                   np.column_stack([xy, np.arange(len(names))]),
                   header="x y idx  # " + " ".join(names))
        print(f"matplotlib unavailable; wrote coordinates to {args.out}.txt")


if __name__ == "__main__":
    main()
