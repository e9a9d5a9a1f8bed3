#!/usr/bin/env python3
"""kmeans anchor generation — CLI-compatible with the reference's
make_anchor_list.py (same flags incl. string booleans; same
``data/{set}_anchor.npy`` output; NaN -> "please rerun" warning,
make_anchor_list.py:216-220)."""

import argparse
import sys

import numpy as np


def main(args):
    # kmeans over a few thousand wh pairs is host-scale work: pin the whole
    # process to the CPU backend so no accelerator handshake is paid.
    import jax
    jax.config.update("jax_platforms", "cpu")

    from k210_yolo_framework_tpu.anchors import generate_anchors
    from k210_yolo_framework_tpu.data.annotations import load_ann_list
    from k210_yolo_framework_tpu.utils import ERROR, NOTE

    ann = load_ann_list(f"data/{args.train_set}_img_ann.npy")
    layers = len(args.out_hw) // 2
    want_plot = str(args.is_plot).lower() == "true"
    history: list = []
    centroids = generate_anchors(
        ann, tuple(args.in_hw), layers, args.anchor_num,
        max_iters=args.max_iters,
        is_random=(str(args.is_random).lower() == "true"),
        low=tuple(args.low), high=tuple(args.high),
        history_sink=history if want_plot else None)

    if np.any(np.isnan(centroids)):
        print(ERROR, "Result have NaN value please Rerun!")
        return 1
    print(NOTE, f"Now anchors are :\n{centroids}")
    np.save(f"data/{args.train_set}_anchor.npy", centroids)

    if want_plot:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            # iteration-history progress plot (the reference's plotData-style
            # view, make_anchor_list.py:85-103): gt wh scatter + each
            # centroid's trajectory across kmeans iterations.
            if history:
                x, hist = history[0]
                plt.scatter(x[:, 0], x[:, 1], s=4, c="#9ecae1", label="gt wh")
                for j in range(hist.shape[1]):
                    plt.plot(hist[:, j, 0], hist[:, j, 1], "-o", ms=2, lw=0.8)
            flat = centroids.reshape(-1, 2)
            plt.scatter(flat[:, 0], flat[:, 1], c="r", marker="x", zorder=5,
                        label="final anchors")
            plt.xlabel("w")
            plt.ylabel("h")
            plt.legend(loc="lower right", fontsize=8)
            plt.savefig(f"data/{args.train_set}_anchor.png")
            print(NOTE, f"anchor plot saved to data/{args.train_set}_anchor.png")
        except ImportError:
            print(NOTE, "matplotlib unavailable; skipping plot")
    return 0


def parse_arguments(argv):
    parser = argparse.ArgumentParser()
    parser.add_argument("train_set", type=str)
    parser.add_argument("--max_iters", type=int, default=10)
    parser.add_argument("--is_random", type=str, default="True")
    parser.add_argument("--is_plot", type=str, default="True")
    parser.add_argument("--in_hw", type=int, default=(224, 320), nargs="+")
    parser.add_argument("--out_hw", type=int, default=(7, 10, 14, 20), nargs="+")
    parser.add_argument("--low", type=float, default=(0.0, 0.0), nargs="+")
    parser.add_argument("--high", type=float, default=(1.0, 1.0), nargs="+")
    parser.add_argument("--anchor_num", type=int, default=3)
    return parser.parse_args(argv)


if __name__ == "__main__":
    sys.exit(main(parse_arguments(sys.argv[1:])))
