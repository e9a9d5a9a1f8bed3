#!/usr/bin/env python3
"""Build {name}_img_ann.npy from a darknet train.txt — CLI-compatible with
the reference's make_voc_list.py (same positional args, same npy format)."""

import argparse
import sys


def main(train_file: str, output_file: str):
    from k210_yolo_framework_tpu.data.annotations import build_ann_list
    arr = build_ann_list(train_file, output_file)
    print(f"wrote {len(arr)} annotations to {output_file}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("train_file", type=str, help="train.txt file path")
    parser.add_argument("output_file", type=str, help="output file path")
    args = parser.parse_args(sys.argv[1:])
    main(args.train_file, args.output_file)
