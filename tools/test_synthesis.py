#!/usr/bin/env python
"""Synthetic-renderer smoke tool (reference tools/test_synthesis.py: render
scenes with the synthesizer and visualize). Writes color/label/depth PNGs."""

from __future__ import annotations

import _init_paths  # noqa: F401

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--imdb", default="lov_syn_val")
    parser.add_argument("--num", type=int, default=4)
    parser.add_argument("--output", default="output/synthesis")
    args = parser.parse_args()

    import cv2

    from posecnn_tpu.data.factory import get_imdb

    ds = get_imdb(args.imdb)
    os.makedirs(args.output, exist_ok=True)
    for i in range(args.num):
        f = ds.load_frame(i)
        base = os.path.join(args.output, f"{i:06d}")
        cv2.imwrite(base + "-color.png", f.color)
        # label visualization: scale ids into the visible range
        vis = (f.label.astype(np.float32) * (255.0 / max(ds.num_classes - 1, 1))).astype(np.uint8)
        cv2.imwrite(base + "-label.png", vis)
        if f.depth is not None:
            cv2.imwrite(base + "-depth.png", f.depth.astype(np.uint16))
        print(
            f"{i:06d}: classes {sorted(set(int(c) for c in f.cls_indexes))} "
            f"fg_px={int((f.label > 0).sum())}"
        )
    print(f"wrote {args.num} frames to {args.output}")


if __name__ == "__main__":
    main()
