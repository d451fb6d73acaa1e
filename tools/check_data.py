#!/usr/bin/env python
"""Dataset sanity checker (reference tools/check_data.py:23-29: iterate the
dataset verifying every frame is readable and well-formed)."""

from __future__ import annotations

import _init_paths  # noqa: F401

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--imdb", default="toy_train")
    parser.add_argument("--max_frames", type=int, default=None)
    args = parser.parse_args()

    from posecnn_tpu.data.factory import get_imdb

    ds = get_imdb(args.imdb)
    n = ds.num_images if args.max_frames is None else min(args.max_frames, ds.num_images)
    bad = 0
    for i in range(n):
        try:
            f = ds.load_frame(i)
            assert f.color.ndim == 3 and f.color.shape[2] >= 3, f.color.shape
            assert f.label.shape == f.color.shape[:2], (f.label.shape, f.color.shape)
            assert f.label.max() < ds.num_classes, int(f.label.max())
            assert f.poses.shape[:2] == (3, 4), f.poses.shape
            assert np.isfinite(f.poses).all()
            assert f.intrinsic_matrix.shape == (3, 3)
        except Exception as e:  # noqa: BLE001 — report and continue
            bad += 1
            print(f"frame {i} ({ds.image_index[i]}): BAD — {e}")
        if (i + 1) % 500 == 0:
            print(f"checked {i + 1}/{n}")
    print(f"done: {n - bad}/{n} frames ok")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
