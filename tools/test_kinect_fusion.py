#!/usr/bin/env python
"""KinectFusion smoke tool (reference tools/test_kinect_fusion.py): fuse the
demo depth frames into a TSDF volume, raycast, extract the surface."""

from __future__ import annotations

import _init_paths  # noqa: F401

import argparse
import glob
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--images", default="/root/reference/data/demo_images")
    parser.add_argument("--grid", type=int, default=128)
    parser.add_argument("--factor_depth", type=float, default=10000.0)
    parser.add_argument("--output", default="output/kfusion")
    args = parser.parse_args()

    import cv2

    from posecnn_tpu.engine.kfusion import KinectFusion

    K = np.array([[1066.778, 0, 312.9869], [0, 1067.487, 241.3109], [0, 0, 1]], np.float32)
    depths = sorted(glob.glob(os.path.join(args.images, "*-depth.png")))
    if not depths:
        print(f"no depth frames under {args.images}")
        return 1

    kf = KinectFusion(grid_size=args.grid, origin=(-1.5, -1.5, 0.0), voxel_size=3.0 / args.grid)
    for j, path in enumerate(depths):
        depth = cv2.imread(path, cv2.IMREAD_UNCHANGED).astype(np.float32) / args.factor_depth
        kf.feed_data(depth, K)
        if j > 0:
            pose = kf.solve_pose()
            print(f"frame {j}: pose t = {np.asarray(pose)[:, 3]}")
        kf.fuse_depth()
    pts, labels = kf.extract_surface(max_points=8192)
    print(f"surface points: {pts.shape[0]}")
    H, W = depth.shape
    d, hit = kf.render(H, W)
    print(f"raycast hit fraction: {float(np.mean(hit)):.3f}")
    os.makedirs(args.output, exist_ok=True)
    np.save(os.path.join(args.output, "surface.npy"), pts)
    vis = (np.clip(d / max(float(d.max()), 1e-6), 0, 1) * 255).astype(np.uint8)
    cv2.imwrite(os.path.join(args.output, "raycast.png"), vis)
    print(f"artifacts in {args.output}")
    return 0 if pts.shape[0] > 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
