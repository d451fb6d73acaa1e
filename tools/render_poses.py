#!/usr/bin/env python
"""Pose-rendering smoke tool (reference tools/render_poses.py /
synthesizer.render_poses_color): rasterize model overlays for given poses."""

from __future__ import annotations

import _init_paths  # noqa: F401

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--imdb", default="lov_syn_val")
    parser.add_argument("--frame", type=int, default=0)
    parser.add_argument("--output", default="output/render_poses")
    parser.add_argument("--alpha", type=float, default=0.6)
    args = parser.parse_args()

    import cv2

    from posecnn_tpu.data.factory import get_imdb
    from posecnn_tpu.data.synthetic import Mesh
    from posecnn_tpu.native import SceneBuffers, rasterize_mesh

    ds = get_imdb(args.imdb)
    f = ds.load_frame(args.frame)
    H, W = f.color.shape[:2]
    buf = SceneBuffers(H, W)
    for j in range(f.poses.shape[2]):
        c = int(f.cls_indexes[j])
        pts = np.asarray(ds._points_all[c])
        pts = pts[pts.any(axis=1)]
        mesh = Mesh.from_points(pts)
        rasterize_mesh(buf, mesh.vertices, mesh.faces, f.poses[:, :, j],
                       f.intrinsic_matrix, c)
    overlay = f.color.copy().astype(np.float32)
    mask = buf.label > 0
    rendered = buf.color[:, :, ::-1].astype(np.float32)  # RGB -> BGR
    overlay[mask] = (1 - args.alpha) * overlay[mask] + args.alpha * rendered[mask]
    os.makedirs(args.output, exist_ok=True)
    out = os.path.join(args.output, f"{args.frame:06d}-poses.png")
    cv2.imwrite(out, overlay.astype(np.uint8))
    print(f"rendered {f.poses.shape[2]} objects -> {out}")


if __name__ == "__main__":
    main()
