#!/usr/bin/env python
"""Run PoseCNN on the 5 demo RGB-D frames (mirrors reference tools/demo.py).

The demo camera intrinsics are hard-coded like the reference
(tools/demo.py:101-103).
"""

from __future__ import annotations

import _init_paths  # noqa: F401  (repo-root import bootstrap)

import argparse
import glob
import json
import os

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description="posecnn_tpu demo")
    parser.add_argument("--model", default=None, help="checkpoint / vgg16.npy to load")
    parser.add_argument("--cfg", dest="cfg_file", default=None)
    parser.add_argument(
        "--images", default=os.environ.get("POSECNN_DEMO_IMAGES", "data/demo_images"),
        help="directory with NNNNNN-color.png frames",
    )
    parser.add_argument("--output", default="output/demo")
    parser.add_argument("--visualize", action="store_true")
    parser.add_argument("--device", default="tpu", help="device to use (tpu/cpu)")
    parser.add_argument(
        "--refine", action="store_true",
        help="ICP pose refinement against NNNNNN-depth.png (TEST.POSE_REFINE)",
    )
    return parser.parse_args()


DEMO_K = np.array(
    [[1066.778, 0, 312.9869], [0, 1067.487, 241.3109], [0, 0, 1]], dtype=np.float64
)


def main():
    args = parse_args()
    import cv2
    import jax

    if args.device and args.device != "tpu":
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp

    from posecnn_tpu.core.config import cfg, cfg_from_file
    from posecnn_tpu.data.lov import YCB_CLASSES, YCB_CLASS_COLORS
    from posecnn_tpu.data.minibatch import build_meta_data
    from posecnn_tpu.engine.test import make_inference_fn, postprocess_detections
    from posecnn_tpu.models.posecnn import PoseCNNConfig, init_posecnn_params

    if args.cfg_file:
        cfg_from_file(args.cfg_file)

    model_cfg = PoseCNNConfig(
        num_classes=22, num_units=64, vertex_reg=True, pose_reg=True, is_train=False,
        hough_class_slots=cfg.TPU.HOUGH_CLASS_SLOTS,
        hough_max_samples=cfg.TPU.HOUGH_MAX_SAMPLES,
        hough_center_stride=cfg.TPU.HOUGH_CENTER_STRIDE,
    )
    params = init_posecnn_params(jax.random.PRNGKey(cfg.RNG_SEED), model_cfg)
    if args.model:
        if args.model.endswith(".npy"):
            from posecnn_tpu.core.checkpoint import load_vgg16_npy

            params = load_vgg16_npy(args.model, params, log=print)
        elif args.model.endswith(".npz"):
            from posecnn_tpu.core.checkpoint import load_params_npz

            params = load_params_npz(args.model, params, log=print)
        else:
            from posecnn_tpu.core.checkpoint import load_tf1_checkpoint

            params = load_tf1_checkpoint(args.model, params, log=print)

    infer = make_inference_fn(model_cfg, cfg.pixel_means())
    # real YCB extents when the dataset assets are present (hough box
    # thresholds + 3D box visualization); uniform 10 cm cubes otherwise
    try:
        from posecnn_tpu.data.factory import get_imdb

        extents = jnp.asarray(get_imdb("lov_syn_train").extents, jnp.float32)
    except Exception:
        extents = jnp.ones((22, 3), jnp.float32) * 0.1
    meta = jnp.asarray(build_meta_data(DEMO_K)[None])

    os.makedirs(args.output, exist_ok=True)
    visualizer = None
    if args.visualize or cfg.TEST.VISUALIZE:
        from posecnn_tpu.engine.visualize import PredictionVisualizer

        visualizer = PredictionVisualizer(
            args.output, YCB_CLASSES, np.asarray(extents)
        )
    frames = sorted(glob.glob(os.path.join(args.images, "*-color.png")))
    print(f"{len(frames)} demo frames")
    refine = args.refine or cfg.TEST.POSE_REFINE
    points_all = None
    if refine:
        try:
            from posecnn_tpu.data.factory import get_imdb

            points_all = jnp.asarray(get_imdb("lov_syn_train")._points_all, jnp.float32)
        except Exception:
            refine = False
            print("POSE_REFINE disabled: dataset model points unavailable")
    for fi, path in enumerate(frames):
        im = cv2.imread(path, cv2.IMREAD_COLOR)
        out = jax.device_get(infer(params, jnp.asarray(im[None]), meta, extents))
        rois, poses = postprocess_detections(out)
        name = os.path.basename(path).replace("-color.png", "")
        poses_icp = None
        depth_path = path.replace("-color.png", "-depth.png")
        if refine and rois.shape[0] and os.path.exists(depth_path):
            # reference demo: factor_depth 10000 for the YCB 16-bit PNGs
            # (tools/demo.py:101), ICP under TEST.POSE_REFINE
            from posecnn_tpu.data.minibatch import build_meta_data as _bmd
            from posecnn_tpu.engine.test import refine_poses

            depth_m = cv2.imread(depth_path, cv2.IMREAD_UNCHANGED).astype(np.float32) / 10000.0
            _, poses_icp = refine_poses(
                rois, poses, depth_m, np.asarray(out["label_2d"][0]),
                points_all, _bmd(DEMO_K),
            )
        if visualizer is not None:
            from types import SimpleNamespace

            visualizer(
                fi, SimpleNamespace(color=im, intrinsic_matrix=DEMO_K),
                out, rois, poses,
            )
        label = out["label_2d"][0]
        # colorized label map artifact
        vis = np.zeros(label.shape + (3,), dtype=np.uint8)
        for c, col in enumerate(YCB_CLASS_COLORS):
            vis[label == c] = col[::-1]
        cv2.imwrite(os.path.join(args.output, f"{name}-label.png"), vis)
        dets = [
            {
                "class": YCB_CLASSES[int(r[1])],
                "box": [float(v) for v in r[2:6]],
                "score": float(r[6]),
                "pose_quat_wxyz": [float(v) for v in p[:4]],
                "pose_t": [float(v) for v in p[4:7]],
            }
            for r, p in zip(rois, poses)
        ]
        if poses_icp is not None:
            for d, p in zip(dets, poses_icp):
                d["pose_quat_wxyz_icp"] = [float(v) for v in p[:4]]
                d["pose_t_icp"] = [float(v) for v in p[4:7]]
        with open(os.path.join(args.output, f"{name}-dets.json"), "w") as f:
            json.dump(dets, f, indent=2)
        print(name, f"{len(dets)} detections")
    print("demo artifacts in", args.output)


if __name__ == "__main__":
    main()
