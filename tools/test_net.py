#!/usr/bin/env python
"""Evaluate a PoseCNN network on a dataset (mirrors reference tools/test_net.py)."""

from __future__ import annotations

import _init_paths  # noqa: F401  (repo-root import bootstrap)

import argparse
import pprint

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description="Test a posecnn_tpu network")
    parser.add_argument("--device", default="tpu")
    parser.add_argument("--model", dest="model", default=None, help="checkpoint to load")
    parser.add_argument("--cfg", dest="cfg_file", default=None)
    parser.add_argument("--imdb", dest="imdb_name", default="toy_val")
    parser.add_argument("--network", dest="network_name", default="vgg16_convs")
    parser.add_argument("--max_frames", type=int, default=None)
    parser.add_argument("--output", default=None, help="output dir override")
    parser.add_argument(
        "--eval_batch", type=int, default=1,
        help="frames per inference call (throughput mode; identical results)",
    )
    parser.add_argument(
        "--icp_plane_weight", type=float, default=None,
        help="override TPU.ICP_PLANE_WEIGHT (point-to-plane ICP energy A/B)",
    )
    parser.add_argument(
        "--vis", action="store_true",
        help="write prediction overlays (TEST.VISUALIZE) under the output dir",
    )
    return parser.parse_args()


def main():
    args = parse_args()
    import jax

    if args.device and args.device != "tpu":
        jax.config.update("jax_platforms", args.device)

    from posecnn_tpu.core.config import cfg, cfg_from_file, get_output_dir
    from posecnn_tpu.data.factory import get_imdb
    from posecnn_tpu.data.imdb import PoseEvaluator
    from posecnn_tpu.data.lov import YCB_SYMMETRIC_EVAL
    from posecnn_tpu.engine.test import test_net
    from posecnn_tpu.models.posecnn import PoseCNNConfig, init_posecnn_params

    if args.cfg_file:
        cfg_from_file(args.cfg_file)
    from posecnn_tpu.core.config import apply_debug_flags

    apply_debug_flags(cfg)
    pprint.pprint(cfg)

    imdb = get_imdb(args.imdb_name)

    forward_fn = None
    if cfg.NETWORK == "VGG16FULL" or args.network_name == "vgg16_full":
        from posecnn_tpu.models.posecnn_full import posecnn_full_forward

        forward_fn = posecnn_full_forward
    if cfg.NETWORK == "VGG16DET" or args.network_name == "vgg16_det":
        from posecnn_tpu.engine.test import DetectionEvaluator, test_net_detection
        from posecnn_tpu.models.detection import DetConfig, init_vgg16_det_params

        det_cfg = DetConfig(
            num_classes=imdb.num_classes,
            is_train=False,
            rpn_nms_thresh=cfg.TEST.RPN_NMS_THRESH,
            rpn_pre_nms_top_n=cfg.TEST.RPN_PRE_NMS_TOP_N,
            rpn_post_nms_top_n=cfg.TEST.RPN_POST_NMS_TOP_N,
        )
        params = init_vgg16_det_params(jax.random.PRNGKey(cfg.RNG_SEED), det_cfg)
        if args.model:
            from posecnn_tpu.core.checkpoint import restore_checkpoint

            params = restore_checkpoint(args.model, params)
        evaluator = DetectionEvaluator(imdb.classes)
        test_net_detection(
            params, det_cfg, imdb, cfg.pixel_means(),
            evaluator=evaluator, max_frames=args.max_frames,
            nms_threshold=cfg.TEST.NMS,
        )
        summary = evaluator.summary()
        out_dir = args.output or get_output_dir(imdb.name, "vgg16_det")
        import json
        import os

        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "eval_summary.json"), "w") as f:
            json.dump(summary, f, indent=2)
        print(json.dumps(summary, indent=2))
        return

    if cfg.NETWORK in ("RESNET50", "FCN8VGG") or args.network_name in ("resnet50", "fcn8_vgg"):
        # segmentation-only variants: label IoU evaluation
        # (reference evaluate_segmentations, lib/datasets/imdb.py:123)
        import json
        import os

        from posecnn_tpu.engine.test import test_net_segmentation
        from posecnn_tpu.models.factory import get_network

        name = "resnet50" if (cfg.NETWORK == "RESNET50" or args.network_name == "resnet50") else "fcn8_vgg"
        init_fn, fwd = get_network(name)
        C = imdb.num_classes
        params = init_fn(jax.random.PRNGKey(cfg.RNG_SEED), C)
        if args.model:
            from posecnn_tpu.core.checkpoint import restore_checkpoint

            params = restore_checkpoint(args.model, params)
        evaluator = PoseEvaluator(imdb.classes, imdb._extents, imdb._points, [])
        test_net_segmentation(
            params, lambda p, d: fwd(p, d, C), imdb, cfg.pixel_means(),
            evaluator=evaluator, max_frames=args.max_frames,
        )
        summary = evaluator.summary()
        out_dir = args.output or get_output_dir(imdb.name, name)
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "eval_summary.json"), "w") as f:
            json.dump(summary, f, indent=2)
        print(json.dumps({"mean_iou": summary["mean_iou"]}, indent=2))
        return

    model_cfg = PoseCNNConfig(
        num_classes=imdb.num_classes,
        num_units=cfg.TRAIN.NUM_UNITS,
        vertex_reg=cfg.TEST.VERTEX_REG_2D or cfg.TEST.VERTEX_REG_3D,
        vertex_reg_3d=cfg.TEST.VERTEX_REG_3D,
        pose_reg=cfg.TEST.POSE_REG and not cfg.TEST.VERTEX_REG_3D,
        is_train=False,
        vote_threshold=cfg.TEST.VOTING_THRESHOLD,
        hough_class_slots=cfg.TPU.HOUGH_CLASS_SLOTS,
        hough_max_samples=cfg.TPU.HOUGH_MAX_SAMPLES,
        hough_center_stride=cfg.TPU.HOUGH_CENTER_STRIDE,
        hough_sampler=cfg.TPU.HOUGH_SAMPLER,
        hough_pixel_stride=cfg.TPU.HOUGH_PIXEL_STRIDE,
        skip_pixels=cfg.TPU.HOUGH_SKIP_PIXELS,
        use_crop_pool=cfg.TPU.USE_CROP_POOL,
    )
    params = init_posecnn_params(jax.random.PRNGKey(cfg.RNG_SEED), model_cfg)
    if args.model:
        if args.model.endswith(".npy"):
            from posecnn_tpu.core.checkpoint import load_vgg16_npy

            params = load_vgg16_npy(args.model, params)
        elif args.model.endswith(".ckpt") or ".ckpt" in args.model:
            from posecnn_tpu.core.checkpoint import load_tf1_checkpoint

            params = load_tf1_checkpoint(args.model, params)
        else:
            from posecnn_tpu.core.checkpoint import restore_checkpoint
            from posecnn_tpu.engine.train import TrainHParams, create_train_state

            state = create_train_state(model_cfg, TrainHParams(), jax.random.PRNGKey(0))
            params = restore_checkpoint(args.model, state)[0]

    sym = [c for c in imdb.classes if c in YCB_SYMMETRIC_EVAL] or [
        imdb.classes[i] for i in range(imdb.num_classes) if imdb._symmetry[i] > 0
    ]
    # LINEMOD protocol: 0.1 x diameter thresholds + eggbox/glue z-flip for
    # the reprojection metric (linemod.py:411-413,503-507)
    diameters = getattr(imdb, "diameters", None)
    flip_z = [c for c in ("eggbox", "glue") if c in imdb.classes]
    evaluator = PoseEvaluator(
        imdb.classes, imdb._extents, imdb._points, sym,
        diameters=diameters, flip_z_classes=flip_z,
    )
    out_dir = args.output or get_output_dir(imdb.name, args.network_name)
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    visualizer = None
    if args.vis or cfg.TEST.VISUALIZE:
        from posecnn_tpu.engine.visualize import PredictionVisualizer

        visualizer = PredictionVisualizer(
            os.path.join(out_dir, "vis"), imdb.classes, imdb._extents
        )
    results = test_net(
        params, model_cfg, imdb, cfg.pixel_means(),
        evaluator=evaluator, max_frames=args.max_frames,
        forward_fn=forward_fn,
        pose_refine=cfg.TEST.POSE_REFINE,
        im_scale=cfg.TEST.SCALES_BASE[0],
        visualizer=visualizer,
        reference_nms_bug=cfg.TEST.REFERENCE_NMS_BUG,
        eval_batch=args.eval_batch,
        icp_plane_weight=(
            args.icp_plane_weight if args.icp_plane_weight is not None
            else cfg.TPU.ICP_PLANE_WEIGHT
        ),
    )
    # per-frame detection artifacts for offline analysis — the reference
    # writes one .mat per frame (lov.py:432-439); one consolidated npz here
    import numpy as _np

    arrays = {}
    for fi, r in enumerate(results):
        for k, v in r.items():
            if v is not None:
                arrays[f"{fi:06d}_{k}"] = _np.asarray(v)
    _np.savez_compressed(os.path.join(out_dir, "detections.npz"), **arrays)
    summary = evaluator.summary()
    with open(os.path.join(out_dir, "eval_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
