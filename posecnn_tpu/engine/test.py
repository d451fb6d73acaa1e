"""Inference engine: one fused jit call from raw frame bytes to poses.

Rewrite of the reference test driver (`lib/fcn/test.py:113-239,1154-1467`):
  * preprocessing (BGR float conversion, PIXEL_MEANS subtraction) is fused
    into the jit graph — raw uint8 frames go straight to the device;
  * one compiled call produces label map, class probabilities, vertex
    predictions, Hough ROIs, initial poses and quaternions (the reference
    ran sess.run over a queue + host NMS + host pose combine);
  * host-side: NMS over detections and quaternion/pose combination
    (test.py:198-211). NOTE: the reference feeds the full 7-column roi array
    to its NMS, which reads columns (0..4)=(batch,cls,x1,y1 | score=x2) —
    a latent bug; we run NMS on the actual box columns (2:6, score 6);
  * like the reference, the test-time quaternion is the raw fc8 tanh output
    (`poses_tanh`, test.py:195), not the weight-masked normalized one.
"""

from __future__ import annotations

import functools
from dataclasses import replace
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from posecnn_tpu.models.posecnn import PoseCNNConfig, posecnn_forward
from posecnn_tpu.ops.nms import nms_np


def make_inference_fn(model_cfg: PoseCNNConfig, pixel_means: Tuple[float, float, float]):
    """Returns a jitted fn: (params, raw_bgr_u8 (B,H,W,3), meta (B,48)) -> outputs."""
    cfg = replace(model_cfg, is_train=False, keep_prob=1.0)
    means = jnp.asarray(pixel_means, jnp.float32).reshape(1, 1, 1, 3)

    @jax.jit
    def infer(params, raw_bgr, meta, extents):
        data = raw_bgr.astype(jnp.float32) - means
        out = posecnn_forward(params, cfg, data, extents, meta)
        keep = {
            "label_2d": out["label_2d"],
            "prob_normalized": out["prob_normalized"],
        }
        if cfg.vertex_reg:
            keep.update(
                vertex_pred=out["vertex_pred"],
                rois=out["rois"],
                poses_init=out["poses_init"],
                rois_valid=out["rois_valid"],
                num_rois=out["num_rois"],
            )
            if cfg.pose_reg:
                keep["poses_tanh"] = out["poses_tanh"]
        return keep

    return infer


def postprocess_detections(
    out: Dict[str, np.ndarray],
    nms_threshold: float = 0.5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side NMS + pose combination. Returns (rois, poses) with
    poses rows (w,x,y,z,tx,ty,tz), mirroring im_segment_single_frame."""
    rois = np.asarray(out["rois"])
    valid = np.asarray(out["rois_valid"]).astype(bool)
    poses_init = np.asarray(out["poses_init"])
    rois = rois[valid]
    poses_init = poses_init[valid]
    poses_tanh = np.asarray(out["poses_tanh"])[valid] if "poses_tanh" in out else None

    if rois.shape[0] == 0:
        return rois, poses_init

    dets = np.concatenate([rois[:, 2:6], rois[:, 6:7]], axis=1).astype(np.float32)
    keep = nms_np(dets, nms_threshold)
    rois = rois[keep]
    poses = poses_init[keep].copy()
    if poses_tanh is not None:
        pt = poses_tanh[keep]
        for i in range(rois.shape[0]):
            cls = int(rois[i, 1])
            if cls >= 0:
                poses[i, :4] = pt[i, 4 * cls : 4 * cls + 4]
    return rois, poses


def test_net(
    params,
    model_cfg: PoseCNNConfig,
    dataset,
    pixel_means,
    evaluator=None,
    max_frames: Optional[int] = None,
    nms_threshold: float = 0.5,
    log=print,
):
    """Per-frame evaluation loop (test.py:1154-1467 without KFusion/refine)."""
    from posecnn_tpu.utils.timer import Timer

    infer = make_inference_fn(model_cfg, pixel_means)
    extents = jnp.asarray(dataset._extents)
    timer = Timer()
    n = dataset.num_images if max_frames is None else min(max_frames, dataset.num_images)
    results = []
    for i in range(n):
        frame = dataset.load_frame(i)
        raw = jnp.asarray(frame.color[None])
        from posecnn_tpu.data.minibatch import build_meta_data

        meta = jnp.asarray(build_meta_data(frame.intrinsic_matrix)[None])
        timer.tic()
        out = jax.device_get(infer(params, raw, meta, extents))
        timer.toc(average=False)
        rois, poses = postprocess_detections(out, nms_threshold)
        results.append({"rois": rois, "poses": poses})
        if evaluator is not None:
            evaluator.add_frame(
                out["label_2d"][0],
                frame.label,
                rois=rois,
                poses=poses,
                gt_poses=frame.poses,
                gt_cls_indexes=frame.cls_indexes,
            )
        if log and (i + 1) % 50 == 0:
            log(f"frame {i + 1}/{n} {timer.diff:.3f}s")
    if evaluator is not None and log:
        log(str(evaluator.summary()))
    return results


def test_net_video(
    params,
    video_cfg,
    dataset,
    pixel_means,
    num_steps: int = 5,
    evaluator=None,
    max_videos: Optional[int] = None,
    log=print,
):
    """Multi-frame evaluation: per video, reset the GRU state and stream
    frames through the recurrent graph (lib/fcn/test.py:381-557 without
    KinectFusion). Evaluates per-frame segmentation."""
    import numpy as np

    from posecnn_tpu.data.video_layer import group_by_video
    from posecnn_tpu.models.video import init_video_state, video_step

    means = np.asarray(pixel_means, np.float32).reshape(1, 1, 1, 3)

    @jax.jit
    def step(params, state, data, depth, meta):
        return video_step(params, video_cfg, data, depth, meta, state)

    videos = group_by_video(dataset.image_index)
    names = sorted(videos)
    if max_videos is not None:
        names = names[:max_videos]
    from posecnn_tpu.data.minibatch import build_meta_data

    for vi, name in enumerate(names):
        state = None
        for j, idx in enumerate(videos[name]):
            frame = dataset.load_frame(idx)
            data = jnp.asarray(frame.color[None].astype(np.float32) - means)
            if state is None:
                state = init_video_state(1, data.shape[1], data.shape[2], video_cfg.num_units)
            depth = jnp.asarray(
                (frame.depth.astype(np.float32) / frame.factor_depth)[None]
                if frame.depth is not None
                else np.zeros(frame.label.shape, np.float32)[None]
            )
            meta = jnp.asarray(build_meta_data(frame.intrinsic_matrix)[None])
            out, state = step(params, state, data, depth, meta)
            if evaluator is not None:
                evaluator.add_frame(np.asarray(out["label_2d"])[0], frame.label)
        if log:
            log(f"video {vi + 1}/{len(names)} ({name}): {len(videos[name])} frames")
    if evaluator is not None and log:
        log(str(evaluator.summary()))
    return evaluator
