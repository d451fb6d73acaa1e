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


def make_inference_fn(
    model_cfg: PoseCNNConfig,
    pixel_means: Tuple[float, float, float],
    forward_fn=None,
    full_outputs: bool = False,
):
    """Returns a jitted fn: (params, raw_bgr_u8 (B,H,W,3), meta (B,48)) -> outputs.

    forward_fn defaults to posecnn_forward; pass posecnn_full_forward (same
    endpoint contract) to evaluate vgg16_full.

    Only the outputs the eval path consumes are returned (device->host
    transfers dominate per-frame eval cost on tunneled hosts: the unused
    prob_normalized + vertex_pred maps are ~110 MB/frame at 640x480/C=22 vs
    ~1 MB for label + detections). `full_outputs=True` restores the dense
    probability and vertex maps for callers that inspect them."""
    cfg = replace(model_cfg, is_train=False, keep_prob=1.0)
    means = jnp.asarray(pixel_means, jnp.float32).reshape(1, 1, 1, 3)
    forward = forward_fn if forward_fn is not None else posecnn_forward

    @jax.jit
    def infer(params, raw_bgr, meta, extents):
        data = raw_bgr.astype(jnp.float32) - means
        out = forward(params, cfg, data, extents, meta)
        keep = {"label_2d": out["label_2d"]}
        if full_outputs:
            keep["prob_normalized"] = out["prob_normalized"]
        if cfg.vertex_reg:
            if cfg.vertex_reg_3d or full_outputs:
                # the 3D RANSAC decode consumes the object-coordinate map
                keep["vertex_pred"] = out["vertex_pred"]
            if not cfg.vertex_reg_3d:  # hough outputs only exist in 2D mode
                keep.update(
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
    reference_nms_bug: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side NMS + pose combination. Returns (rois, poses) with
    poses rows (w,x,y,z,tx,ty,tz), mirroring im_segment_single_frame.

    reference_nms_bug: reproduce the reference bit-for-bit — it feeds the
    full 7-column roi array to nms (lib/fcn/test.py:198), which then reads
    columns 0..4 = (batch, cls, x1, y1) as the box and x2 as the score."""
    rois = np.asarray(out["rois"])
    valid = np.asarray(out["rois_valid"]).astype(bool)
    poses_init = np.asarray(out["poses_init"])
    rois = rois[valid]
    poses_init = poses_init[valid]
    poses_tanh = np.asarray(out["poses_tanh"])[valid] if "poses_tanh" in out else None

    if rois.shape[0] == 0:
        return rois, poses_init

    if reference_nms_bug:
        dets = rois[:, 0:5].astype(np.float32)
    else:
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


MAX_REFINE_DETS = 32  # static row cap for the jitted per-frame ICP call


@functools.partial(jax.jit, static_argnames=("iters", "max_points", "plane_weight"))
def _refine_jit(rois, poses, depth_m, label, points_all, meta, iters=20, max_points=512,
                plane_weight=0.0):
    from posecnn_tpu.engine.refine import icp_refine_detections

    return icp_refine_detections(
        rois, poses, depth_m, label, points_all, meta,
        iters=iters, max_points=max_points, plane_weight=plane_weight,
    )


@functools.partial(jax.jit, static_argnames=("max_points",))
def _refine_translation_jit(rois, poses, depth_m, label, meta, max_points=512):
    """Vmapped depth-median translation fix over the padded detection rows —
    one dispatch per frame instead of one sample+refine pair per detection
    (each eager dispatch is a full round trip on tunneled platforms)."""
    from posecnn_tpu.engine.refine import refine_translation, sample_object_cloud

    fx, px, fy, py = meta[0], meta[2], meta[4], meta[5]

    def one(roi, pose):
        cls = roi[1].astype(jnp.int32)
        tgt, tv = sample_object_cloud(depth_m, label, cls, fx, fy, px, py, max_points)
        return refine_translation(pose[:4], pose[4:7], tgt, tv)

    return jax.vmap(one)(rois, poses)


def refine_poses(rois, poses, depth_m, label, points_all, meta, max_det: int = MAX_REFINE_DETS,
                 plane_weight: float = 0.0):
    """Host wrapper: pad the post-NMS detections to a static row count, run
    the vmapped Gauss-Newton ICP in one jit call, return (poses_refined,
    poses_icp). poses_refined is the cheap depth-median translation fix (the
    reference's 'poses_new'); poses_icp is the full ICP result
    (lib/fcn/test.py:1335-1351 -> synthesize.cpp:2052-2200)."""
    R = rois.shape[0]
    k = min(R, max_det)
    rois_p = np.zeros((max_det, rois.shape[1]), np.float32)
    poses_p = np.zeros((max_det, 7), np.float32)
    poses_p[:, 0] = 1.0  # identity quat for padding rows
    rois_p[:k] = rois[:k]
    poses_p[:k] = poses[:k, :7]
    refined = np.asarray(
        _refine_jit(
            jnp.asarray(rois_p), jnp.asarray(poses_p), jnp.asarray(depth_m),
            jnp.asarray(label), points_all, jnp.asarray(meta),
            plane_weight=float(plane_weight),
        )
    )[:k]
    # translation-only refinement for the poses_new column (one jit call)
    poses_new = poses.copy()
    trans_new = np.asarray(
        _refine_translation_jit(
            jnp.asarray(rois_p), jnp.asarray(poses_p), jnp.asarray(depth_m),
            jnp.asarray(label), jnp.asarray(meta, jnp.float32),
        )
    )[:k]
    poses_new[:k, 4:7] = trans_new
    poses_icp = poses.copy()
    poses_icp[:k, :7] = refined
    return poses_new, poses_icp


@functools.partial(jax.jit, static_argnames=("max_points", "num_hypotheses"))
def _ransac3d_jit(key, vp3, label, depth_m, cls, extent, fx, fy, px, py,
                  max_points=512, num_hypotheses=256):
    from posecnn_tpu.engine.ransac import ransac_from_maps

    return ransac_from_maps(
        key, vp3, label, depth_m, cls, extent, fx, fy, px, py,
        max_points=max_points, num_hypotheses=num_hypotheses,
    )


def decode_poses_3d(
    out,
    depth_m: np.ndarray,
    meta: np.ndarray,
    extents: np.ndarray,
    num_classes: int,
    label_threshold: int = 500,
    seed: int = 0,
):
    """VERTEX_REG_3D pose decoding (the reference's Ransac3D branch,
    lib/fcn/test.py + lib/pose_estimation/src/ransac3D.cpp): per class with
    enough predicted pixels, Kabsch-RANSAC between the predicted (unscaled)
    object coordinates and the backprojected depth points.

    Returns (rois (N,7), poses (N,7)) in the hough-roi layout so the rest of
    the eval path (NMS-free — one detection per class) is shared."""
    label = np.asarray(out["label_2d"][0])
    vp = np.asarray(out["vertex_pred"][0], np.float32)
    fx, px, fy, py = float(meta[0]), float(meta[2]), float(meta[4]), float(meta[5])
    rois, poses = [], []
    key = jax.random.PRNGKey(seed)
    for c in range(1, num_classes):
        ys, xs = np.nonzero(label == c)
        if len(xs) < label_threshold:
            continue
        key, sub = jax.random.split(key)
        q, t, n_inl = _ransac3d_jit(
            sub, jnp.asarray(vp[:, :, 3 * c : 3 * c + 3]), jnp.asarray(label),
            jnp.asarray(depth_m), jnp.asarray(c), jnp.asarray(extents[c], jnp.float32),
            fx, fy, px, py,
        )
        score = float(n_inl)
        if score <= 0:
            # no depth-valid correspondences (sensor hole over the object):
            # the RANSAC output is meaningless — skip rather than emit it
            continue
        rois.append([0, c, xs.min(), ys.min(), xs.max(), ys.max(), score])
        poses.append(np.concatenate([np.asarray(q), np.asarray(t)]))
    if not rois:
        return np.zeros((0, 7), np.float32), np.zeros((0, 7), np.float32)
    return np.asarray(rois, np.float32), np.asarray(poses, np.float32)


def test_net_segmentation(
    params,
    apply_fn,
    dataset,
    pixel_means,
    evaluator=None,
    max_frames: Optional[int] = None,
    log=print,
):
    """Segmentation-only evaluation for the RESNET50 / FCN8VGG variants:
    per-frame label prediction -> IoU histogram (the reference evaluates
    these through evaluate_segmentations / fast_hist, lib/datasets/imdb.py:123).

    apply_fn: (params, data_f32) -> endpoint dict with 'label_2d'."""
    means = jnp.asarray(np.asarray(pixel_means).reshape(-1)[:3], jnp.float32).reshape(1, 1, 1, 3)

    @jax.jit
    def infer(params, raw_u8):
        data = raw_u8.astype(jnp.float32) - means
        return apply_fn(params, data)["label_2d"]

    n = dataset.num_images if max_frames is None else min(max_frames, dataset.num_images)
    for i in range(n):
        frame = dataset.load_frame(i)
        label_pred = np.asarray(jax.device_get(infer(params, jnp.asarray(frame.color[None]))))[0]
        if evaluator is not None:
            evaluator.add_frame(label_pred, frame.label)
        if log and (i + 1) % 50 == 0:
            log(f"frame {i + 1}/{n}")
    if evaluator is not None and log:
        log(str(evaluator.summary()))


def test_net(
    params,
    model_cfg: PoseCNNConfig,
    dataset,
    pixel_means,
    evaluator=None,
    max_frames: Optional[int] = None,
    nms_threshold: float = 0.5,
    log=print,
    forward_fn=None,
    pose_refine: bool = False,
    im_scale: float = 1.0,
    visualizer=None,
    reference_nms_bug: bool = False,
    eval_batch: int = 1,
    icp_plane_weight: float = 0.0,
):
    """Per-frame evaluation loop (test.py:1154-1467).

    pose_refine: honor TEST.POSE_REFINE — load depth and run the JAX ICP
    refiner after NMS (reference runs synthesizer.icp_python,
    lib/fcn/test.py:1335-1351). im_scale: TEST.SCALES_BASE input rescale
    (test.py:113-151). visualizer: callable(frame_index, frame, out, rois,
    poses) for prediction rendering (TEST.VISUALIZE). eval_batch: frames
    per inference call — batching amortizes per-dispatch overhead (the
    throughput serving mode; per-frame results are identical because hough
    slots and detections are per image)."""
    import cv2

    from posecnn_tpu.data.minibatch import build_meta_data
    from posecnn_tpu.utils.blob import pad_im
    from posecnn_tpu.utils.timer import Timer

    infer = make_inference_fn(model_cfg, pixel_means, forward_fn=forward_fn)
    extents = jnp.asarray(dataset._extents)
    points_all = jnp.asarray(np.asarray(dataset._points_all, np.float32))
    timer = Timer()
    n = dataset.num_images if max_frames is None else min(max_frames, dataset.num_images)
    results = []

    def _prep(frame):
        color = frame.color
        scaled_hw = None  # content region before x16 padding, (H, W)
        if im_scale != 1.0:
            color = cv2.resize(
                color, None, None, fx=im_scale, fy=im_scale, interpolation=cv2.INTER_LINEAR
            )
            scaled_hw = color.shape[:2]
            color = pad_im(color, 16)  # trunk needs x16 dims (blob.py pad)
        return color, scaled_hw, build_meta_data(frame.intrinsic_matrix, im_scale)

    def _slice_batch(out, b):
        """Per-image view of a batched inference output: dense maps by batch
        row; detection rows by their batch-index column."""
        o = {k: v[b : b + 1] for k, v in out.items() if k in ("label_2d", "vertex_pred", "prob_normalized")}
        if "rois" in out:
            rois = np.asarray(out["rois"])
            sel = np.asarray(out["rois_valid"]).astype(bool) & (rois[:, 0].astype(int) == b)
            rois = rois[sel].copy()
            # re-zero the batch column: the single-frame path always emits 0
            # there, and the REFERENCE_NMS_BUG parity mode reads columns 0..4
            # as (box, score) — a nonzero slot index would shift its boxes
            rois[:, 0] = 0.0
            o["rois"] = rois
            o["rois_valid"] = np.ones(sel.sum(), bool)
            o["poses_init"] = np.asarray(out["poses_init"])[sel]
            if "poses_tanh" in out:
                o["poses_tanh"] = np.asarray(out["poses_tanh"])[sel]
        return o

    for start in range(0, n, eval_batch):
        idxs = list(range(start, min(start + eval_batch, n)))
        frames = [dataset.load_frame(i) for i in idxs]
        prepped = [_prep(f) for f in frames]
        pad_count = eval_batch - len(idxs)
        raw = jnp.asarray(np.stack([p[0] for p in prepped] + [prepped[-1][0]] * pad_count))
        meta = jnp.asarray(np.stack([p[2] for p in prepped] + [prepped[-1][2]] * pad_count))
        timer.tic()
        out_all = jax.device_get(infer(params, raw, meta, extents))
        timer.toc(average=False)
        inner = zip(range(len(idxs)), idxs, frames)
        for b, i, frame in inner:
            out = _slice_batch(out_all, b) if eval_batch > 1 else out_all
            scaled_hw = prepped[b][1]
            H0, W0 = frame.color.shape[:2]
            if model_cfg.vertex_reg_3d:
                # RANSAC branch: pose from object-coordinate + depth correspondences.
                # Depth and K are dataset-resolution, so when the input was
                # rescaled the predicted maps are cropped (x16 padding off) and
                # resized back to the dataset frame before decoding.
                depth3d = (
                    frame.depth.astype(np.float32) / float(frame.factor_depth)
                    if frame.depth is not None
                    else np.zeros(frame.label.shape, np.float32)
                )
                out3d = out
                if scaled_hw is not None:
                    hs, ws = scaled_hw
                    lab = np.asarray(out["label_2d"][0])[:hs, :ws]
                    vp = np.asarray(out["vertex_pred"][0], np.float32)[:hs, :ws]
                    out3d = {
                        "label_2d": cv2.resize(
                            lab.astype(np.int32), (W0, H0), interpolation=cv2.INTER_NEAREST
                        )[None],
                        "vertex_pred": cv2.resize(
                            vp, (W0, H0), interpolation=cv2.INTER_LINEAR
                        )[None],
                    }
                rois, poses = decode_poses_3d(
                    out3d, depth3d, build_meta_data(frame.intrinsic_matrix),
                    np.asarray(dataset._extents), model_cfg.num_classes,
                    label_threshold=model_cfg.label_threshold, seed=i,
                )
            else:
                rois, poses = postprocess_detections(out, nms_threshold, reference_nms_bug)
            label_pred = out["label_2d"][0]
            if im_scale != 1.0:
                # predictions live in scaled-image coordinates: crop off the x16
                # padding, then bring the label map and boxes back to the dataset
                # frame for evaluation
                if scaled_hw is not None:
                    label_pred = np.asarray(label_pred)[: scaled_hw[0], : scaled_hw[1]]
                label_pred = cv2.resize(
                    np.asarray(label_pred).astype(np.int32), (W0, H0),
                    interpolation=cv2.INTER_NEAREST,
                )
                if rois.shape[0] and not model_cfg.vertex_reg_3d:
                    rois = rois.copy()
                    rois[:, 2:6] /= im_scale
            poses_refined = poses_icp = None
            if pose_refine and frame.depth is not None and rois.shape[0]:
                depth_m = frame.depth.astype(np.float32) / float(frame.factor_depth)
                meta_icp = build_meta_data(frame.intrinsic_matrix)  # unscaled K
                poses_refined, poses_icp = refine_poses(
                    rois, poses, depth_m, label_pred, points_all, meta_icp,
                    plane_weight=icp_plane_weight,
                )
            results.append({
                "rois": rois, "poses": poses,
                "poses_refined": poses_refined, "poses_icp": poses_icp,
            })
            if evaluator is not None:
                evaluator.add_frame(
                    label_pred,
                    frame.label,
                    rois=rois,
                    poses=poses,
                    gt_poses=frame.poses,
                    gt_cls_indexes=frame.cls_indexes,
                    poses_refined=poses_refined,
                    poses_icp=poses_icp,
                    intrinsic_matrix=np.asarray(frame.intrinsic_matrix, np.float64),
                )
            if visualizer is not None:
                visualizer(i, frame, out, rois, poses_icp if poses_icp is not None else poses)
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
    kfusion: bool = False,
    kfusion_grid: int = 128,
    log=print,
):
    """Multi-frame evaluation: per video, reset the GRU state and stream
    frames through the recurrent graph (lib/fcn/test.py:381-557). With
    `kfusion`, each video also runs the TSDF pipeline (feed_data ->
    solve_pose -> fuse_depth -> feed_label per frame, extract_surface at the
    end — the reference's KinectFusion hooks, kfusion.pyx:37-71); surfaces
    are returned on the evaluator as `.surfaces`."""
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

    surfaces = []
    for vi, name in enumerate(names):
        state = None
        kf = None
        if kfusion:
            from posecnn_tpu.engine.kfusion import KinectFusion

            kf = KinectFusion(grid_size=kfusion_grid, num_classes=video_cfg.num_classes)
        for j, idx in enumerate(videos[name]):
            frame = dataset.load_frame(idx)
            data = jnp.asarray(frame.color[None].astype(np.float32) - means)
            if state is None:
                state = init_video_state(1, data.shape[1], data.shape[2], video_cfg.num_units)
            depth_np = (
                frame.depth.astype(np.float32) / frame.factor_depth
                if frame.depth is not None
                else np.zeros(frame.label.shape, np.float32)
            )
            depth = jnp.asarray(depth_np[None])
            meta = jnp.asarray(build_meta_data(frame.intrinsic_matrix)[None])
            out, state = step(params, state, data, depth, meta)
            label_pred = np.asarray(out["label_2d"])[0]
            if kf is not None:
                kf.feed_data(depth_np, frame.intrinsic_matrix)
                if j > 0:
                    kf.solve_pose()
                if "prob" in out:  # log-softmax -> class probabilities
                    kf.feed_label(np.exp(np.asarray(out["prob"])[0]))
                else:
                    C = video_cfg.num_classes
                    kf.feed_label(np.eye(C, dtype=np.float32)[label_pred])
                kf.fuse_depth()
            if evaluator is not None:
                evaluator.add_frame(label_pred, frame.label)
        if kf is not None:
            surfaces.append(kf.extract_surface())
        if log:
            log(f"video {vi + 1}/{len(names)} ({name}): {len(videos[name])} frames")
    if evaluator is not None:
        evaluator.surfaces = surfaces
    if evaluator is not None and log:
        log(str(evaluator.summary()))
    return evaluator


# --------------------------------------------------------------- detection path


def gt_boxes_from_poses(frame, extents) -> np.ndarray:
    """Dataset GT boxes (M,5) [cls, x1, y1, x2, y2] by projecting each GT
    object's 3D extent box through its pose — the reference detection eval
    consumes roidb GT boxes (lib/fcn/test.py:1472-1638), which YCB builds
    from exactly this projection; label-pixel extents under-estimate
    occluded objects."""
    from posecnn_tpu.engine.visualize import project_box_corners
    from posecnn_tpu.utils.quaternion_np import mat2quat

    H, W = frame.label.shape[:2]
    K = np.asarray(frame.intrinsic_matrix, np.float64)
    rows = []
    for j, c in enumerate(np.asarray(frame.cls_indexes).astype(int)):
        R, t = frame.poses[:, :3, j], frame.poses[:, 3, j]
        if t[2] <= 0:
            continue
        uv = project_box_corners(np.asarray(extents)[c], mat2quat(R), t, K)
        x1, y1 = uv.min(axis=0)
        x2, y2 = uv.max(axis=0)
        x1, x2 = np.clip([x1, x2], 0, W - 1)
        y1, y2 = np.clip([y1, y2], 0, H - 1)
        if x2 > x1 and y2 > y1:
            rows.append([c, x1, y1, x2, y2])
    return np.asarray(rows, np.float32).reshape(-1, 5)


class DetectionEvaluator:
    """VOC-style AP@0.5 over dataset GT boxes (the detection variant's
    evaluation; reference test_net_detection, lib/fcn/test.py:1472-1638).

    GT boxes come from the dataset (pass `gt_boxes` rows [cls,x1,y1,x2,y2],
    e.g. `gt_boxes_from_poses`); the label-pixel-extent fallback is kept for
    datasets without pose annotations. Multi-instance: detections match
    greedily (by score) against unused GT instances of their class."""

    def __init__(self, classes):
        self.classes = list(classes)
        # per class: list of (score, matched) + gt count
        self.records = {c: [] for c in range(1, len(self.classes))}
        self.n_gt = {c: 0 for c in range(1, len(self.classes))}

    @staticmethod
    def _gt_boxes_from_label(label, num_classes):
        rows = []
        for c in range(1, num_classes):
            ys, xs = np.nonzero(label == c)
            if len(xs) > 10:
                rows.append([c, xs.min(), ys.min(), xs.max(), ys.max()])
        return np.asarray(rows, np.float32).reshape(-1, 5)

    @staticmethod
    def _iou(bb, gb):
        ix = max(0.0, min(bb[2], gb[2]) - max(bb[0], gb[0]) + 1)
        iy = max(0.0, min(bb[3], gb[3]) - max(bb[1], gb[1]) + 1)
        inter = ix * iy
        union = (
            (bb[2] - bb[0] + 1) * (bb[3] - bb[1] + 1)
            + (gb[2] - gb[0] + 1) * (gb[3] - gb[1] + 1)
            - inter
        )
        return inter / max(union, 1e-9)

    def add_frame(self, detections, gt_label=None, gt_boxes=None):
        """detections: (N, 10) rows [cls, x1, y1, x2, y2, score, quat4];
        gt_boxes: (M, 5) rows [cls, x1, y1, x2, y2] from the dataset."""
        if gt_boxes is None:
            assert gt_label is not None, "need gt_boxes or gt_label"
            gt_boxes = self._gt_boxes_from_label(gt_label, len(self.classes))
        gt_boxes = np.asarray(gt_boxes, np.float32).reshape(-1, 5)
        for row in gt_boxes:
            c = int(row[0])
            if c in self.n_gt:
                self.n_gt[c] += 1
        used = set()
        order = np.argsort(-detections[:, 5]) if len(detections) else []
        for i in order:
            c = int(detections[i, 0])
            if c not in self.records:
                continue
            matched = False
            bb = detections[i, 1:5]
            best, best_j = 0.5, -1  # VOC IoU threshold
            for j, row in enumerate(gt_boxes):
                if int(row[0]) != c or j in used:
                    continue
                iou = self._iou(bb, row[1:5])
                if iou >= best:
                    best, best_j = iou, j
            if best_j >= 0:
                matched = True
                used.add(best_j)
            self.records[c].append((float(detections[i, 5]), matched))

    def summary(self):
        aps = {}
        for c, recs in self.records.items():
            n_gt = self.n_gt[c]
            if n_gt == 0:
                continue
            recs = sorted(recs, key=lambda r: -r[0])
            tp = np.cumsum([r[1] for r in recs]) if recs else np.zeros(0)
            fp = np.cumsum([not r[1] for r in recs]) if recs else np.zeros(0)
            recall = tp / n_gt if len(tp) else np.zeros(0)
            precision = tp / np.maximum(tp + fp, 1e-9) if len(tp) else np.zeros(0)
            ap = 0.0
            for t in np.linspace(0, 1, 11):
                p = precision[recall >= t].max() if np.any(recall >= t) else 0.0
                ap += p / 11
            aps[self.classes[c]] = float(ap)
        mean_ap = float(np.mean(list(aps.values()))) if aps else 0.0
        return {"ap_per_class": aps, "mAP@0.5": mean_ap}


def make_det_inference_fn(det_cfg, pixel_means):
    """Jitted detection inference: raw uint8 frame -> proposals + heads."""
    from posecnn_tpu.models.detection import vgg16_det_forward

    cfg = replace(det_cfg, is_train=False, keep_prob=1.0)
    means = jnp.asarray(pixel_means, jnp.float32).reshape(1, 1, 1, 3)

    @jax.jit
    def infer(params, raw_bgr):
        data = raw_bgr.astype(jnp.float32) - means
        out = vgg16_det_forward(params, cfg, data)
        return {
            "rois": out["rois"],
            "cls_prob": out["cls_prob"],
            "bbox_pred": out["bbox_pred"],
            "poses_tanh": out["poses_tanh"],
        }

    return infer


def postprocess_det(
    out,
    num_classes: int,
    im_shape,
    nms_threshold: float = 0.3,
    score_threshold: float = 0.05,
    bbox_reg: bool = True,
):
    """Decode RCNN outputs to final detections (test.py:1472-1638 semantics:
    bbox_transform_inv + clip + per-class NMS). Returns (N, 10) rows
    [cls, x1, y1, x2, y2, score, qw, qx, qy, qz]."""
    from posecnn_tpu.ops.bbox import bbox_transform_inv, clip_boxes

    rois = np.asarray(out["rois"])
    cls_prob = np.asarray(out["cls_prob"])
    boxes = rois[:, 1:5]
    if bbox_reg:
        boxes_all = np.asarray(bbox_transform_inv(boxes, np.asarray(out["bbox_pred"])))
        boxes_all = np.asarray(clip_boxes(boxes_all, im_shape))
    else:
        boxes_all = np.tile(boxes, (1, num_classes))
    poses_tanh = np.asarray(out["poses_tanh"])

    dets = []
    for c in range(1, num_classes):
        scores = cls_prob[:, c]
        keep = scores > score_threshold
        if not np.any(keep):
            continue
        cls_boxes = boxes_all[keep, 4 * c : 4 * c + 4]
        cls_scores = scores[keep]
        quats = poses_tanh[keep, 4 * c : 4 * c + 4]
        norm = np.linalg.norm(quats, axis=1, keepdims=True)
        quats = quats / np.maximum(norm, 1e-12)
        d5 = np.concatenate([cls_boxes, cls_scores[:, None]], axis=1).astype(np.float32)
        kept = nms_np(d5, nms_threshold)
        for i in kept:
            dets.append(
                np.concatenate([[c], cls_boxes[i], [cls_scores[i]], quats[i]]).astype(np.float32)
            )
    return np.asarray(dets, np.float32).reshape(-1, 10)


def test_net_detection(
    params,
    det_cfg,
    dataset,
    pixel_means,
    evaluator=None,
    max_frames: Optional[int] = None,
    nms_threshold: float = 0.3,
    log=print,
):
    """Detection-variant evaluation loop (test_net_detection,
    lib/fcn/test.py:1472-1638)."""
    infer = make_det_inference_fn(det_cfg, pixel_means)
    n = dataset.num_images if max_frames is None else min(max_frames, dataset.num_images)
    results = []
    for i in range(n):
        frame = dataset.load_frame(i)
        out = jax.device_get(infer(params, jnp.asarray(frame.color[None])))
        dets = postprocess_det(
            out, det_cfg.num_classes, frame.color.shape[:2], nms_threshold=nms_threshold
        )
        results.append(dets)
        if evaluator is not None:
            gt_boxes = None
            if getattr(frame, "poses", None) is not None and frame.poses.shape[-1]:
                ext = getattr(dataset, "_extents", None)
                if ext is not None:
                    gt_boxes = gt_boxes_from_poses(frame, ext)
            evaluator.add_frame(dets, gt_label=frame.label, gt_boxes=gt_boxes)
        if log and (i + 1) % 50 == 0:
            log(f"frame {i + 1}/{n}: {len(dets)} detections")
    if evaluator is not None and log:
        log(str(evaluator.summary()))
    return results
