"""Evaluation-path integration: the refine_poses host wrapper (POSE_REFINE)
and the visualizer hook."""

import numpy as np
import jax.numpy as jnp
import pytest

from posecnn_tpu.engine.test import refine_poses
from posecnn_tpu.utils.pose_error import add
from posecnn_tpu.utils.quaternion_np import mat2quat, quat2mat


def _axis_angle(axis, deg):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    a = np.deg2rad(deg)
    K = np.array([
        [0, -axis[2], axis[1]],
        [axis[2], 0, -axis[0]],
        [-axis[1], axis[0], 0],
    ])
    return np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K)


def _render_depth_label(pts_cam, K, H, W, cls):
    depth = np.zeros((H, W), np.float32)
    label = np.zeros((H, W), np.int32)
    uv = pts_cam @ K.T
    u = (uv[:, 0] / uv[:, 2]).astype(int)
    v = (uv[:, 1] / uv[:, 2]).astype(int)
    ok = (u >= 0) & (u < W) & (v >= 0) & (v < H)
    for ui, vi, z in zip(u[ok], v[ok], pts_cam[ok, 2]):
        if depth[vi, ui] == 0 or z < depth[vi, ui]:
            depth[vi, ui] = z
            label[vi, ui] = cls
    return depth, label


def test_refine_poses_improves_pose():
    rng = np.random.RandomState(0)
    H, W = 96, 128
    K = np.array([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]])
    C = 3
    # dense box-surface model for class 1
    g = np.linspace(-0.05, 0.05, 12)
    xs, ys = np.meshgrid(g, g)
    faces = []
    for s in (-0.05, 0.05):
        faces += [np.stack([xs.ravel(), ys.ravel(), np.full(xs.size, s)], 1),
                  np.stack([xs.ravel(), np.full(xs.size, s), ys.ravel()], 1),
                  np.stack([np.full(xs.size, s), xs.ravel(), ys.ravel()], 1)]
    model = np.concatenate(faces).astype(np.float32)
    points_all = np.zeros((C, model.shape[0], 3), np.float32)
    points_all[1] = model

    R_gt = _axis_angle([0.3, 1.0, 0.2], 30)
    t_gt = np.array([0.02, -0.03, 0.9])
    depth, label = _render_depth_label(model @ R_gt.T + t_gt, K, H, W, cls=1)

    # perturbed initial pose
    R0 = _axis_angle([0, 0, 1.0], 12) @ R_gt
    t0 = t_gt + np.array([0.01, -0.01, 0.05])
    rois = np.array([[0, 1, 30, 20, 100, 80, 0.9]], np.float32)
    poses = np.concatenate([mat2quat(R0), t0]).astype(np.float32)[None]

    meta = np.zeros(48, np.float32)
    meta[0], meta[2], meta[4], meta[5] = K[0, 0], K[0, 2], K[1, 1], K[1, 2]
    poses_new, poses_icp = refine_poses(
        rois, poses, depth, label, jnp.asarray(points_all), meta
    )

    err0 = add(R0, t0, R_gt, t_gt, model)
    err_new = add(quat2mat(poses_new[0, :4]), poses_new[0, 4:7], R_gt, t_gt, model)
    err_icp = add(quat2mat(poses_icp[0, :4]), poses_icp[0, 4:7], R_gt, t_gt, model)
    # translation-only refinement fixes most of the depth offset; full ICP
    # must beat both the initial pose and the translation-only fix
    assert err_icp < err0 * 0.5
    assert err_icp <= err_new + 1e-6
    assert err_new < err0


def test_refine_poses_keeps_pose_without_depth_support():
    """Detections whose class has no depth pixels keep the network pose."""
    H, W = 32, 32
    depth = np.zeros((H, W), np.float32)
    label = np.zeros((H, W), np.int32)
    points_all = np.zeros((2, 16, 3), np.float32)
    rois = np.array([[0, 1, 2, 2, 20, 20, 0.5]], np.float32)
    poses = np.array([[1, 0, 0, 0, 0.0, 0.0, 1.0]], np.float32)
    meta = np.zeros(48, np.float32)
    meta[0] = meta[4] = 60.0
    meta[2] = meta[5] = 16.0
    _, poses_icp = refine_poses(rois, poses, depth, label, jnp.asarray(points_all), meta)
    np.testing.assert_allclose(poses_icp[0], poses[0], atol=1e-6)


def test_visualizer_writes_overlay(tmp_path):
    from posecnn_tpu.data.minibatch import Frame
    from posecnn_tpu.engine.visualize import PredictionVisualizer

    H, W = 48, 64
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
    frame = Frame(
        color=np.zeros((H, W, 3), np.uint8),
        label=np.zeros((H, W), np.int32),
        cls_indexes=np.array([1.0]),
        poses=np.zeros((3, 4, 1), np.float32),
        center=np.zeros((1, 2), np.float32),
        intrinsic_matrix=K,
    )
    label_pred = np.zeros((1, H, W), np.int32)
    label_pred[0, 10:20, 10:20] = 1
    rois = np.array([[0, 1, 10, 10, 20, 20, 0.8]], np.float32)
    poses = np.array([[1, 0, 0, 0, 0, 0, 0.9]], np.float32)
    vis = PredictionVisualizer(str(tmp_path), ["bg", "obj"], np.array([[0, 0, 0], [0.1, 0.1, 0.1]]))
    vis(0, frame, {"label_2d": label_pred}, rois, poses)
    import os

    assert os.path.exists(os.path.join(str(tmp_path), "000000-vis.png"))
