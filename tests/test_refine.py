"""Tests for the JAX ICP refiner, RANSAC estimator and the C++ synthesizer."""

import jax
import jax.numpy as jnp
import numpy as np

from posecnn_tpu.engine.ransac import kabsch, ransac_pose
from posecnn_tpu.engine.refine import icp_refine
from posecnn_tpu.utils.quaternion_np import quat2mat


def _rand_pose(rng):
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    R = quat2mat(q)
    t = np.array([0.02, -0.01, 0.8]) + 0.05 * rng.randn(3)
    return R, t


def test_kabsch_exact_recovery():
    rng = np.random.RandomState(0)
    R, t = _rand_pose(rng)
    src = rng.randn(50, 3).astype(np.float32) * 0.1
    dst = src @ R.T + t
    R2, t2 = kabsch(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t2), t, atol=1e-4)


def test_ransac_recovers_pose_with_outliers():
    rng = np.random.RandomState(1)
    R, t = _rand_pose(rng)
    N = 200
    obj = rng.randn(N, 3).astype(np.float32) * 0.08
    cam = obj @ R.T + t
    # corrupt 40% with gross outliers
    n_out = 80
    cam[:n_out] += rng.randn(n_out, 3) * 0.5
    valid = np.ones(N, bool)
    q, t2, n_inl = ransac_pose(
        jax.random.PRNGKey(0), jnp.asarray(obj), jnp.asarray(cam), jnp.asarray(valid),
        num_hypotheses=128, inlier_threshold=0.01,
    )
    R2 = quat2mat(np.asarray(q))
    assert int(n_inl) >= N - n_out - 10
    np.testing.assert_allclose(R2, R, atol=5e-3)
    np.testing.assert_allclose(np.asarray(t2), t, atol=5e-3)


def test_icp_refines_perturbed_pose():
    rng = np.random.RandomState(2)
    R, t = _rand_pose(rng)
    pts = rng.randn(128, 3).astype(np.float32) * 0.06
    target = (pts @ R.T + t).astype(np.float32)
    # perturb: small rotation + translation offset
    dq = np.array([1.0, 0.03, -0.02, 0.04])
    dq /= np.linalg.norm(dq)
    R0 = quat2mat(dq) @ R
    t0 = t + np.array([0.01, -0.015, 0.02])
    from posecnn_tpu.utils.quaternion_np import mat2quat

    q0 = mat2quat(R0)
    q2, t2 = icp_refine(
        jnp.asarray(q0, jnp.float32), jnp.asarray(t0, jnp.float32),
        jnp.asarray(pts), jnp.asarray(target), jnp.ones(128, bool), iters=30,
        huber_delta=0.05,
    )
    R2 = quat2mat(np.asarray(q2, np.float64))
    err_before = np.linalg.norm(pts @ R0.T + t0 - target, axis=1).mean()
    err_after = np.linalg.norm(pts @ R2.T + np.asarray(t2) - target, axis=1).mean()
    assert err_after < 0.2 * err_before
    assert err_after < 5e-3


def test_synthesizer_renders_scene():
    from posecnn_tpu.data.synthetic import build_ycb_synthesizer
    from posecnn_tpu.data.toy import toy

    ds = toy("train", num_classes=4, num_images=4, height=96, width=128)
    syn = build_ycb_synthesizer(ds, width=128, height=96, min_objects=2, max_objects=3, min_visible=50)
    rng = np.random.RandomState(0)
    fr = syn.render_scene(rng)
    assert fr.color.shape == (96, 128, 3)
    assert fr.label.max() > 0
    for j, cls in enumerate(fr.cls_indexes.astype(int)):
        assert (fr.label == cls).sum() >= 50
        # center column of the pose projects to the stored center
        t = fr.poses[:, 3, j]
        cx = syn.K[0, 0] * t[0] / t[2] + syn.K[0, 2]
        np.testing.assert_allclose(fr.center[j, 0], cx, atol=1e-3)
    # depth is consistent with pose depth at the center pixel area
    assert fr.depth.max() > 0


def test_icp_point_to_plane_energy():
    """Point-to-plane term (round-2 verdict task 9, reference solveICP SDF
    energy): on a flat-ish surface patch a translation offset along the
    normal must be corrected, and the plane term must not degrade the
    point-to-point solution."""
    rng = np.random.RandomState(5)
    # a coarse plane-like model cloud (z = small curvature)
    xy = rng.uniform(-0.06, 0.06, (256, 2)).astype(np.float32)
    z = 0.05 * (xy[:, 0] ** 2 + xy[:, 1] ** 2)
    model = np.column_stack([xy, z]).astype(np.float32)
    q_gt = np.array([1.0, 0, 0, 0], np.float32)
    t_gt = np.array([0.0, 0.0, 0.9], np.float32)
    target = model + t_gt  # dense observed cloud
    normals = np.tile(np.array([0, 0, -1.0], np.float32), (len(target), 1))
    valid = np.ones(len(target), bool)

    q0 = np.array([1.0, 0.004, -0.003, 0.002], np.float32)
    q0 /= np.linalg.norm(q0)
    t0 = t_gt + np.array([0.0, 0.0, 0.02], np.float32)  # offset along normal

    q_pp, t_pp = icp_refine(
        jnp.asarray(q0), jnp.asarray(t0), jnp.asarray(model),
        jnp.asarray(target), jnp.asarray(valid), iters=15,
    )
    q_pl, t_pl = icp_refine(
        jnp.asarray(q0), jnp.asarray(t0), jnp.asarray(model),
        jnp.asarray(target), jnp.asarray(valid), iters=15,
        target_normals=jnp.asarray(normals), plane_weight=1.0,
    )
    err_pp = float(np.linalg.norm(np.asarray(t_pp) - t_gt))
    err_pl = float(np.linalg.norm(np.asarray(t_pl) - t_gt))
    assert err_pl < 0.005, err_pl
    assert err_pl <= err_pp + 1e-4, (err_pl, err_pp)


def test_icp_detections_plane_weight_runs():
    """icp_refine_detections with plane_weight: normals from depth, refined
    poses finite, padding rows untouched."""
    from posecnn_tpu.engine.refine import icp_refine_detections

    H, W = 48, 64
    fx = fy = 60.0
    px, py = W / 2.0, H / 2.0
    depth = np.zeros((H, W), np.float32)
    label = np.zeros((H, W), np.int32)
    depth[10:40, 20:50] = 0.9
    label[10:40, 20:50] = 1
    pts = np.random.RandomState(0).uniform(-0.05, 0.05, (2, 64, 3)).astype(np.float32)
    rois = np.zeros((4, 7), np.float32)
    rois[0] = [0, 1, 20, 10, 50, 40, 1.0]
    poses = np.zeros((4, 7), np.float32)
    poses[:, 0] = 1.0
    poses[0, 4:7] = [0.0, 0.0, 0.95]
    meta = np.zeros(48, np.float32)
    meta[0], meta[2], meta[4], meta[5] = fx, px, fy, py
    out = np.asarray(icp_refine_detections(
        jnp.asarray(rois), jnp.asarray(poses), jnp.asarray(depth),
        jnp.asarray(label), jnp.asarray(pts), jnp.asarray(meta),
        iters=5, max_points=128, plane_weight=2.0,
    ))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[1:], poses[1:], atol=1e-6)  # padding rows
