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
