"""Render-and-compare matching loss (reference lib/matching_loss/
matching_loss_op.cc + lib/rendering: render the model under the predicted
and GT pose and compare the images). The TPU formulation soft-splats model
points onto an ROI raster — differentiable, no GL context."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posecnn_tpu.ops.matching_loss import (
    matching_loss,
    render_compare_batched,
    render_compare_loss,
    soft_render,
)

INTR = (320.0, 320.0, 160.0, 120.0)


def _cube_points(n=96, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.uniform(-0.04, 0.04, (n, 3)).astype(np.float32))


def _quat(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    q = np.zeros(4, np.float32)
    q[0] = np.cos(angle / 2)
    q[1:] = np.sin(angle / 2) * axis
    return jnp.asarray(q)


def test_soft_render_occupancy_and_depth():
    pts = _cube_points()
    q = _quat([0, 0, 1], 0.0)
    t = jnp.asarray([0.0, 0.0, 0.6], jnp.float32)
    gx = jnp.linspace(120.0, 200.0, 32)
    gy = jnp.linspace(80.0, 160.0, 32)
    occ, dep = soft_render(pts, q, t, INTR, gx, gy)
    occ, dep = np.asarray(occ), np.asarray(dep)
    assert occ.shape == (32, 32) and dep.shape == (32, 32)
    assert 0.0 <= occ.min() and occ.max() < 1.0
    # the object projects near the principal point: center cells covered
    assert occ[16, 16] > 0.5
    assert occ[0, 0] < 0.05  # corner far from the footprint
    # soft depth where occupied is near the true object depth (0.6 +- extent)
    assert abs(dep[16, 16] - 0.6) < 0.06


def test_render_compare_zero_at_gt_and_positive_off_pose():
    pts = _cube_points()
    q = _quat([0, 1, 0], 0.3)
    t = jnp.asarray([0.02, -0.01, 0.7], jnp.float32)
    roi = jnp.asarray([130.0, 90.0, 190.0, 150.0], jnp.float32)
    same = render_compare_loss(q, t, q, t, pts, INTR, roi)
    off = render_compare_loss(_quat([0, 1, 0], 0.9), t, q, t, pts, INTR, roi)
    assert float(same) < 1e-6
    assert float(off) > float(same) + 1e-4


def test_render_compare_gradient_points_toward_gt():
    """A gradient step on the predicted quaternion must reduce the loss —
    the property the reference obtains from its saved bottom_diff."""
    pts = _cube_points()
    qg = _quat([1, 0, 0], 0.0)
    t = jnp.asarray([0.0, 0.0, 0.6], jnp.float32)
    roi = jnp.asarray([120.0, 80.0, 200.0, 160.0], jnp.float32)
    qp = _quat([1, 0, 0], 0.5)

    fn = lambda q: render_compare_loss(q, t, qg, t, pts, INTR, roi)
    l0, g = jax.value_and_grad(fn)(qp)
    assert float(jnp.linalg.norm(g)) > 0
    q1 = qp - 0.5 * g
    l1 = fn(q1)
    assert float(l1) < float(l0)


def test_render_compare_batched_masks_inactive_rows():
    C, P, N = 4, 64, 6
    rng = np.random.RandomState(1)
    points = jnp.asarray(rng.uniform(-0.03, 0.03, (C, P, 3)).astype(np.float32))
    meta = np.zeros(48, np.float32)
    meta[0] = meta[4] = 320.0
    meta[2], meta[5] = 160.0, 120.0
    poses_pred = jnp.asarray(rng.randn(N, 4 * C).astype(np.float32))
    poses_target = poses_pred + 0.1
    w = np.zeros((N, 4 * C), np.float32)
    w[0, 4:8] = 1.0  # row 0 active for class 1; all other rows inactive
    poses_init = np.zeros((N, 7), np.float32)
    poses_init[:, 0] = 1.0
    poses_init[:, 6] = 0.8
    rois = np.zeros((N, 7), np.float32)
    rois[:, 2:6] = [120, 80, 200, 160]
    loss = render_compare_batched(
        poses_pred, poses_target, jnp.asarray(w), jnp.asarray(poses_init),
        jnp.asarray(rois), points, jnp.asarray(meta), C,
    )
    assert np.isfinite(float(loss)) and float(loss) >= 0

    # all rows inactive -> exactly zero
    loss0 = render_compare_batched(
        poses_pred, poses_target, jnp.zeros_like(poses_pred), jnp.asarray(poses_init),
        jnp.asarray(rois), points, jnp.asarray(meta), C,
    )
    assert float(loss0) == 0.0


def test_matching_flag_train_step():
    """TRAIN.MATCHING wiring: one train step with matching_w > 0 runs and
    produces a finite loss_matching next to the other losses."""
    from posecnn_tpu.engine.train import TrainHParams, create_train_state, make_train_step
    from posecnn_tpu.models.posecnn import PoseCNNConfig
    from posecnn_tpu.parallel.mesh import MeshSpec, make_mesh

    C, H, W = 4, 32, 32
    cfg = PoseCNNConfig(
        num_classes=C, num_units=8, trunk_scale=0.25, vertex_reg=True, pose_reg=True,
        is_train=True, keep_prob=1.0, compute_dtype=jnp.float32,
        hough_class_slots=2, hough_max_samples=32, hough_center_stride=4,
        hough_refine_window=8, label_threshold=5, fc_dim=64,
        hough_sampler="approx", use_crop_pool=True,
    )
    hp = TrainHParams(stepsize=100, matching_w=1.0)
    mesh = make_mesh(MeshSpec(data=1, model=1))
    rng = np.random.RandomState(0)
    points = jnp.asarray(rng.randn(C, 16, 3).astype(np.float32) * 0.03)
    symmetry = jnp.zeros(C, jnp.float32)
    extents = jnp.asarray(0.08 + 0.05 * rng.rand(C, 3).astype(np.float32))
    state = create_train_state(cfg, hp, jax.random.PRNGKey(0))
    step = make_train_step(cfg, hp, mesh, points, symmetry, extents, donate=False)
    meta = np.zeros((1, 48), np.float32)
    meta[:, 0] = meta[:, 4] = 60.0
    meta[:, 2], meta[:, 5] = W / 2.0, H / 2.0
    batch = {
        "data": jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32)),
        "gt_label_2d": jnp.asarray(rng.randint(0, C, size=(1, H, W)).astype(np.int32)),
        "vertex_targets": jnp.asarray(rng.randn(1, H, W, 3 * C).astype(np.float32) * 0.1),
        "vertex_weights": jnp.asarray((rng.rand(1, H, W, 3 * C) > 0.7).astype(np.float32)),
        "meta_data": jnp.asarray(meta),
        "poses": jnp.asarray(np.zeros((8, 13), np.float32)),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert "loss_matching" in metrics
    assert np.isfinite(float(metrics["loss_matching"]))
    assert np.isfinite(float(metrics["loss"]))


def test_chamfer_matching_loss_still_zero_at_gt():
    pts = _cube_points()
    q = _quat([0, 0, 1], 0.2)
    t = jnp.asarray([0.0, 0.0, 0.5], jnp.float32)
    assert float(matching_loss(q, t, q, t, pts, INTR)) < 1e-5


def test_add_loss_trains_rotation_with_rescaled_points():
    """Learning-dynamics regression for the inert-pose-head bug: optimizing
    a quaternion through the real ADD loss with the training configuration
    (RESCALED points per minibatch.py:49-63, margin 1e-4, momentum SGD at the
    reference lr) must reduce rotation error; with raw meter-scale points the
    squared-distance hinge leaves no usable gradient and the rotation stays
    where it started (the round-1 failure: median 130 deg at 30K iters)."""
    import optax

    from posecnn_tpu.data.minibatch import rescale_points
    from posecnn_tpu.ops.add_loss import average_distance_loss
    from posecnn_tpu.utils.pose_error import re as rot_err
    from posecnn_tpu.utils.quaternion_np import quat2mat

    rng = np.random.RandomState(0)
    C, P = 4, 128
    raw_pts = rng.uniform(-0.05, 0.05, (C, P, 3)).astype(np.float32)
    extents = np.abs(raw_pts).max(1) * 2
    sym = np.zeros(C, np.float32)
    qgt = np.array([np.cos(0.6), np.sin(0.6), 0, 0], np.float32)  # ~69 deg off
    tgt = np.zeros((8, 4 * C), np.float32)
    w = np.zeros((8, 4 * C), np.float32)
    tgt[:, 4:8] = qgt
    w[:, 4:8] = 1.0
    tgt, w, symj = jnp.asarray(tgt), jnp.asarray(w), jnp.asarray(sym)

    def final_err(points, margin, steps=800):
        pred0 = np.zeros((8, 4 * C), np.float32)
        pred0[:, 4:8] = [1, 0, 0, 0]
        pred = jnp.asarray(np.arctanh(np.clip(pred0, -0.999, 0.999)))
        tx = optax.sgd(0.001, momentum=0.9)
        st = tx.init(pred)
        g = jax.jit(jax.value_and_grad(
            lambda p: average_distance_loss(jnp.tanh(p), tgt, w, points, symj, margin)
        ))
        for _ in range(steps):
            _, gr = g(pred)
            up, st = tx.update(gr, st)
            pred = optax.apply_updates(pred, up)
        q = np.tanh(np.asarray(pred[0, 4:8]))
        q = q / np.linalg.norm(q)
        return rot_err(quat2mat(q.astype(np.float64)), quat2mat(qgt.astype(np.float64)))

    scaled = jnp.asarray(rescale_points(raw_pts, extents, sym))
    err_scaled = final_err(scaled, 1e-4)
    err_raw = final_err(jnp.asarray(raw_pts), 0.01)
    assert err_scaled < 35.0, err_scaled        # trains
    assert err_raw > 60.0, err_raw             # the old setup demonstrably doesn't
