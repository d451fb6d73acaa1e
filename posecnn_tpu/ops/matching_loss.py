"""Matching loss: render-and-compare pose supervision, differentiable.

The reference's experimental `matching_loss` op (lib/matching_loss/
matching_loss_op.cc:31-62) embeds an OSMesa renderer (lib/rendering) that
rasterizes the object model under the predicted and GT poses and compares
the images. Rasterization is not differentiable and needs a GL context, so
the TPU formulation compares *projected point sets* instead:

  * model points are transformed by the predicted and the GT pose and
    projected with K;
  * the loss is a symmetric chamfer distance between the two projected
    point sets plus an L1 depth-consistency term — zero iff the renders
    would coincide, smooth everywhere, fully differentiable wrt the
    predicted quaternion and translation.

For hard (non-differentiable) render comparison, `silhouette_iou` rasterizes
both poses with the native C++ renderer (host-side, evaluation only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from posecnn_tpu.utils.quaternion import quat2mat


def _project(points, quat, trans, fx, fy, px, py):
    R = quat2mat(quat, normalize=True)
    cam = points @ R.T + trans
    z = jnp.maximum(cam[:, 2], 1e-6)
    return jnp.stack([fx * cam[:, 0] / z + px, fy * cam[:, 1] / z + py], axis=1), cam[:, 2]


def matching_loss(
    quat_pred: jnp.ndarray,
    trans_pred: jnp.ndarray,
    quat_gt: jnp.ndarray,
    trans_gt: jnp.ndarray,
    points: jnp.ndarray,
    intrinsics,
    depth_weight: float = 1.0,
) -> jnp.ndarray:
    """Single-object matching loss. points: (P,3); intrinsics: (fx,fy,px,py)."""
    fx, fy, px, py = intrinsics
    pp, zp = _project(points, quat_pred, trans_pred, fx, fy, px, py)
    pg, zg = _project(points, jax.lax.stop_gradient(quat_gt), jax.lax.stop_gradient(trans_gt), fx, fy, px, py)
    # symmetric chamfer over projected points (P small: dense P x P).
    # direct differences, NOT the |a|^2+|b|^2-2ab expansion: pixel coords are
    # O(100), squares O(1e5), and f32 cancellation there leaves a ~1e-3 floor
    # that never reaches zero at the GT pose
    diff = pp[:, None, :] - pg[None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    chamfer = jnp.mean(jnp.min(d2, axis=1)) + jnp.mean(jnp.min(d2, axis=0))
    depth = jnp.mean(jnp.abs(zp - zg))
    return chamfer + depth_weight * depth


def matching_loss_batched(
    poses_pred: jnp.ndarray,
    poses_target: jnp.ndarray,
    poses_weight: jnp.ndarray,
    poses_init: jnp.ndarray,
    points: jnp.ndarray,
    meta_data_row: jnp.ndarray,
    num_classes: int,
) -> jnp.ndarray:
    """Batched over ROI rows like average_distance_loss: quaternions read
    from the active class slot; translations from poses_init (hough);
    inactive rows contribute zero."""
    fx, px, fy, py = meta_data_row[0], meta_data_row[2], meta_data_row[4], meta_data_row[5]
    w4 = poses_weight.reshape(poses_weight.shape[0], num_classes, 4)
    active = w4[:, :, 0] > 0
    has = jnp.any(active, axis=1)
    cls = jnp.argmax(active, axis=1)
    idx4 = cls[:, None] * 4 + jnp.arange(4)[None, :]
    qp = jnp.take_along_axis(poses_pred, idx4, axis=1)
    qg = jnp.take_along_axis(poses_target, idx4, axis=1)
    t = poses_init[:, 4:7]

    def one(qp_i, qg_i, t_i, cls_i, has_i):
        loss = matching_loss(qp_i, t_i, qg_i, t_i, points[cls_i], (fx, fy, px, py))
        return jnp.where(has_i, loss, 0.0)

    losses = jax.vmap(one)(qp, qg, t, cls, has)
    return jnp.sum(losses) / jnp.maximum(jnp.sum(has), 1)


def soft_render(
    points: jnp.ndarray,
    quat: jnp.ndarray,
    trans: jnp.ndarray,
    intrinsics,
    grid_x: jnp.ndarray,
    grid_y: jnp.ndarray,
    sigma: float = 2.0,
):
    """Differentiable point-splat render: soft silhouette + soft depth.

    TPU formulation of the reference render step inside the matching loss
    (lib/matching_loss/matching_loss_op.cc:135-140 calls render_.render on
    the predicted and GT poses): each model point splats a Gaussian of width
    `sigma` px onto the raster; occupancy is a smooth max over points and
    depth a softmin-weighted average. Dense (H, W, P) math — no scatter, no
    GL context, exact gradients wrt quat/trans.

    grid_x: (W,) pixel-center xs; grid_y: (H,) pixel-center ys.
    Returns (occupancy (H, W) in [0, 1), depth (H, W) in meters).
    """
    fx, fy, px, py = intrinsics
    uv, z = _project(points, quat, trans, fx, fy, px, py)
    # (H, W, P) squared pixel distance from each grid cell to each splat
    du = grid_x[None, :, None] - uv[None, None, :, 0]
    dv = grid_y[:, None, None] - uv[None, None, :, 1]
    w = jnp.exp(-(du * du + dv * dv) / (2.0 * sigma * sigma))
    # smooth max: 1 - prod(1 - w) == P(any splat covers), stable in log space
    occ = 1.0 - jnp.exp(jnp.sum(jnp.log1p(-jnp.minimum(w, 1.0 - 1e-6)), axis=-1))
    # soft z-buffer: softmin over depth among covering splats
    zw = w * jax.nn.softmax(-z[None, None, :] * 20.0, axis=-1)
    depth = jnp.sum(zw * z[None, None, :], axis=-1) / jnp.maximum(
        jnp.sum(zw, axis=-1), 1e-8
    )
    return occ, depth


def render_compare_loss(
    quat_pred: jnp.ndarray,
    trans_pred: jnp.ndarray,
    quat_gt: jnp.ndarray,
    trans_gt: jnp.ndarray,
    points: jnp.ndarray,
    intrinsics,
    roi: jnp.ndarray,
    raster: int = 32,
    sigma: float = 2.0,
    depth_weight: float = 1.0,
) -> jnp.ndarray:
    """Render-and-compare matching loss: rasterize the model under the
    predicted and GT poses on a `raster`x`raster` grid over the ROI and
    penalize silhouette + masked-depth disagreement. Differentiable
    counterpart of the reference matching loss (render both poses, compare
    images); the GT render carries no gradient."""
    x1, y1, x2, y2 = roi[0], roi[1], roi[2], roi[3]
    gx = x1 + (x2 - x1) * (jnp.arange(raster) + 0.5) / raster
    gy = y1 + (y2 - y1) * (jnp.arange(raster) + 0.5) / raster
    occ_p, dep_p = soft_render(points, quat_pred, trans_pred, intrinsics, gx, gy, sigma)
    occ_g, dep_g = soft_render(
        points,
        jax.lax.stop_gradient(quat_gt),
        jax.lax.stop_gradient(trans_gt),
        intrinsics,
        gx,
        gy,
        sigma,
    )
    occ_g = jax.lax.stop_gradient(occ_g)
    dep_g = jax.lax.stop_gradient(dep_g)
    sil = jnp.mean((occ_p - occ_g) ** 2)
    both = occ_p * occ_g  # depth compared where both silhouettes live
    dep = jnp.sum(both * jnp.abs(dep_p - dep_g)) / jnp.maximum(jnp.sum(both), 1e-6)
    return sil + depth_weight * dep


def render_compare_batched(
    poses_pred: jnp.ndarray,
    poses_target: jnp.ndarray,
    poses_weight: jnp.ndarray,
    poses_init: jnp.ndarray,
    rois: jnp.ndarray,
    points: jnp.ndarray,
    meta_data_row: jnp.ndarray,
    num_classes: int,
    raster: int = 32,
    sigma: float = 2.0,
) -> jnp.ndarray:
    """Render-and-compare over the padded hough ROI rows (the shape the
    reference op takes: pose (N, 4C), gt, rois, meta — matching_loss_op.cc
    inputs). Each valid row renders its class model under the predicted
    quaternion + hough translation and under the GT pose, on a raster over
    its ROI. Inactive rows contribute zero."""
    fx, px, fy, py = meta_data_row[0], meta_data_row[2], meta_data_row[4], meta_data_row[5]
    w4 = poses_weight.reshape(poses_weight.shape[0], num_classes, 4)
    active = w4[:, :, 0] > 0
    has = jnp.any(active, axis=1)
    cls = jnp.argmax(active, axis=1)
    idx4 = cls[:, None] * 4 + jnp.arange(4)[None, :]
    qp = jnp.take_along_axis(poses_pred, idx4, axis=1)
    qg = jnp.take_along_axis(poses_target, idx4, axis=1)
    t = poses_init[:, 4:7]

    def one(qp_i, qg_i, t_i, cls_i, roi_i, has_i):
        pts = jnp.take(points, cls_i, axis=0)
        loss = render_compare_loss(
            qp_i, t_i, qg_i, t_i, pts, (fx, fy, px, py),
            roi_i, raster=raster, sigma=sigma,
        )
        return jnp.where(has_i, loss, 0.0)

    losses = jax.vmap(one)(qp, qg, t, cls, rois[:, 2:6], has)
    return jnp.sum(losses) / jnp.maximum(jnp.sum(has), 1)


def silhouette_iou(vertices, faces, pose_a, pose_b, K, height, width) -> float:
    """Host-side hard render comparison via the native rasterizer."""
    import numpy as np

    from posecnn_tpu.native import rasterize_depth

    masks = []
    for pose in (pose_a, pose_b):
        d = np.zeros((height, width), np.float32)
        l = np.zeros((height, width), np.int32)
        rasterize_depth(d, l, vertices, faces, pose, K, 1)
        masks.append(l > 0)
    inter = (masks[0] & masks[1]).sum()
    union = (masks[0] | masks[1]).sum()
    return float(inter) / max(float(union), 1.0)
