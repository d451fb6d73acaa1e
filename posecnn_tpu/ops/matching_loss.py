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
    # symmetric chamfer over projected points (P small: dense P x P)
    d2 = (
        jnp.sum(pp * pp, axis=1)[:, None]
        + jnp.sum(pg * pg, axis=1)[None, :]
        - 2.0 * pp @ pg.T
    )
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
