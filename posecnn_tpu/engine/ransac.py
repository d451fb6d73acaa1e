"""Batched RANSAC pose estimation from per-pixel 3D object coordinates.

Replaces the reference's C++ `Ransac3D::estimatePose`
(lib/pose_estimation/src/ransac3D.cpp, Brachmann-style) and the 2D Hough/PnP
variants in lib/synthesize (estimatePose2D/3D): the VERTEX_REG_3D head
predicts, per pixel, the 3D coordinate on the object surface; RANSAC finds
the rigid transform mapping object coordinates to camera-frame points.

TPU design: all hypotheses evaluated in parallel —
  * sample N triplets of (object_coord, camera_point) correspondences with a
    PRNG key (fixed N, fixed triplet size 3);
  * closed-form Kabsch (SVD of a 3x3) per hypothesis under vmap;
  * score every hypothesis against all correspondences at once
    (hypotheses x points residual tensor, one batched matmul);
  * winner refined by weighted Kabsch over its inliers.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from posecnn_tpu.utils.quaternion import mat2quat


def kabsch(src: jnp.ndarray, dst: jnp.ndarray, weights: jnp.ndarray = None):
    """Least-squares rigid transform src->dst. src/dst (N,3) -> (R (3,3), t (3,))."""
    if weights is None:
        weights = jnp.ones(src.shape[0], src.dtype)
    w = weights / jnp.maximum(jnp.sum(weights), 1e-9)
    mu_s = jnp.sum(src * w[:, None], axis=0)
    mu_d = jnp.sum(dst * w[:, None], axis=0)
    S = (src - mu_s).T @ ((dst - mu_d) * w[:, None])
    U, _, Vt = jnp.linalg.svd(S)
    # standard det-sign correction diag(1,1,d); d==0 (rank-deficient
    # covariance, e.g. all-zero inputs) is clamped to +1 so R stays a
    # proper rotation instead of a rank-2 projection
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    d = jnp.where(d == 0, 1.0, d)
    D = jnp.diag(jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d]))
    R = Vt.T @ D @ U.T
    t = mu_d - R @ mu_s
    return R, t


def ransac_pose(
    key: jax.Array,
    obj_coords: jnp.ndarray,
    cam_points: jnp.ndarray,
    valid: jnp.ndarray,
    num_hypotheses: int = 256,
    inlier_threshold: float = 0.01,
    refine_iters: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """obj_coords/cam_points: (N,3) correspondences; valid: (N,) mask.

    Returns (quat wxyz (4,), trans (3,), inlier_count ())."""
    N = obj_coords.shape[0]
    p_valid = valid.astype(jnp.float32)
    p_valid = p_valid / jnp.maximum(jnp.sum(p_valid), 1.0)

    # sample triplets ~ valid mask (with replacement; degenerate triplets
    # score poorly and lose, like the reference's rejection)
    idx = jax.random.choice(key, N, shape=(num_hypotheses, 3), p=p_valid)
    src3 = obj_coords[idx]  # (H,3,3)
    dst3 = cam_points[idx]

    def hyp(src, dst):
        R, t = kabsch(src, dst)
        return R, t

    Rs, ts = jax.vmap(hyp)(src3, dst3)  # (H,3,3), (H,3)

    # score all hypotheses: residual (H,N)
    pred = jnp.einsum("hij,nj->hni", Rs, obj_coords) + ts[:, None, :]
    res = jnp.linalg.norm(pred - cam_points[None], axis=-1)
    inl = (res < inlier_threshold) & valid[None, :]
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)
    R, t = Rs[best], ts[best]

    # iterative weighted refinement on inliers of the current estimate
    def refine(_, Rt):
        R, t = Rt
        pred = obj_coords @ R.T + t
        res = jnp.linalg.norm(pred - cam_points, axis=-1)
        w = ((res < inlier_threshold) & valid).astype(jnp.float32)
        w = jnp.where(jnp.sum(w) >= 3, w, valid.astype(jnp.float32))
        return kabsch(obj_coords, cam_points, w)

    R, t = jax.lax.fori_loop(0, refine_iters, refine, (R, t))
    pred = obj_coords @ R.T + t
    res = jnp.linalg.norm(pred - cam_points, axis=-1)
    n_inl = jnp.sum((res < inlier_threshold) & valid)
    return mat2quat(R), t, n_inl


def ransac_from_maps(
    key: jax.Array,
    vertex_pred_3d: jnp.ndarray,
    label: jnp.ndarray,
    depth: jnp.ndarray,
    cls: jnp.ndarray,
    extents_cls: jnp.ndarray,
    fx, fy, px, py,
    max_points: int = 512,
    **kwargs,
):
    """Estimate the pose of class `cls` from dense object-coordinate
    predictions (H,W,3 channels for this class), label and depth maps."""
    from posecnn_tpu.engine.refine import sample_object_cloud

    # one sampling pass returns the pixel indices so the camera points and
    # the object coordinates are guaranteed to come from the SAME pixels
    cam, valid, idx = sample_object_cloud(
        depth, label, cls, fx, fy, px, py, max_points, return_index=True
    )
    # object coordinates are predicted in the [0,1] extent-normalized frame
    # (VERTEX_REG_3D scaling: v/extent + 0.5, minibatch.py _scale_vertmap) —
    # unscale with the matching inverse (reference _unscale_vertmap)
    oc = (vertex_pred_3d.reshape(-1, 3)[idx] - 0.5) * extents_cls[None, :]
    return ransac_pose(key, oc, cam, valid, **kwargs)
