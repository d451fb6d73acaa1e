"""Pose refinement on TPU: ICP as batched Gauss-Newton inside jit.

Replaces the reference's host-side C++/OpenGL refiners:
  * `Synthesizer::solveICP` (lib/synthesize/synthesize.cpp:2052-2200) —
    render predicted-pose depth, match against measured depth, SDF energy;
  * `Refiner::render` (lib/pose_refinement/refinement.cpp).

TPU formulation (no rendering needed):
  * the target cloud is the measured depth backprojected at the pixels the
    network labeled as the object (fixed-size sample);
  * each iteration transforms the model points by the current pose, finds
    nearest target points (blocked squared-distance matmul on the MXU, like
    the ADD-S loss), Huber-weights the residuals and solves the 6-dof
    point-to-point Gauss-Newton normal equations in closed form;
  * everything is fixed-shape and runs under jit/vmap — one call refines all
    detections of a frame in parallel.

Also provides `refine_translation`, the cheap depth-median translation
correction the reference applies before ICP (test.py poses_new path).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from posecnn_tpu.utils.quaternion import mat2quat, quat2mat


def sample_object_cloud(
    depth: jnp.ndarray,
    label: jnp.ndarray,
    cls: jnp.ndarray,
    fx, fy, px, py,
    max_points: int = 512,
    return_index: bool = False,
):
    """Backproject up to max_points depth pixels of class `cls`.

    Returns (points (max_points,3), valid (max_points,)) — plus the flat
    pixel index (max_points,) with `return_index` (so callers pairing other
    per-pixel maps, e.g. the 3D object-coordinate RANSAC, gather the SAME
    pixels). Deterministic stride sampling in row-major order (like hough
    pixel sampling); the stride rounds UP so the sample spans the whole
    object instead of truncating its bottom rows when the class-pixel count
    is not a multiple of max_points.
    """
    H, W = depth.shape
    flat_d = depth.reshape(-1)
    flat_l = label.reshape(-1)
    m = (flat_l == cls) & (flat_d > 0)
    rank = jnp.cumsum(m) - 1
    total = jnp.maximum(jnp.sum(m), 1)
    stride = jnp.maximum((total + max_points - 1) // max_points, 1)
    take = m & (rank % stride == 0)
    srank = jnp.cumsum(take) - 1
    keep = take & (srank < max_points)
    dest = jnp.where(keep, srank, max_points)
    idx = jnp.zeros((max_points + 1,), jnp.int32).at[dest].set(
        jnp.arange(H * W, dtype=jnp.int32), mode="drop"
    )[:max_points]
    n_kept = jnp.minimum(jnp.sum(take), max_points)
    valid = jnp.arange(max_points) < n_kept
    x = (idx % W).astype(jnp.float32)
    y = (idx // W).astype(jnp.float32)
    z = flat_d[idx]
    pts = jnp.stack([(x - px) / fx * z, (y - py) / fy * z, z], axis=-1)
    pts = jnp.where(valid[:, None], pts, 0.0)
    if return_index:
        return pts, valid, idx
    return pts, valid


def _nearest(src: jnp.ndarray, tgt: jnp.ndarray, tgt_valid: jnp.ndarray):
    """For each src point, index + sq-distance of nearest valid tgt point."""
    d2 = (
        jnp.sum(src * src, axis=-1)[:, None]
        + jnp.sum(tgt * tgt, axis=-1)[None, :]
        - 2.0 * src @ tgt.T
    )
    d2 = jnp.where(tgt_valid[None, :], d2, jnp.inf)
    j = jnp.argmin(d2, axis=-1)
    return j, jnp.take_along_axis(d2, j[:, None], axis=1)[:, 0]


def icp_refine(
    quat: jnp.ndarray,
    trans: jnp.ndarray,
    model_points: jnp.ndarray,
    target_points: jnp.ndarray,
    target_valid: jnp.ndarray,
    iters: int = 20,
    huber_delta: float = 0.01,
    damping: float = 1e-6,
    model_valid: Optional[jnp.ndarray] = None,
    target_normals: Optional[jnp.ndarray] = None,
    plane_weight: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Refine one 6-DoF pose. quat (4,) wxyz, trans (3,), model_points (P,3),
    target_points (T,3) camera frame. Returns (quat, trans) refined.
    model_valid (P,) masks padded/invalid source points out of the solve.

    target_normals (T,3) + plane_weight > 0 add a point-to-plane energy
    n . (src - tgt) — the first-order equivalent of the reference solveICP's
    rendered-SDF term (synthesize.cpp:2052-2200: the SDF gradient at the
    surface IS the surface normal), which constrains the pose along the
    surface where point-to-point matches slide."""

    def step(_, state):
        R, t = state
        src = model_points @ R.T + t  # (P,3)
        j, d2 = _nearest(src, target_points, target_valid)
        tgt = target_points[j]
        r = jnp.sqrt(jnp.maximum(d2, 1e-12))
        w = jnp.where(r <= huber_delta, 1.0, huber_delta / r)  # Huber IRLS
        w = jnp.where(jnp.isfinite(d2), w, 0.0)
        if model_valid is not None:
            w = w * model_valid.astype(w.dtype)

        # point-to-point GN on xi = (omega, v): residual = src + J xi - tgt
        # J = [-[src]x | I]
        e = src - tgt  # (P,3)
        sx, sy, sz = src[:, 0], src[:, 1], src[:, 2]
        zeros = jnp.zeros_like(sx)
        # rows of -[s]x for each residual axis
        Jw = jnp.stack(
            [
                jnp.stack([zeros, sz, -sy], axis=-1),
                jnp.stack([-sz, zeros, sx], axis=-1),
                jnp.stack([sy, -sx, zeros], axis=-1),
            ],
            axis=1,
        )  # (P,3,3): d(res)/d(omega)
        I3 = jnp.broadcast_to(jnp.eye(3), (src.shape[0], 3, 3))
        J = jnp.concatenate([Jw, I3], axis=-1)  # (P,3,6)
        Wd = w[:, None, None]
        H = jnp.einsum("pij,pik->jk", J * Wd, J)  # (6,6)
        g = jnp.einsum("pij,pi->j", J * Wd, e)
        if target_normals is not None and plane_weight > 0:
            n = target_normals[j]  # (P,3) normal at the matched target
            n_ok = jnp.sum(n * n, axis=-1) > 0.5  # zero normal = invalid pixel
            r_pl = jnp.sum(n * e, axis=-1)  # (P,) signed plane distance
            a = jnp.abs(r_pl)
            w_pl = jnp.where(a <= huber_delta, 1.0, huber_delta / jnp.maximum(a, 1e-12))
            w_pl = w_pl * w * n_ok.astype(w.dtype)  # share validity gating
            Jp = jnp.einsum("pi,pij->pj", n, J)  # (P,6)
            JpW = Jp * (plane_weight * w_pl)[:, None]
            H = H + jnp.einsum("pj,pk->jk", JpW, Jp)
            g = g + jnp.einsum("pj,p->j", JpW, r_pl)
        dx = -jnp.linalg.solve(H + damping * jnp.eye(6), g)
        omega, v = dx[:3], dx[3:]
        # exponential map (small-angle Rodrigues)
        theta = jnp.linalg.norm(omega) + 1e-12
        k = omega / theta
        K = jnp.array(
            [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]]
        )
        dR = jnp.eye(3) + jnp.sin(theta) * K + (1 - jnp.cos(theta)) * (K @ K)
        return dR @ R, dR @ t + v

    R0 = quat2mat(quat, normalize=True)
    R, t = jax.lax.fori_loop(0, iters, step, (R0, trans))
    return mat2quat(R), t


def refine_translation(
    quat: jnp.ndarray,
    trans: jnp.ndarray,
    target_points: jnp.ndarray,
    target_valid: jnp.ndarray,
) -> jnp.ndarray:
    """Correct the depth of the initial translation with the median observed
    object depth along the same viewing ray (the reference's cheap
    'poses_new' refinement before full ICP)."""
    z = jnp.where(target_valid, target_points[:, 2], jnp.nan)
    z_med = jnp.nanmedian(z)
    z_med = jnp.where(jnp.isfinite(z_med), z_med, trans[2])
    scale = z_med / jnp.maximum(trans[2], 1e-6)
    return trans * scale


def icp_refine_detections(
    rois: jnp.ndarray,
    poses: jnp.ndarray,
    depth: jnp.ndarray,
    label: jnp.ndarray,
    points_all: jnp.ndarray,
    meta: jnp.ndarray,
    iters: int = 20,
    max_points: int = 512,
    plane_weight: float = 0.0,
):
    """Vectorized over detections: rois (R,7), poses (R,7) [quat|t],
    depth/label (H,W), points_all (C,P,3), meta (48,).
    Returns refined poses (R,7). plane_weight > 0 adds the point-to-plane
    energy (normals from the measured depth, computed once per frame)."""
    fx, px, fy, py = meta[0], meta[2], meta[4], meta[5]
    normal_map = None
    if plane_weight > 0:
        from posecnn_tpu.ops.normals import compute_normals

        normal_map = compute_normals(depth, fx, fy, px, py).reshape(-1, 3)

    def one(roi, pose):
        cls = roi[1].astype(jnp.int32)
        tgt, tv, idx = sample_object_cloud(
            depth, label, cls, fx, fy, px, py, max_points, return_index=True
        )
        tn = normal_map[idx] if normal_map is not None else None
        t_new = refine_translation(pose[:4], pose[4:7], tgt, tv)
        q, t = icp_refine(
            pose[:4], t_new, points_all[cls], tgt, tv, iters=iters,
            target_normals=tn, plane_weight=plane_weight,
        )
        ok = (jnp.sum(tv) > 16) & (roi[1] > 0)
        q = jnp.where(ok, q, pose[:4])
        t = jnp.where(ok, t, pose[4:7])
        return jnp.concatenate([q, t])

    return jax.vmap(one)(rois, poses)
