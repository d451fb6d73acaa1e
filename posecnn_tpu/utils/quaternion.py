"""Quaternion math (w, x, y, z convention), JAX-native.

The rotation-matrix layout matches the reference CUDA kernel
(`lib/average_distance_loss/average_distance_loss_op_gpu.cu.cc:59-90`) and
`transforms3d.quaternions.quat2mat` (Hamilton, scalar-first, assumes unit
norm unless `normalize=True`).

All functions are shape-polymorphic over leading batch dims and jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat2mat(q: jnp.ndarray, normalize: bool = False) -> jnp.ndarray:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix."""
    if normalize:
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    s, u, v, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = s * s + u * u - v * v - w * w
    r01 = 2 * (u * v - s * w)
    r02 = 2 * (u * w + s * v)
    r10 = 2 * (u * v + s * w)
    r11 = s * s - u * u + v * v - w * w
    r12 = 2 * (v * w - s * u)
    r20 = 2 * (u * w - s * v)
    r21 = 2 * (v * w + s * u)
    r22 = s * s - u * u - v * v + w * w
    rows = [
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def mat2quat(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> (..., 4) wxyz unit quaternion.

    Branchless Shepperd's method: computes all four candidate quaternions and
    selects the best-conditioned one, so it is jit/vmap safe (no data-dependent
    control flow).
    """
    m = R
    t = jnp.trace(m, axis1=-2, axis2=-1)
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]

    # candidate 0: trace-dominant
    q0 = jnp.stack(
        [
            1.0 + t,
            m[..., 2, 1] - m[..., 1, 2],
            m[..., 0, 2] - m[..., 2, 0],
            m[..., 1, 0] - m[..., 0, 1],
        ],
        axis=-1,
    )
    # candidate 1: m00-dominant
    q1 = jnp.stack(
        [
            m[..., 2, 1] - m[..., 1, 2],
            1.0 + m00 - m11 - m22,
            m[..., 0, 1] + m[..., 1, 0],
            m[..., 0, 2] + m[..., 2, 0],
        ],
        axis=-1,
    )
    # candidate 2: m11-dominant
    q2 = jnp.stack(
        [
            m[..., 0, 2] - m[..., 2, 0],
            m[..., 0, 1] + m[..., 1, 0],
            1.0 + m11 - m00 - m22,
            m[..., 1, 2] + m[..., 2, 1],
        ],
        axis=-1,
    )
    # candidate 3: m22-dominant
    q3 = jnp.stack(
        [
            m[..., 1, 0] - m[..., 0, 1],
            m[..., 0, 2] + m[..., 2, 0],
            m[..., 1, 2] + m[..., 2, 1],
            1.0 + m22 - m00 - m11,
        ],
        axis=-1,
    )
    scores = jnp.stack([1.0 + t, 1.0 + m00 - m11 - m22, 1.0 + m11 - m00 - m22, 1.0 + m22 - m00 - m11], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    # canonical sign: w >= 0
    return jnp.where(q[..., :1] < 0, -q, q)


def qmult(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of wxyz quaternions."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def qconj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def rotate_points(q: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Rotate (..., P, 3) points by (..., 4) quaternion."""
    R = quat2mat(q)
    return jnp.einsum("...ij,...pj->...pi", R, pts)


def quat_angle(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Angle in radians between two unit quaternions (rotation distance)."""
    d = jnp.abs(jnp.sum(q1 * q2, axis=-1))
    return 2.0 * jnp.arccos(jnp.clip(d, -1.0, 1.0))
