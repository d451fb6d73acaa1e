"""6-DoF pose error metrics (Hodan et al. ECCVW 2016 definitions).

NumPy implementations matching the reference (`lib/utils/pose_error.py:25-117`)
used by dataset evaluation, plus vectorized JAX twins (suffix `_jax`) usable
inside jit for on-device evaluation. The reference's `adi` uses a cKDTree;
the JAX twin uses a blocked squared-distance matmul (MXU-friendly) with
identical results (nearest-neighbor mean distance).
"""

from __future__ import annotations

import numpy as np


def transform_pts_Rt(pts: np.ndarray, R: np.ndarray, t: np.ndarray) -> np.ndarray:
    assert pts.shape[1] == 3
    return (R @ pts.T + t.reshape(3, 1)).T


def add(R_est, t_est, R_gt, t_gt, pts) -> float:
    """Average distance of model points (ADD), Hinterstoisser ACCV 2012."""
    pts_est = transform_pts_Rt(pts, R_est, t_est)
    pts_gt = transform_pts_Rt(pts, R_gt, t_gt)
    return float(np.linalg.norm(pts_est - pts_gt, axis=1).mean())


def adi(R_est, t_est, R_gt, t_gt, pts) -> float:
    """ADD-S: symmetric variant via nearest-neighbor matching."""
    from scipy import spatial

    pts_est = transform_pts_Rt(pts, R_est, t_est)
    pts_gt = transform_pts_Rt(pts, R_gt, t_gt)
    nn_dists, _ = spatial.cKDTree(pts_est).query(pts_gt, k=1)
    return float(nn_dists.mean())


def reproj(K, R_est, t_est, R_gt, t_gt, pts) -> float:
    """Mean 2D reprojection error in pixels."""
    pts_est = transform_pts_Rt(pts, R_est, t_est)
    pts_gt = transform_pts_Rt(pts, R_gt, t_gt)
    pe = (K @ pts_est.T).T
    pg = (K @ pts_gt.T).T
    est = pe[:, :2] / pe[:, 2:3]
    gt = pg[:, :2] / pg[:, 2:3]
    return float(np.linalg.norm(est - gt, axis=1).mean())


def re(R_est, R_gt) -> float:
    """Rotational error in degrees."""
    assert R_est.shape == R_gt.shape == (3, 3)
    error_cos = 0.5 * (np.trace(R_est @ np.linalg.inv(R_gt)) - 1.0)
    error_cos = min(1.0, max(-1.0, error_cos))
    return float(180.0 * np.arccos(error_cos) / np.pi)


def te(t_est, t_gt) -> float:
    """Translational error (L2)."""
    assert t_est.size == t_gt.size == 3
    return float(np.linalg.norm(t_gt.flatten() - t_est.flatten()))


# ---------------------------------------------------------------------------
# JAX twins (batched, jit-safe)
# ---------------------------------------------------------------------------

def add_jax(R_est, t_est, R_gt, t_gt, pts):
    import jax.numpy as jnp

    pe = pts @ jnp.swapaxes(R_est, -1, -2) + t_est[..., None, :]
    pg = pts @ jnp.swapaxes(R_gt, -1, -2) + t_gt[..., None, :]
    return jnp.linalg.norm(pe - pg, axis=-1).mean(axis=-1)


def adi_jax(R_est, t_est, R_gt, t_gt, pts):
    """ADD-S via dense pairwise distances: |a|^2 + |b|^2 - 2ab^T (MXU matmul)."""
    import jax.numpy as jnp

    pe = pts @ jnp.swapaxes(R_est, -1, -2) + t_est[..., None, :]
    pg = pts @ jnp.swapaxes(R_gt, -1, -2) + t_gt[..., None, :]
    d2 = (
        jnp.sum(pg * pg, axis=-1)[..., :, None]
        + jnp.sum(pe * pe, axis=-1)[..., None, :]
        - 2.0 * jnp.einsum("...ik,...jk->...ij", pg, pe)
    )
    nn = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 0.0))
    return nn.mean(axis=-1)


def re_jax(R_est, R_gt):
    import jax.numpy as jnp

    c = 0.5 * (jnp.trace(R_est @ jnp.swapaxes(R_gt, -1, -2), axis1=-2, axis2=-1) - 1.0)
    return jnp.degrees(jnp.arccos(jnp.clip(c, -1.0, 1.0)))


def te_jax(t_est, t_gt):
    import jax.numpy as jnp

    return jnp.linalg.norm(t_gt - t_est, axis=-1)
