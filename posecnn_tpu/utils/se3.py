"""SE(3) helpers on 3x4 [R|t] matrices.

Same contract as the reference (`lib/utils/se3.py:10-31`) but written for both
NumPy arrays and JAX tracers (pure jnp-compatible ops), with batched variants.
"""

from __future__ import annotations

import numpy as np


def se3_inverse(RT):
    """Invert a 3x4 rigid transform (works on numpy or jax arrays)."""
    xp = _xp(RT)
    R = RT[..., 0:3, 0:3]
    T = RT[..., 0:3, 3:4]
    Rt = xp.swapaxes(R, -1, -2)
    Tn = -xp.matmul(Rt, T)
    return xp.concatenate([Rt, Tn], axis=-1)


def se3_mul(RT1, RT2):
    """Compose rigid transforms: result = RT1 @ RT2 (3x4 each)."""
    xp = _xp(RT1)
    R1, T1 = RT1[..., 0:3, 0:3], RT1[..., 0:3, 3:4]
    R2, T2 = RT2[..., 0:3, 0:3], RT2[..., 0:3, 3:4]
    R = xp.matmul(R1, R2)
    T = xp.matmul(R1, T2) + T1
    return xp.concatenate([R, T], axis=-1)


def transform_points(RT, pts):
    """Apply (..., 3, 4) transform to (..., P, 3) points -> (..., P, 3)."""
    xp = _xp(RT)
    R, T = RT[..., 0:3, 0:3], RT[..., 0:3, 3]
    return xp.matmul(pts, xp.swapaxes(R, -1, -2)) + T[..., None, :]


def _xp(a):
    if isinstance(a, np.ndarray):
        return np
    import jax.numpy as jnp

    return jnp
