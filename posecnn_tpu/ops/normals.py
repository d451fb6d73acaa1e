"""Depth-to-normals: TPU stencil replacing `lib/normals/compute_normals.cu`.

Backprojects depth to camera-frame points with K^-1 and estimates the normal
at every pixel as the (normalized) cross product of the local x/y point
gradients, oriented toward the camera. Runs as fused XLA elementwise ops
(VPU) inside the jit graph — the reference launched a CUDA kernel per frame.
"""

from __future__ import annotations

import jax.numpy as jnp


def backproject_depth(depth: jnp.ndarray, fx, fy, px, py) -> jnp.ndarray:
    """depth (H,W) -> camera-frame points (H,W,3)."""
    h, w = depth.shape
    x = jnp.arange(w, dtype=depth.dtype)[None, :]
    y = jnp.arange(h, dtype=depth.dtype)[:, None]
    X = (x - px) / fx * depth
    Y = (y - py) / fy * depth
    return jnp.stack([X, Y, depth], axis=-1)


def compute_normals(depth: jnp.ndarray, fx, fy, px, py, depth_cutoff: float = 20.0) -> jnp.ndarray:
    """depth (H,W) -> unit normals (H,W,3); invalid pixels get 0."""
    pts = backproject_depth(depth, fx, fy, px, py)
    # central differences with edge replication
    dx = jnp.gradient(pts, axis=1)
    dy = jnp.gradient(pts, axis=0)
    n = jnp.cross(dy, dx)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-8)
    # orient toward camera: n · p < 0
    flip = jnp.sum(n * pts, axis=-1, keepdims=True) > 0
    n = jnp.where(flip, -n, n)
    valid = (depth > 0) & (depth < depth_cutoff)
    return jnp.where(valid[..., None], n, 0.0)
