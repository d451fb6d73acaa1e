"""Flow warping of recurrent 2D state between frames (video GRU path).

Rewrite of lib/computing_flow_layer/computing_flow_op_gpu.cu.cc:17-130:
for every pixel of the current frame with depth > 0, backproject to a
camera-frame 3D point, transform by pose_live2world into the previous
frame's camera, project with K, and average the previous state (and
clamped weights) over a (2k+1)^2 window of pixels whose stored 3D depth
matches within `threshold`. Pixels with no match get state 0 / weight 1.

Returns (warped_state, warped_weights, points) exactly like the reference
(top_points holds the current frame's camera-frame points; NaN where
depth <= 0, matching the CUDA initialization).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from posecnn_tpu.ops.backproject import _camera_points, _meta_parts


def compute_flow(
    data: jnp.ndarray,
    weights: jnp.ndarray,
    points: jnp.ndarray,
    depth: jnp.ndarray,
    meta_data: jnp.ndarray,
    kernel_size: int = 2,
    threshold: float = 0.01,
    max_weight: float = 100.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """data/weights: (B,H,W,C) previous state; points: (B,H,W,3) previous
    3D points; depth: (B,H,W) current depth; meta_data: (B,48)."""

    B, H, W, C = data.shape

    def one(data_b, weights_b, points_b, depth_b, meta_b):
        K, Kinv, _, l2w, _, _ = _meta_parts(meta_b)
        pts = _camera_points(depth_b, Kinv)  # (H,W,3) current camera frame
        world = pts @ l2w[:, :3].T + l2w[:, 3]
        pix = world @ K.T
        px = jnp.round(pix[..., 0] / pix[..., 2]).astype(jnp.int32)
        py = jnp.round(pix[..., 1] / pix[..., 2]).astype(jnp.int32)
        Z1 = world[..., 2]
        has_depth = depth_b > 0

        acc = jnp.zeros_like(data_b)
        acc_w = jnp.zeros_like(weights_b)
        count = jnp.zeros((H, W), jnp.float32)
        for dx in range(-kernel_size, kernel_size + 1):
            for dy in range(-kernel_size, kernel_size + 1):
                x = px + dx
                y = py + dy
                inb = (x >= 0) & (x < W) & (y >= 0) & (y < H) & has_depth
                xc = jnp.clip(x, 0, W - 1)
                yc = jnp.clip(y, 0, H - 1)
                z_prev = points_b[yc, xc, 2]
                match = inb & (jnp.abs(z_prev - Z1) < threshold)
                m = match.astype(jnp.float32)
                acc = acc + m[..., None] * data_b[yc, xc]
                acc_w = acc_w + m[..., None] * jnp.minimum(weights_b[yc, xc], max_weight)
                count = count + m
        has = count > 0
        denom = jnp.maximum(count, 1.0)[..., None]
        top_data = jnp.where(has[..., None], acc / denom, 0.0)
        top_weights = jnp.where(has[..., None], acc_w / denom, 1.0)
        top_points = jnp.where(has_depth[..., None], pts, jnp.nan)
        return top_data, top_weights, top_points

    return jax.vmap(one)(data, weights, points, depth, meta_data)
