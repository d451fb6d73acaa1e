"""3D voxel-grid ops for the multi-frame / 3D path.

TPU rewrites of three reference CUDA ops (identical forward math, autodiff
backward — the CUDA backwards are exact scatter-adjoints of these gathers):

* `backproject`   — lib/backprojecting_layer/backprojecting_op_gpu.cu.cc:17-130
  lift a 2D feature map + depth into a G^3 voxel grid: each voxel projects
  into the image (pose_world2live then K), averages features over a
  (2k+1)^2 pixel window where |depth - voxel_z| < threshold; empty voxels
  keep the previous 3D label and flag=0.
* `project`       — lib/projecting_layer/projecting_op_gpu.cu.cc:17-70
  inverse lookup: each pixel backprojects (K^-1, depth, pose_live2world)
  to a voxel and reads its feature.
* `compute_label` — lib/computing_label_layer/computing_label_op_gpu.cu.cc
  like `project` but arg-maxes the per-voxel class distribution.

meta_data layout (48 floats) as in the reference: K[0:9], K^-1[9:18],
pose_world2live[18:30], pose_live2world[30:42], voxel step[42:45],
voxel min[45:48].
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _meta_parts(meta: jnp.ndarray):
    K = meta[0:9].reshape(3, 3)
    Kinv = meta[9:18].reshape(3, 3)
    w2l = meta[18:30].reshape(3, 4)
    l2w = meta[30:42].reshape(3, 4)
    step = meta[42:45]
    origin = meta[45:48]
    return K, Kinv, w2l, l2w, step, origin


def _pixel_rays(height: int, width: int, Kinv: jnp.ndarray):
    """K^-1 @ (w, h, 1) for every pixel -> (H,W,3)."""
    ws = jnp.arange(width, dtype=jnp.float32)
    hs = jnp.arange(height, dtype=jnp.float32)
    grid = jnp.stack(
        [
            jnp.broadcast_to(ws[None, :], (height, width)),
            jnp.broadcast_to(hs[:, None], (height, width)),
            jnp.ones((height, width), jnp.float32),
        ],
        axis=-1,
    )
    return grid @ Kinv.T


def _camera_points(depth: jnp.ndarray, Kinv: jnp.ndarray) -> jnp.ndarray:
    """(H,W) depth -> (H,W,3) camera-frame points (depth * K^-1 [w,h,1])."""
    return depth[..., None] * _pixel_rays(depth.shape[0], depth.shape[1], Kinv)


def backproject(
    data: jnp.ndarray,
    label: jnp.ndarray,
    depth: jnp.ndarray,
    meta_data: jnp.ndarray,
    label_3d: jnp.ndarray,
    grid_size: int,
    kernel_size: int,
    threshold: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """data: (B,H,W,C); label: (B,H,W,num_cls); depth: (B,H,W);
    meta_data: (B,48); label_3d: (B,G,G,G,num_cls).
    Returns (top_data (B,G,G,G,C), top_label, top_flag (B,G,G,G,1))."""

    B, H, W, C = data.shape

    def one(data_b, label_b, depth_b, meta_b, label3d_b):
        K, _, w2l, _, step, origin = _meta_parts(meta_b)
        g = jnp.arange(grid_size, dtype=jnp.float32)
        # voxel world coords: X from d, Y from h, Z from w (kernel index order)
        X = g[:, None, None] * step[0] + origin[0]
        Y = g[None, :, None] * step[1] + origin[1]
        Z = g[None, None, :] * step[2] + origin[2]
        P = jnp.stack(
            [
                jnp.broadcast_to(X, (grid_size,) * 3),
                jnp.broadcast_to(Y, (grid_size,) * 3),
                jnp.broadcast_to(Z, (grid_size,) * 3),
            ],
            axis=-1,
        )  # (G,G,G,3)
        live = P @ w2l[:, :3].T + w2l[:, 3]  # (G,G,G,3)
        pix = live @ K.T
        px = jnp.round(pix[..., 0] / pix[..., 2]).astype(jnp.int32)
        py = jnp.round(pix[..., 1] / pix[..., 2]).astype(jnp.int32)
        dvox = live[..., 2]

        acc = jnp.zeros((grid_size,) * 3 + (C,), data_b.dtype)
        acc_lab = jnp.zeros((grid_size,) * 3 + (label_b.shape[-1],), label_b.dtype)
        count = jnp.zeros((grid_size,) * 3, jnp.float32)
        for dx in range(-kernel_size, kernel_size + 1):
            for dy in range(-kernel_size, kernel_size + 1):
                x = px + dx
                y = py + dy
                inb = (x >= 0) & (x < W) & (y >= 0) & (y < H)
                xc = jnp.clip(x, 0, W - 1)
                yc = jnp.clip(y, 0, H - 1)
                d = depth_b[yc, xc]
                on_surface = (jnp.abs(d - dvox) < threshold) & inb
                m = on_surface.astype(jnp.float32)
                acc = acc + m[..., None] * data_b[yc, xc]
                acc_lab = acc_lab + m[..., None] * label_b[yc, xc]
                count = count + m
        has = count > 0
        top_data = jnp.where(has[..., None], acc / jnp.maximum(count, 1.0)[..., None], 0.0)
        top_label = jnp.where(has[..., None], acc_lab, label3d_b)
        top_flag = has.astype(jnp.float32)[..., None]
        return top_data, top_label, top_flag

    return jax.vmap(one)(data, label, depth, meta_data, label_3d)


def project(
    data_3d: jnp.ndarray,
    depth: jnp.ndarray,
    meta_data: jnp.ndarray,
    grid_size: int,
) -> jnp.ndarray:
    """data_3d: (B,G,G,G,C); depth: (B,H,W) -> (B,H,W,C)."""

    def one(vox, depth_b, meta_b):
        _, Kinv, _, l2w, step, origin = _meta_parts(meta_b)
        pts = _camera_points(depth_b, Kinv)
        world = pts @ l2w[:, :3].T + l2w[:, 3]
        vd = jnp.round((world[..., 0] - origin[0]) / step[0]).astype(jnp.int32)
        vh = jnp.round((world[..., 1] - origin[1]) / step[1]).astype(jnp.int32)
        vw = jnp.round((world[..., 2] - origin[2]) / step[2]).astype(jnp.int32)
        inb = (
            (vd >= 0) & (vd < grid_size)
            & (vh >= 0) & (vh < grid_size)
            & (vw >= 0) & (vw < grid_size)
        )
        vdc = jnp.clip(vd, 0, grid_size - 1)
        vhc = jnp.clip(vh, 0, grid_size - 1)
        vwc = jnp.clip(vw, 0, grid_size - 1)
        out = vox[vdc, vhc, vwc]
        return jnp.where(inb[..., None], out, 0.0)

    return jax.vmap(one)(data_3d, depth, meta_data)


def compute_label(
    data_3d: jnp.ndarray,
    depth: jnp.ndarray,
    meta_data: jnp.ndarray,
    grid_size: int,
) -> jnp.ndarray:
    """Per-pixel argmax class of the voxel under each pixel -> (B,H,W) int32."""
    probs = project(data_3d, depth, meta_data, grid_size)
    # out-of-grid pixels read zeros -> argmax = 0 (background), like the kernel
    return jnp.argmax(probs, axis=-1).astype(jnp.int32)
