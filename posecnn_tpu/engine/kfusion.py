"""TSDF fusion pipeline ("KinectFusion") on TPU.

Rewrite of the reference's lib/kinect_fusion C++/CUDA package (12.9k LoC:
bilateral filter, ICP odometry, TSDF fusion, raycasting, per-voxel class
probability fusion; bound via kfusion.pyx feed_data/solve_pose/fuse_depth/
feed_label/extract_surface/render/back_project). Everything here is
fixed-shape JAX: the volume is a dense (G,G,G) SDF+weight grid (+ optional
(G,G,G,C) class-probability grid), updates and raycasts are jit-compiled.

Surface extraction comes in two forms: fast zero-crossing voxel extraction
(points + labels, used by ICP odometry) and a triangulated mesh via
marching *tetrahedra* (`marching_tetrahedra`) — the TPU redesign of the
reference's CUDA marching cubes (src/surface/marching_cubes.cu): 16-case
tet table instead of 256-case cube table, active-cell compaction, fixed
output shapes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from posecnn_tpu.utils.se3 import se3_inverse, se3_mul


@dataclass
class TSDFVolume:
    sdf: jnp.ndarray        # (G,G,G) truncated signed distance
    weight: jnp.ndarray     # (G,G,G)
    origin: jnp.ndarray     # (3,) world coords of voxel (0,0,0)
    voxel_size: float
    truncation: float
    class_prob: Optional[jnp.ndarray] = None  # (G,G,G,C)

    @property
    def grid_size(self):
        return self.sdf.shape[0]


def create_volume(grid_size: int, origin, voxel_size: float, truncation: Optional[float] = None,
                  num_classes: Optional[int] = None) -> TSDFVolume:
    trunc = truncation if truncation is not None else 5.0 * voxel_size
    cp = None
    if num_classes:
        cp = jnp.zeros((grid_size,) * 3 + (num_classes,), jnp.float32)
    return TSDFVolume(
        sdf=jnp.ones((grid_size,) * 3, jnp.float32),
        weight=jnp.zeros((grid_size,) * 3, jnp.float32),
        origin=jnp.asarray(origin, jnp.float32),
        voxel_size=float(voxel_size),
        truncation=float(trunc),
        class_prob=cp,
    )


def bilateral_filter(depth: jnp.ndarray, radius: int = 2, sigma_space: float = 1.5,
                     sigma_depth: float = 0.03) -> jnp.ndarray:
    """Edge-preserving depth smoothing (kinect_fusion feed_data preprocessing)."""
    acc = jnp.zeros_like(depth)
    norm = jnp.zeros_like(depth)
    valid = depth > 0
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            shifted = jnp.roll(depth, (dy, dx), axis=(0, 1))
            v = jnp.roll(valid, (dy, dx), axis=(0, 1))
            w_s = np.exp(-(dx * dx + dy * dy) / (2 * sigma_space ** 2))
            w_d = jnp.exp(-jnp.square(shifted - depth) / (2 * sigma_depth ** 2))
            w = w_s * w_d * v
            acc = acc + w * shifted
            norm = norm + w
    return jnp.where(valid & (norm > 0), acc / jnp.maximum(norm, 1e-9), depth)


def _voxel_world_coords(vol: TSDFVolume):
    G = vol.grid_size
    g = jnp.arange(G, dtype=jnp.float32)
    X = vol.origin[0] + g[:, None, None] * vol.voxel_size
    Y = vol.origin[1] + g[None, :, None] * vol.voxel_size
    Z = vol.origin[2] + g[None, None, :] * vol.voxel_size
    return (
        jnp.broadcast_to(X, (G,) * 3),
        jnp.broadcast_to(Y, (G,) * 3),
        jnp.broadcast_to(Z, (G,) * 3),
    )


def fuse_depth(vol: TSDFVolume, depth: jnp.ndarray, K: jnp.ndarray,
               world2cam: jnp.ndarray, max_weight: float = 64.0,
               label_prob: Optional[jnp.ndarray] = None) -> TSDFVolume:
    """Integrate one depth frame (and optional per-pixel class probs) into
    the volume (projective TSDF update, fusion/fusion.cu semantics)."""
    H, W = depth.shape
    X, Y, Z = _voxel_world_coords(vol)
    P = jnp.stack([X, Y, Z], axis=-1)  # (G,G,G,3)
    cam = P @ world2cam[:, :3].T + world2cam[:, 3]
    z = cam[..., 2]
    u = K[0, 0] * cam[..., 0] / z + K[0, 2]
    v = K[1, 1] * cam[..., 1] / z + K[1, 2]
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    inb = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H) & (z > 0)
    uic = jnp.clip(ui, 0, W - 1)
    vic = jnp.clip(vi, 0, H - 1)
    d = depth[vic, uic]
    sdf_new = d - z  # positive in front of the surface
    upd = inb & (d > 0) & (sdf_new > -vol.truncation)
    tsdf_new = jnp.clip(sdf_new / vol.truncation, -1.0, 1.0)
    w_old = vol.weight
    w_new = jnp.where(upd, jnp.minimum(w_old + 1.0, max_weight), w_old)
    sdf = jnp.where(upd, (vol.sdf * w_old + tsdf_new) / jnp.maximum(w_old + 1.0, 1.0), vol.sdf)
    cp = vol.class_prob
    if cp is not None and label_prob is not None:
        probs = label_prob[vic, uic]  # (G,G,G,C)
        cp = jnp.where(upd[..., None], (cp * w_old[..., None] + probs) /
                       jnp.maximum(w_old + 1.0, 1.0)[..., None], cp)
    return TSDFVolume(sdf, w_new, vol.origin, vol.voxel_size, vol.truncation, cp)


def raycast(vol: TSDFVolume, K: jnp.ndarray, cam2world: jnp.ndarray,
            height: int, width: int, step_scale: float = 0.75,
            max_steps: int = 192, near: float = 0.2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render a depth map (and hit mask) by sphere-tracing the TSDF
    (prediction/raycast semantics)."""
    Kinv = jnp.linalg.inv(K)
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    grid = jnp.stack(
        [
            jnp.broadcast_to(xs[None, :], (height, width)),
            jnp.broadcast_to(ys[:, None], (height, width)),
            jnp.ones((height, width)),
        ],
        axis=-1,
    )
    rays_cam = grid @ Kinv.T
    rays_cam = rays_cam / jnp.linalg.norm(rays_cam, axis=-1, keepdims=True)
    R, t = cam2world[:, :3], cam2world[:, 3]
    rays_w = rays_cam @ R.T  # (H,W,3)
    origin_w = t  # (3,)
    G = vol.grid_size
    step = vol.truncation * step_scale

    def sample_sdf(p):
        gidx = (p - vol.origin) / vol.voxel_size
        gi = jnp.clip(jnp.round(gidx).astype(jnp.int32), 0, G - 1)
        inside = jnp.all((gidx >= 0) & (gidx <= G - 1), axis=-1)
        val = vol.sdf[gi[..., 0], gi[..., 1], gi[..., 2]]
        w = vol.weight[gi[..., 0], gi[..., 1], gi[..., 2]]
        return jnp.where(inside & (w > 0), val, 1.0)

    def body(i, state):
        dist, hit = state
        p = origin_w + rays_w * dist[..., None]
        s = sample_sdf(p)
        crossing = (s < 0) & ~hit
        hit = hit | crossing
        dist = jnp.where(hit, dist, dist + jnp.maximum(s, 0.1) * step / jnp.maximum(jnp.abs(s), 0.1))
        # simple fixed-step fallback: advance by step where no hit yet
        return dist, hit

    dist0 = jnp.full((height, width), near)
    hit0 = jnp.zeros((height, width), bool)
    dist, hit = jax.lax.fori_loop(0, max_steps, body, (dist0, hit0))
    depth = jnp.where(hit, dist * rays_cam[..., 2], 0.0)
    return depth, hit


def solve_pose(vol: TSDFVolume, depth: jnp.ndarray, K: jnp.ndarray,
               world2cam_init: jnp.ndarray, iters: int = 10,
               max_points: int = 2048) -> jnp.ndarray:
    """ICP odometry: align the new depth frame to the TSDF surface
    (optimization/ICP semantics). Returns refined world2cam (3,4)."""
    from posecnn_tpu.engine.refine import icp_refine
    from posecnn_tpu.utils.quaternion import mat2quat, quat2mat

    H, W = depth.shape
    # subsample the frame's point cloud
    stride = max(1, int(np.sqrt(H * W / max_points)))
    d = depth[::stride, ::stride]
    hh, ww = d.shape
    xs = jnp.arange(0, W, stride, dtype=jnp.float32)[:ww]
    yy = jnp.arange(0, H, stride, dtype=jnp.float32)[:hh]
    Xc = (xs[None, :] - K[0, 2]) / K[0, 0] * d
    Yc = (yy[:, None] - K[1, 2]) / K[1, 1] * d
    pts_cam = jnp.stack([Xc, Yc, d], axis=-1).reshape(-1, 3)
    # depth holes backproject to (0,0,0) — mask them out of the GN solve
    # or they drag the pose toward aligning the origin cluster
    valid = pts_cam[:, 2] > 0

    # surface points from the volume (zero-crossing voxels)
    surf_pts, surf_valid, _ = extract_surface(vol, max_points=max_points)

    # refine cam2world so that frame points align with the surface:
    cam2world = se3_inverse(world2cam_init)
    q0 = mat2quat(cam2world[:, :3])
    t0 = cam2world[:, 3]
    q, t = icp_refine(q0, t0, pts_cam, surf_pts, surf_valid, iters=iters,
                      huber_delta=2.0 * vol.voxel_size, model_valid=valid)
    cam2world_new = jnp.concatenate([quat2mat(q), t[:, None]], axis=1)
    return se3_inverse(cam2world_new)


def extract_surface(vol: TSDFVolume, max_points: int = 4096, thresh: float = 0.25):
    """Zero-crossing voxel extraction -> (points (N,3), valid (N,), labels (N,))."""
    G = vol.grid_size
    near = (jnp.abs(vol.sdf) < thresh) & (vol.weight > 0)
    flat = near.reshape(-1)
    rank = jnp.cumsum(flat) - 1
    keep = flat & (rank < max_points)
    dest = jnp.where(keep, rank, max_points)
    idx = jnp.zeros((max_points + 1,), jnp.int32).at[dest].set(
        jnp.arange(G ** 3, dtype=jnp.int32), mode="drop"
    )[:max_points]
    n = jnp.minimum(jnp.sum(flat), max_points)
    valid = jnp.arange(max_points) < n
    gi = jnp.stack([idx // (G * G), (idx // G) % G, idx % G], axis=-1)
    pts = vol.origin + gi.astype(jnp.float32) * vol.voxel_size
    if vol.class_prob is not None:
        labels = jnp.argmax(vol.class_prob.reshape(-1, vol.class_prob.shape[-1])[idx], axis=-1)
    else:
        labels = jnp.zeros((max_points,), jnp.int32)
    pts = jnp.where(valid[:, None], pts, 0.0)
    return pts, valid, jnp.where(valid, labels, 0)


# ---------------------------------------------------------------------------
# Triangulated surface: marching tetrahedra
# ---------------------------------------------------------------------------
# The reference extracts a triangle mesh with CUDA marching cubes
# (lib/kinect_fusion/src/surface/marching_cubes.cu). The TPU redesign uses
# marching *tetrahedra*: each cube splits into 6 tets around the 0-7
# diagonal; a tet has 16 sign cases and at most 2 triangles, so the case
# table is 16x6 edge ids instead of MC's 256x16 — branch-free gather math
# over a compacted active-cell list, fixed output shapes throughout.

# cube corners: bit0 = x, bit1 = y, bit2 = z
_CUBE_OFFSETS = np.array(
    [[(i >> 0) & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)], np.int32
)
# 6-tet decomposition sharing the 0-7 diagonal (fan around it)
_TETS = np.array(
    [[0, 1, 3, 7], [0, 3, 2, 7], [0, 2, 6, 7], [0, 6, 4, 7], [0, 4, 5, 7], [0, 5, 1, 7]],
    np.int32,
)
# tet edges as local vertex pairs: e0=01 e1=02 e2=03 e3=12 e4=13 e5=23
_TET_EDGES = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int32)
# triangles per sign case (bit i set = vertex i inside); up to 2 triangles,
# each 3 edge ids, -1 = no triangle
_TET_TRIS = np.array(
    [
        [-1, -1, -1, -1, -1, -1],  # 0000
        [0, 1, 2, -1, -1, -1],     # 0001 v0
        [0, 3, 4, -1, -1, -1],     # 0010 v1
        [1, 2, 4, 1, 4, 3],        # 0011 v0 v1
        [1, 3, 5, -1, -1, -1],     # 0100 v2
        [0, 2, 5, 0, 5, 3],        # 0101 v0 v2
        [0, 4, 5, 0, 5, 1],        # 0110 v1 v2
        [2, 5, 4, -1, -1, -1],     # 0111 (~v3)
        [2, 4, 5, -1, -1, -1],     # 1000 v3
        [0, 1, 5, 0, 5, 4],        # 1001 v0 v3
        [0, 3, 5, 0, 5, 2],        # 1010 v1 v3
        [1, 5, 3, -1, -1, -1],     # 1011 (~v2)
        [1, 3, 4, 1, 4, 2],        # 1100 v2 v3
        [0, 4, 3, -1, -1, -1],     # 1101 (~v1)
        [0, 2, 1, -1, -1, -1],     # 1110 (~v0)
        [-1, -1, -1, -1, -1, -1],  # 1111
    ],
    np.int32,
)


def marching_tetrahedra(vol: TSDFVolume, max_cells: int = 8192):
    """Extract a triangle mesh from the TSDF.

    Returns (triangles (max_cells*12, 3, 3) world-space vertices,
    valid (max_cells*12,) bool, labels (max_cells*12,) int32 per-triangle
    class from the fused class-probability grid). Fixed shapes: active cells
    (sign change among the 8 corners, all corners observed) are compacted to
    at most `max_cells`; each yields 6 tets x up to 2 triangles.
    """
    G = vol.grid_size
    sdf = vol.sdf
    observed = vol.weight > 0

    # (G-1)^3 cells; corner gathers via shifted slices stacked on axis -1
    def corners(a):
        return jnp.stack(
            [a[o[0]:G - 1 + o[0], o[1]:G - 1 + o[1], o[2]:G - 1 + o[2]] for o in _CUBE_OFFSETS],
            axis=-1,
        )

    # a grid point exactly on the iso-surface makes every edge from it
    # interpolate to the same point (degenerate triangles) — nudge outside
    sdf = jnp.where(sdf == 0.0, 1e-6, sdf)
    c_sdf = corners(sdf)                     # (g,g,g,8)
    c_obs = jnp.all(corners(observed), axis=-1)
    inside = c_sdf < 0
    active = c_obs & jnp.any(inside, axis=-1) & jnp.any(~inside, axis=-1)

    g = G - 1
    flat = active.reshape(-1)
    rank = jnp.cumsum(flat) - 1
    keep = flat & (rank < max_cells)
    dest = jnp.where(keep, rank, max_cells)
    cell_idx = jnp.zeros((max_cells + 1,), jnp.int32).at[dest].set(
        jnp.arange(g ** 3, dtype=jnp.int32), mode="drop"
    )[:max_cells]
    n_active = jnp.minimum(jnp.sum(flat), max_cells)
    cell_valid = jnp.arange(max_cells) < n_active

    ci = jnp.stack([cell_idx // (g * g), (cell_idx // g) % g, cell_idx % g], axis=-1)  # (M,3)
    corner_gi = ci[:, None, :] + jnp.asarray(_CUBE_OFFSETS)[None]                      # (M,8,3)
    corner_pos = vol.origin + corner_gi.astype(jnp.float32) * vol.voxel_size
    corner_sdf = c_sdf.reshape(-1, 8)[cell_idx]                                        # (M,8)

    # per-tet corner values/positions: (M, 6, 4[, 3])
    tets = jnp.asarray(_TETS)
    t_sdf = corner_sdf[:, tets]
    t_pos = corner_pos[:, tets, :]

    # sign case per tet
    bits = (t_sdf < 0).astype(jnp.int32)
    case = bits[..., 0] + 2 * bits[..., 1] + 4 * bits[..., 2] + 8 * bits[..., 3]  # (M,6)

    # interpolated crossing point on each of the 6 tet edges
    ev = jnp.asarray(_TET_EDGES)
    sa = t_sdf[..., ev[:, 0]]                                  # (M,6,6)
    sb = t_sdf[..., ev[:, 1]]
    pa = t_pos[..., ev[:, 0], :]                               # (M,6,6,3)
    pb = t_pos[..., ev[:, 1], :]
    denom = sa - sb
    t = jnp.where(jnp.abs(denom) > 1e-12, sa / jnp.where(denom == 0, 1.0, denom), 0.5)
    t = jnp.clip(t, 0.0, 1.0)
    edge_pt = pa + t[..., None] * (pb - pa)                    # (M,6,6,3)

    # triangle edge ids from the case table: (M,6,6) -> (M,6,2,3)
    tri_edges = jnp.asarray(_TET_TRIS)[case].reshape(case.shape[0], 6, 2, 3)
    tri_ok = jnp.all(tri_edges >= 0, axis=-1) & cell_valid[:, None, None]
    safe_edges = jnp.maximum(tri_edges, 0)
    tris = jnp.take_along_axis(
        edge_pt[:, :, None, :, :],                             # (M,6,1,6,3)
        safe_edges[..., None].repeat(3, -1)[:, :, :, :, :],    # (M,6,2,3,3)
        axis=3,
    )                                                          # (M,6,2,3,3)

    M = case.shape[0]
    tris = tris.reshape(M * 12, 3, 3)
    tri_valid = tri_ok.reshape(M * 12)
    # drop sliver/degenerate triangles (area below ~1e-4 voxel faces)
    n2 = jnp.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    area2 = jnp.sum(n2 * n2, axis=-1)
    tri_valid = tri_valid & (area2 > (1e-4 * vol.voxel_size ** 2) ** 2)
    if vol.class_prob is not None:
        cell_flat = (ci[:, 0] * G + ci[:, 1]) * G + ci[:, 2]
        cls = jnp.argmax(
            vol.class_prob.reshape(-1, vol.class_prob.shape[-1])[cell_flat], axis=-1
        ).astype(jnp.int32)
    else:
        cls = jnp.zeros((M,), jnp.int32)
    labels = jnp.repeat(cls, 12)
    tris = jnp.where(tri_valid[:, None, None], tris, 0.0)
    return tris, tri_valid, jnp.where(tri_valid, labels, 0)


class KinectFusion:
    """Stateful convenience wrapper mirroring the reference kfusion.pyx API."""

    def __init__(self, grid_size=128, origin=(-1.5, -1.5, 0.0), voxel_size=0.02, num_classes=None):
        self.vol = create_volume(grid_size, origin, voxel_size, num_classes=num_classes)
        self.world2cam = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
        self._depth = None
        self._label_prob = None

    def feed_data(self, depth: np.ndarray, K: np.ndarray):
        self.K = jnp.asarray(K, jnp.float32)
        self._depth = bilateral_filter(jnp.asarray(depth, jnp.float32))

    def feed_label(self, label_prob: np.ndarray):
        self._label_prob = jnp.asarray(label_prob, jnp.float32)

    def solve_pose(self, iters: int = 10):
        # first frame: identity (nothing fused yet)
        if float(jnp.sum(self.vol.weight)) > 0:
            self.world2cam = solve_pose(self.vol, self._depth, self.K, self.world2cam, iters=iters)
        return np.asarray(self.world2cam)

    def fuse_depth(self):
        self.vol = fuse_depth(self.vol, self._depth, self.K, self.world2cam,
                              label_prob=self._label_prob)

    def extract_surface(self, max_points: int = 4096):
        pts, valid, labels = extract_surface(self.vol, max_points=max_points)
        v = np.asarray(valid)
        return np.asarray(pts)[v], np.asarray(labels)[v]

    def extract_mesh(self, max_cells: int = 8192):
        """Triangle mesh (marching tetrahedra): (tris (T,3,3), labels (T,))."""
        tris, valid, labels = marching_tetrahedra(self.vol, max_cells=max_cells)
        v = np.asarray(valid)
        return np.asarray(tris)[v], np.asarray(labels)[v]

    def render(self, height: int, width: int):
        depth, hit = raycast(self.vol, self.K, se3_inverse(self.world2cam), height, width)
        return np.asarray(depth), np.asarray(hit)

    def back_project(self):
        from posecnn_tpu.ops.normals import backproject_depth

        K = self.K
        return np.asarray(
            backproject_depth(self._depth, K[0, 0], K[1, 1], K[0, 2], K[1, 2])
        )
