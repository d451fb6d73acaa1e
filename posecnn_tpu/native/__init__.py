"""ctypes bindings for the native C++ components.

Builds `librasterizer.so` on first use with g++ (cached next to the source);
the reference's equivalents were CMake/Cython-built OpenGL programs
(lib/synthesize, lib/rendering). A NumPy fallback keeps the API usable where
no compiler is present.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "librasterizer.so")
_SRC = os.path.join(_HERE, "rasterizer.cc")
_lib = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.rasterize_mesh.argtypes = [
            f32p, ctypes.c_int, i32p, ctypes.c_int,
            ctypes.c_void_p, f32p, f32p, f32p, f32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, f32p, i32p, f32p,
        ]
        lib.rasterize_depth.argtypes = [
            f32p, ctypes.c_int, i32p, ctypes.c_int,
            f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, i32p,
        ]
        _lib = lib
    except Exception:
        _build_failed = True
    return _lib


class SceneBuffers:
    """Mutable render targets composed across rasterize calls."""

    def __init__(self, height: int, width: int):
        self.color = np.zeros((height, width, 3), np.uint8)
        self.depth = np.zeros((height, width), np.float32)
        self.label = np.zeros((height, width), np.int32)
        self.vertmap = np.zeros((height, width, 3), np.float32)


DEFAULT_LIGHT = (0.0, 0.0, -1.0, 0.35, 0.65)  # headlight; pre-round-3 behavior


def rasterize_mesh(
    buffers: SceneBuffers,
    vertices: np.ndarray,
    faces: np.ndarray,
    pose: np.ndarray,
    K: np.ndarray,
    cls_id: int,
    vertex_colors: Optional[np.ndarray] = None,
    base_color: Tuple[float, float, float] = (0.7, 0.7, 0.7),
    light: Tuple[float, float, float, float, float] = DEFAULT_LIGHT,
) -> None:
    """Rasterize one object instance into the scene buffers (z-tested).

    `light` = (lx, ly, lz, ambient, diffuse): camera-frame Lambert light;
    randomized per scene by the synthesizer so shading encodes rotation.
    """
    vertices = np.ascontiguousarray(vertices, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    pose = np.ascontiguousarray(pose, np.float32).reshape(3, 4)
    K33 = np.ascontiguousarray(K, np.float32).reshape(3, 3)
    base = np.ascontiguousarray(base_color, np.float32)
    lt = np.ascontiguousarray(light, np.float32)
    h, w = buffers.depth.shape
    lib = _load()
    if lib is not None:
        vc = None
        if vertex_colors is not None:
            vc = np.ascontiguousarray(vertex_colors, np.float32)
        lib.rasterize_mesh(
            vertices, len(vertices), faces, len(faces),
            vc.ctypes.data if vc is not None else None,
            base, pose.reshape(-1), K33.reshape(-1), lt,
            h, w, int(cls_id),
            buffers.color, buffers.depth.reshape(-1), buffers.label.reshape(-1),
            buffers.vertmap.reshape(h * w * 3),
        )
        return
    _rasterize_numpy(buffers, vertices, faces, pose, K33, cls_id, vertex_colors, base, lt)


def rasterize_depth(
    depth: np.ndarray,
    label: np.ndarray,
    vertices: np.ndarray,
    faces: np.ndarray,
    pose: np.ndarray,
    K: np.ndarray,
    cls_id: int,
) -> None:
    vertices = np.ascontiguousarray(vertices, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    pose = np.ascontiguousarray(pose, np.float32).reshape(3, 4)
    K33 = np.ascontiguousarray(K, np.float32).reshape(3, 3)
    h, w = depth.shape
    lib = _load()
    if lib is not None:
        lib.rasterize_depth(
            vertices, len(vertices), faces, len(faces),
            pose.reshape(-1), K33.reshape(-1), h, w, int(cls_id),
            depth.reshape(-1), label.reshape(-1),
        )
        return
    buf = SceneBuffers(h, w)
    buf.depth[:] = depth
    buf.label[:] = label
    _rasterize_numpy(
        buf, vertices, faces, pose, K33, cls_id, None, np.ones(3, np.float32),
        np.asarray(DEFAULT_LIGHT, np.float32),
    )
    depth[:] = buf.depth
    label[:] = buf.label


def _rasterize_numpy(buffers, vertices, faces, pose, K, cls_id, vertex_colors, base, light):
    """Slow but dependency-free fallback (vectorized per-face)."""
    cam = vertices @ pose[:, :3].T + pose[:, 3]
    z = np.maximum(cam[:, 2], 1e-6)
    sx = K[0, 0] * cam[:, 0] / z + K[0, 2]
    sy = K[1, 1] * cam[:, 1] / z + K[1, 2]
    h, w = buffers.depth.shape
    ldir = np.asarray(light[:3], np.float64)
    ldir = ldir / max(np.linalg.norm(ldir), 1e-12)
    ambient, diffuse = float(light[3]), float(light[4])
    for f in faces:
        p = np.stack([sx[f], sy[f]], axis=1)
        zf = cam[f, 2]
        if (zf <= 1e-6).any():
            continue
        area = (p[1, 0] - p[0, 0]) * (p[2, 1] - p[0, 1]) - (p[2, 0] - p[0, 0]) * (p[1, 1] - p[0, 1])
        if abs(area) < 1e-9:
            continue
        x0, x1 = int(max(0, np.floor(p[:, 0].min()))), int(min(w - 1, np.ceil(p[:, 0].max())))
        y0, y1 = int(max(0, np.floor(p[:, 1].min()))), int(min(h - 1, np.ceil(p[:, 1].max())))
        if x0 > x1 or y0 > y1:
            continue
        xs, ys = np.meshgrid(np.arange(x0, x1 + 1) + 0.5, np.arange(y0, y1 + 1) + 0.5)
        w0 = ((p[1, 0] - xs) * (p[2, 1] - ys) - (p[2, 0] - xs) * (p[1, 1] - ys)) / area
        w1 = ((p[2, 0] - xs) * (p[0, 1] - ys) - (p[0, 0] - xs) * (p[2, 1] - ys)) / area
        w2 = 1 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        iz = w0 / zf[0] + w1 / zf[1] + w2 / zf[2]
        zp = np.where(iz > 0, 1.0 / np.maximum(iz, 1e-12), np.inf)
        sub_d = buffers.depth[y0 : y1 + 1, x0 : x1 + 1]
        closer = inside & ((sub_d == 0) | (zp < sub_d))
        sub_d[closer] = zp[closer]
        buffers.label[y0 : y1 + 1, x0 : x1 + 1][closer] = cls_id
        a = np.stack([w0 / zf[0], w1 / zf[1], w2 / zf[2]], axis=-1) * zp[..., None]
        vm = a @ vertices[f]
        buffers.vertmap[y0 : y1 + 1, x0 : x1 + 1][closer] = vm[closer]
        n = np.cross(cam[f[1]] - cam[f[0]], cam[f[2]] - cam[f[0]])
        nl = np.linalg.norm(n)
        shade = ambient + diffuse * (abs(float(n @ ldir)) / nl if nl > 1e-12 else 1.0)
        col = (a @ (vertex_colors[f] if vertex_colors is not None else np.tile(base, (3, 1)))) * shade * 255.0
        buffers.color[y0 : y1 + 1, x0 : x1 + 1][closer] = np.clip(col[closer], 0, 255).astype(np.uint8)
