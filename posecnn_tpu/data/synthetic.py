"""Online synthetic training-data generation.

Replaces the reference's OpenGL/Pangolin `Synthesizer::render_python` thread
(lib/synthesize/synthesize.cpp:345-470, consumed by tools/train_net.py:155-258):
  * samples 5-8 distinct objects (SYN_SAMPLE_OBJECT) with random poses —
    translation z in [SYN_TNEAR, SYN_TFAR], center inside the image,
    rotation uniform over SO(3) (or banked poses +/- noise when a pose
    bank is supplied, SYN_SAMPLE_POSE);
  * renders color/depth/label/vertmap with the native C++ rasterizer
    (posecnn_tpu/native) — CPU, no GL context needed on TPU hosts;
  * rejects frames where any object has fewer than `min_visible` visible
    pixels (synthesize.cpp:448-452 uses 800);
  * meshes: .ply/.obj models when present, else convex hulls of the
    points.xyz clouds (scipy) as proxy geometry.

Also provides the offline `data_syn` reader (SYN_ONLINE=False path,
minibatch.py:121-154).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from posecnn_tpu.data.minibatch import Frame
from posecnn_tpu.native import SceneBuffers, rasterize_mesh
from posecnn_tpu.utils.quaternion_np import quat2mat


def _random_rotation(rng: np.random.RandomState) -> np.ndarray:
    q = rng.randn(4)
    return quat2mat(q / np.linalg.norm(q))


class Mesh:
    def __init__(self, vertices: np.ndarray, faces: np.ndarray, colors: Optional[np.ndarray] = None):
        self.vertices = vertices.astype(np.float32)
        self.faces = faces.astype(np.int32)
        self.colors = colors

    @classmethod
    def from_points(cls, points: np.ndarray) -> "Mesh":
        """Convex-hull proxy mesh from a point cloud."""
        from scipy.spatial import ConvexHull

        hull = ConvexHull(points)
        return cls(points.astype(np.float32), hull.simplices.astype(np.int32))

    @classmethod
    def from_obj(cls, path: str) -> "Mesh":
        """Minimal Wavefront OBJ loader: v/f records, fan-triangulated
        polygons, 1-based (or negative) indices; vt/vn/materials ignored
        (the rasterizer shades per class color)."""
        verts: List[List[float]] = []
        faces: List[List[int]] = []
        with open(path) as fh:
            for line in fh:
                parts = line.split()
                if not parts:
                    continue
                if parts[0] == "v" and len(parts) >= 4:
                    verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
                elif parts[0] == "f" and len(parts) >= 4:
                    idx = []
                    for tok in parts[1:]:
                        i = int(tok.split("/")[0])
                        idx.append(i - 1 if i > 0 else len(verts) + i)
                    for k in range(1, len(idx) - 1):  # fan triangulation
                        faces.append([idx[0], idx[k], idx[k + 1]])
        return cls(np.asarray(verts, np.float32), np.asarray(faces, np.int32))

    @classmethod
    def from_ply(cls, path: str) -> "Mesh":
        """ASCII PLY loader (xyz vertices + polygon faces; extra vertex
        properties like normals/colors are skipped positionally)."""
        with open(path, "rb") as fh:
            header = []
            while True:
                line = fh.readline().decode("ascii", "ignore").strip()
                header.append(line)
                if line == "end_header":
                    break
            if not any(h.startswith("format ascii") for h in header):
                raise ValueError(f"{path}: only ascii PLY supported")
            n_vert = n_face = 0
            vert_props: List[str] = []
            cur = None
            for h in header:
                t = h.split()
                if not t:
                    continue
                if t[0] == "element":
                    cur = t[1]
                    if cur == "vertex":
                        n_vert = int(t[2])
                    elif cur == "face":
                        n_face = int(t[2])
                elif t[0] == "property" and cur == "vertex" and len(t) >= 3:
                    vert_props.append(t[-1])
            ix = [vert_props.index(a) for a in ("x", "y", "z")]
            verts = np.zeros((n_vert, 3), np.float32)
            for i in range(n_vert):
                vals = fh.readline().split()
                verts[i] = [float(vals[j]) for j in ix]
            faces: List[List[int]] = []
            for _ in range(n_face):
                vals = fh.readline().split()
                k = int(vals[0])
                idx = [int(v) for v in vals[1 : 1 + k]]
                for j in range(1, k - 1):
                    faces.append([idx[0], idx[j], idx[j + 1]])
        return cls(verts, np.asarray(faces, np.int32))

    @classmethod
    def load(cls, path: str) -> "Mesh":
        ext = os.path.splitext(path)[1].lower()
        if ext == ".obj":
            return cls.from_obj(path)
        if ext == ".ply":
            return cls.from_ply(path)
        raise ValueError(f"unsupported mesh format: {path}")


class Synthesizer:
    """Scene sampler + renderer. API shape mirrors libsynthesizer.Synthesizer
    (lib/synthesize/synthesizer.pyx:14-95) minus the GL context."""

    def __init__(
        self,
        meshes: Sequence[Optional[Mesh]],   # index = class id; None for background
        extents: np.ndarray,
        intrinsic_matrix: np.ndarray,
        width: int = 640,
        height: int = 480,
        class_colors: Optional[Sequence[Tuple[int, int, int]]] = None,
        t_near: float = 0.5,
        t_far: float = 2.0,
        min_objects: int = 5,
        max_objects: int = 8,
        min_visible: int = 800,
        pose_bank: Optional[np.ndarray] = None,  # (N,4) quaternion bank
        pose_noise_deg: float = 15.0,
    ):
        self.meshes = list(meshes)
        self.extents = extents
        self.K = np.asarray(intrinsic_matrix, np.float64)
        self.width, self.height = width, height
        self.class_colors = class_colors
        self.t_near, self.t_far = t_near, t_far
        self.min_objects, self.max_objects = min_objects, max_objects
        self.min_visible = min_visible
        self.pose_bank = pose_bank
        self.pose_noise_deg = pose_noise_deg
        self.num_classes = len(self.meshes)

    def _sample_pose(self, rng) -> Tuple[np.ndarray, np.ndarray]:
        if self.pose_bank is not None and len(self.pose_bank):
            q = self.pose_bank[rng.randint(len(self.pose_bank))]
            R = quat2mat(q / np.linalg.norm(q))
            # perturb around the banked pose
            ang = np.deg2rad(self.pose_noise_deg) * rng.randn(3)
            Rn, _ = np.linalg.qr(np.eye(3) + np.cross(np.eye(3), ang))
            R = Rn @ R
        else:
            R = _random_rotation(rng)
        z = self.t_near + (self.t_far - self.t_near) * rng.rand()
        cx = self.width * (0.25 + 0.5 * rng.rand())
        cy = self.height * (0.25 + 0.5 * rng.rand())
        t = np.array(
            [
                (cx - self.K[0, 2]) / self.K[0, 0] * z,
                (cy - self.K[1, 2]) / self.K[1, 1] * z,
                z,
            ]
        )
        return R, t

    def render_scene(self, rng: np.random.RandomState, max_tries: int = 5) -> Frame:
        classes_avail = [c for c in range(1, self.num_classes) if self.meshes[c] is not None]
        for _ in range(max_tries):
            n = rng.randint(self.min_objects, self.max_objects + 1)
            n = min(n, len(classes_avail))
            classes = rng.choice(classes_avail, size=n, replace=False)
            buf = SceneBuffers(self.height, self.width)
            poses = np.zeros((3, 4, n), np.float32)
            centers = np.zeros((n, 2), np.float32)
            for j, cls in enumerate(classes):
                R, t = self._sample_pose(rng)
                poses[:, :3, j] = R
                poses[:, 3, j] = t
                centers[j] = [
                    self.K[0, 0] * t[0] / t[2] + self.K[0, 2],
                    self.K[1, 1] * t[1] / t[2] + self.K[1, 2],
                ]
                mesh = self.meshes[cls]
                base = (
                    np.asarray(self.class_colors[cls], np.float32) / 255.0
                    if self.class_colors
                    else np.array([0.3 + 0.7 * rng.rand() for _ in range(3)], np.float32)
                )
                rasterize_mesh(
                    buf, mesh.vertices, mesh.faces,
                    np.hstack([R, t[:, None]]), self.K, int(cls),
                    vertex_colors=mesh.colors, base_color=tuple(base),
                )
            visible = np.array([(buf.label == c).sum() for c in classes])
            if (visible >= self.min_visible).all():
                depth_raw = (buf.depth * 1000.0).astype(np.uint16)
                return Frame(
                    color=buf.color[:, :, ::-1].copy(),  # RGB->BGR
                    label=buf.label.copy(),
                    depth=depth_raw,
                    cls_indexes=classes.astype(np.float32),
                    poses=poses,
                    center=centers,
                    intrinsic_matrix=self.K,
                    factor_depth=1000.0,
                    is_synthetic=True,
                )
        # fall through: return the last attempt regardless
        return Frame(
            color=buf.color[:, :, ::-1].copy(), label=buf.label.copy(),
            depth=(buf.depth * 1000.0).astype(np.uint16),
            cls_indexes=classes.astype(np.float32), poses=poses, center=centers,
            intrinsic_matrix=self.K, factor_depth=1000.0, is_synthetic=True,
        )


def build_ycb_synthesizer(dataset, width=640, height=480, **kwargs) -> Synthesizer:
    """Synthesizer over a YCB-style dataset: real .obj/.ply meshes from
    models/<class>/ when present (the reference loads textured models,
    synthesize.cpp loadModels), else convex hulls of the points.xyz clouds."""
    meshes: List[Optional[Mesh]] = [None]
    model_root = os.path.join(getattr(dataset, "_lov_path", ""), "models")
    for c in range(1, dataset.num_classes):
        mesh = None
        cls_name = dataset.classes[c]
        for fname in ("textured.obj", "textured.ply", "mesh.obj", f"{cls_name}.obj", f"{cls_name}.ply"):
            p = os.path.join(model_root, cls_name, fname)
            if os.path.exists(p):
                try:
                    mesh = Mesh.load(p)
                    break
                except (ValueError, OSError):
                    mesh = None
        if mesh is None:
            pts = dataset._points_all[c]
            mesh = Mesh.from_points(pts) if pts.shape[0] >= 4 else None
        meshes.append(mesh)
    K = getattr(dataset, "K", np.array([[1066.778, 0, 312.9869], [0, 1067.487, 241.3109], [0, 0, 1]]))
    colors = getattr(dataset, "_class_colors", None)
    return Synthesizer(meshes, dataset._extents, K, width, height, class_colors=colors, **kwargs)


class OfflineSynReader:
    """data_syn reader: {root}/NNNNNN-{color,depth,label}.png + -meta.mat
    (SYN_ONLINE=False path, minibatch.py:121-154)."""

    def __init__(self, root: str, num: int = 80000):
        self.root = root
        self.num = num

    def load_frame(self, index: int) -> Frame:
        import cv2
        import scipy.io

        base = os.path.join(self.root, f"{index:06d}")
        meta = scipy.io.loadmat(base + "-meta.mat")
        poses = meta["poses"]
        if poses.ndim == 2:
            poses = poses.reshape(3, 4, 1)
        return Frame(
            color=cv2.imread(base + "-color.png", cv2.IMREAD_COLOR),
            label=cv2.imread(base + "-label.png", cv2.IMREAD_UNCHANGED),
            depth=cv2.imread(base + "-depth.png", cv2.IMREAD_UNCHANGED),
            cls_indexes=meta["cls_indexes"].flatten(),
            poses=poses,
            center=meta["center"],
            intrinsic_matrix=meta["intrinsic_matrix"],
            factor_depth=float(np.asarray(meta["factor_depth"]).flatten()[0]),
            is_synthetic=True,
        )


class SyntheticDataset:
    """On-the-fly synthetic dataset over a real metadata-bearing imdb.

    The reference's SYN_ONLINE path renders synthetic training frames live
    from the YCB models (tools/train_net.py:155-258 render thread); here the
    dataset itself is synthetic: frame i is rendered deterministically from
    seed `seed0 + i` using the base imdb's model point clouds, extents and
    intrinsics — usable anywhere a real imdb is (training AND evaluation),
    which also gives the repo a full YCB-workflow e2e without the 265 GB
    YCB-Video download.
    """

    def __init__(self, base, split: str = "train", num_images: int = 2000,
                 width: int = 640, height: int = 480, max_objects: int = 5,
                 cache: bool = True):
        self.base = base
        self.name = f"{base.name}_syn_{split}" if hasattr(base, "name") else f"syn_{split}"
        self.num_images = num_images
        self._seed0 = {"train": 0, "val": 10_000_000, "keyframe": 10_000_000}.get(split, 20_000_000)
        self.image_index = [f"syn/{i:06d}" for i in range(num_images)]
        self.synth = build_ycb_synthesizer(base, width, height, max_objects=max_objects)
        # frames are deterministic in i, so they render once and replay from
        # RAM on later epochs (~2 MB/frame; augmentation stays per-iteration
        # random in the minibatch builder)
        self._cache: dict = {} if cache else None
        # metadata proxies
        self.classes = base.classes
        self.num_classes = base.num_classes
        self._extents = base._extents
        self._points = base._points
        self._points_all = base._points_all
        self._symmetry = base._symmetry

    def load_frame(self, i: int) -> Frame:
        if self._cache is not None and i in self._cache:
            return self._cache[i]
        rng = np.random.RandomState(self._seed0 + i)
        frame = self.synth.render_scene(rng)
        if self._cache is not None:
            self._cache[i] = frame
        return frame
