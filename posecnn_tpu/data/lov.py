"""YCB-Video dataset ("lov" in the reference, lib/datasets/lov.py).

Reads the reference data layout under <root>/data/LOV:
  data/<seq>/<frame>-color.png / -depth.png / -label.png / -meta.mat
  models/<class>/points.xyz, extents.txt, train.txt / val.txt / keyframe.txt

Frame annotations come from the -meta.mat files (cls_indexes, poses (3,4,N),
center, intrinsic_matrix, factor_depth), identical to the reference loader
(lib/gt_synthesize_layer/minibatch.py:327-339).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from posecnn_tpu.data.imdb import imdb

YCB_CLASSES = (
    "__background__",
    "002_master_chef_can", "003_cracker_box", "004_sugar_box",
    "005_tomato_soup_can", "006_mustard_bottle", "007_tuna_fish_can",
    "008_pudding_box", "009_gelatin_box", "010_potted_meat_can",
    "011_banana", "019_pitcher_base", "021_bleach_cleanser", "024_bowl",
    "025_mug", "035_power_drill", "036_wood_block", "037_scissors",
    "040_large_marker", "051_large_clamp", "052_extra_large_clamp",
    "061_foam_brick",
)

# lib/datasets/lov.py:37 — used for the ADD-S loss weighting during training
YCB_SYMMETRY = np.array(
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1],
    dtype=np.float32,
)

# classes evaluated with ADD-S at test time (lov.py:484-487)
YCB_SYMMETRIC_EVAL = ("024_bowl", "036_wood_block", "061_foam_brick")

YCB_CLASS_COLORS = [
    (255, 255, 255), (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0),
    (255, 0, 255), (0, 255, 255), (128, 0, 0), (0, 128, 0), (0, 0, 128),
    (128, 128, 0), (128, 0, 128), (0, 128, 128), (64, 0, 0), (0, 64, 0),
    (0, 0, 64), (64, 64, 0), (64, 0, 64), (0, 64, 64), (192, 0, 0),
    (0, 192, 0), (0, 0, 192),
]


class lov(imdb):
    def __init__(self, image_set: str, lov_path: Optional[str] = None):
        super().__init__("lov_" + image_set)
        self._image_set = image_set
        self._lov_path = lov_path or self._get_default_path()
        self._data_path = os.path.join(self._lov_path, "data")
        self._classes = YCB_CLASSES
        self._class_colors = YCB_CLASS_COLORS
        self._symmetry = YCB_SYMMETRY.copy()
        self._points, self._points_all = self._load_object_points()
        self._extents = self._load_object_extents()
        self._image_ext = ".png"
        self._image_index = self._load_image_set_index()

    def _get_default_path(self) -> str:
        root = os.environ.get("POSECNN_DATA", os.path.join(os.path.dirname(__file__), "..", "..", "data"))
        path = os.path.join(root, "LOV")
        if not os.path.exists(os.path.join(path, "classes.txt")):
            # fall back to a read-only reference checkout (models/extents/splits
            # only — enough for metadata + synthetic-only training)
            alt = "/root/reference/data/LOV"
            if os.path.exists(os.path.join(alt, "classes.txt")):
                return alt
        return path

    def _load_image_set_index(self) -> List[str]:
        image_set_file = os.path.join(self._lov_path, self._image_set + ".txt")
        if not os.path.exists(image_set_file):
            return []
        with open(image_set_file) as f:
            return [x.rstrip("\n") for x in f.readlines()]

    def _load_object_points(self):
        """points.xyz per class, all truncated to the min count (lov.py:141-158)."""
        points = [np.zeros((0, 3))] * self.num_classes
        num = np.inf
        for i in range(1, self.num_classes):
            point_file = os.path.join(self._lov_path, "models", self._classes[i], "points.xyz")
            assert os.path.exists(point_file), f"missing {point_file}"
            points[i] = np.loadtxt(point_file)
            num = min(num, points[i].shape[0])
        points_all = np.zeros((self.num_classes, int(num), 3), dtype=np.float32)
        for i in range(1, self.num_classes):
            points_all[i, :, :] = points[i][: int(num), :]
        return points, points_all

    def _load_object_extents(self) -> np.ndarray:
        extent_file = os.path.join(self._lov_path, "extents.txt")
        assert os.path.exists(extent_file), f"missing {extent_file}"
        extents = np.zeros((self.num_classes, 3), dtype=np.float32)
        extents[1:, :] = np.loadtxt(extent_file)
        return extents

    # ---- frame IO -----------------------------------------------------
    def image_path_at(self, i: int) -> str:
        return os.path.join(self._data_path, self._image_index[i] + "-color" + self._image_ext)

    def depth_path_at(self, i: int) -> str:
        return os.path.join(self._data_path, self._image_index[i] + "-depth" + self._image_ext)

    def label_path_at(self, i: int) -> str:
        return os.path.join(self._data_path, self._image_index[i] + "-label" + self._image_ext)

    def metadata_path_at(self, i: int) -> str:
        return os.path.join(self._data_path, self._image_index[i] + "-meta.mat")

    def gt_roidb(self) -> List[Dict]:
        return [
            {
                "image": self.image_path_at(i),
                "depth": self.depth_path_at(i),
                "label": self.label_path_at(i),
                "meta_data": self.metadata_path_at(i),
                "flipped": False,
            }
            for i in range(self.num_images)
        ]

    def load_frame(self, i: int):
        """Read one annotated frame into a `Frame` (host-side)."""
        import cv2
        import scipy.io

        from posecnn_tpu.data.minibatch import Frame

        meta = scipy.io.loadmat(self.metadata_path_at(i))
        poses = meta["poses"]
        if poses.ndim == 2:
            poses = poses.reshape(3, 4, 1)
        return Frame(
            color=cv2.imread(self.image_path_at(i), cv2.IMREAD_COLOR),
            label=cv2.imread(self.label_path_at(i), cv2.IMREAD_UNCHANGED),
            depth=cv2.imread(self.depth_path_at(i), cv2.IMREAD_UNCHANGED),
            cls_indexes=meta["cls_indexes"].flatten(),
            poses=poses,
            center=meta["center"],
            intrinsic_matrix=meta["intrinsic_matrix"],
            factor_depth=float(np.asarray(meta["factor_depth"]).flatten()[0]),
        )
