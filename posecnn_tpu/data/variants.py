"""Remaining dataset variants from the reference registry.

Thin subclasses over the YCB-style loader: each reference dataset class
(lib/datasets/{ycb,ycb_single,lov_single,rgbd_scene,shapenet_scene,
shapenet_single,gmu_scene,yumi,sym}.py) differs in its class list, symmetry
flags, data root and index files — the frame IO and evaluation machinery are
shared (same -color/-depth/-label/-meta.mat layout).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from posecnn_tpu.data.lov import YCB_CLASSES, YCB_SYMMETRY, lov


class ycb(lov):
    """YCB object set with the detection-era symmetry flags
    (lib/datasets/ycb.py:22-33 — note 024_bowl marked symmetric here)."""

    def __init__(self, image_set: str, path: Optional[str] = None):
        super().__init__(image_set, path)
        self._name = "ycb_" + image_set
        self._symmetry = np.array(
            [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 1, 0, 0, 0, 0, 1],
            dtype=np.float32,
        )

    def _get_default_path(self) -> str:
        root = os.environ.get("POSECNN_DATA", os.path.join(os.path.dirname(__file__), "..", "..", "data"))
        p = os.path.join(root, "YCB")
        return p if os.path.exists(p) else os.path.join(root, "LOV")


class _SingleClassMixin:
    """2-class (background/object) remapping used by the *_single variants
    (lib/datasets/{lov_single,ycb_single}.py and gt_single_data_layer)."""

    def select_class(self, cls_name: str):
        self._single_cls = self._classes.index(cls_name)
        self._classes = ("__background__", cls_name)
        sym = np.zeros(2, dtype=np.float32)
        sym[1] = self._symmetry_all[self._single_cls]
        self._symmetry_all_classes = self._symmetry
        self._symmetry = sym
        pts = self._points_all
        self._points_all = np.zeros((2,) + pts.shape[1:], pts.dtype)
        self._points_all[1] = pts[self._single_cls]
        ext = self._extents
        self._extents = np.zeros((2, 3), ext.dtype)
        self._extents[1] = ext[self._single_cls]

    def remap_frame(self, frame):
        sel = np.where(frame.cls_indexes == self._single_cls)[0]
        frame.label = (frame.label == self._single_cls).astype(np.int32)
        frame.cls_indexes = np.ones(len(sel), dtype=np.float32)
        frame.poses = frame.poses[:, :, sel]
        frame.center = frame.center[sel]
        return frame


class lov_single(_SingleClassMixin, lov):
    """One YCB class vs background (lib/datasets/lov_single.py)."""

    def __init__(self, cls_name: str, image_set: str, path: Optional[str] = None):
        lov.__init__(self, image_set, path)
        self._symmetry_all = YCB_SYMMETRY
        self.select_class(cls_name)
        self._name = f"lov_single_{cls_name}_{image_set}"

    def load_frame(self, i: int):
        return self.remap_frame(super().load_frame(i))


class ycb_single(_SingleClassMixin, ycb):
    """One YCB class vs background (lib/datasets/ycb_single.py)."""

    def __init__(self, cls_name: str, image_set: str, path: Optional[str] = None):
        ycb.__init__(self, image_set, path)
        self._symmetry_all = self._symmetry
        self.select_class(cls_name)
        self._name = f"ycb_single_{cls_name}_{image_set}"

    def load_frame(self, i: int):
        return self.remap_frame(super().load_frame(i))


class _GenericScene(lov):
    """Shared loader for the scene datasets with custom class lists."""

    CLASSES = ("__background__",)
    DIRNAME = "SCENE"

    def __init__(self, image_set: str, path: Optional[str] = None):
        # bypass lov.__init__'s YCB specifics
        from posecnn_tpu.data.imdb import imdb

        imdb.__init__(self, f"{self.DIRNAME.lower()}_{image_set}")
        self._image_set = image_set
        self._lov_path = path or self._get_default_path()
        self._data_path = os.path.join(self._lov_path, "data")
        self._classes = self.CLASSES
        self._class_colors = [(255, 255, 255)] + [
            (37 * i % 256, 91 * i % 256, 151 * i % 256) for i in range(1, len(self.CLASSES))
        ]
        self._symmetry = np.zeros(len(self.CLASSES), dtype=np.float32)
        C = len(self.CLASSES)
        self._points_all = np.zeros((C, 1, 3), dtype=np.float32)
        self._points = [self._points_all[c] for c in range(C)]
        self._extents = np.ones((C, 3), dtype=np.float32) * 0.1
        self._extents[0] = 0
        self._image_ext = ".png"
        self._image_index = self._load_image_set_index()

    def _get_default_path(self) -> str:
        root = os.environ.get("POSECNN_DATA", os.path.join(os.path.dirname(__file__), "..", "..", "data"))
        return os.path.join(root, self.DIRNAME)


class rgbd_scene(_GenericScene):
    """RGBD-Scenes v2 (lib/datasets/rgbd_scene.py:18)."""

    CLASSES = (
        "__background__", "bowl", "cap", "cereal_box", "coffee_mug",
        "coffee_table", "office_chair", "soda_can", "sofa", "table",
    )
    DIRNAME = "RGBDScene"


class shapenet_scene(_GenericScene):
    """ShapeNet rendered scenes (lib/datasets/shapenet_scene.py:18)."""

    CLASSES = ("__background__", "table", "tvmonitor", "bottle", "mug", "can", "keyboard", "cap")
    DIRNAME = "ShapeNetScene"


class shapenet_single(_GenericScene):
    CLASSES = ("__background__", "object")
    DIRNAME = "ShapeNetSingle"


class gmu_scene(_GenericScene):
    """GMU kitchen scenes (lib/datasets/gmu_scene.py:18)."""

    CLASSES = (
        "__background__", "coca_cola_glass_bottle", "coffee_mate_french_vanilla",
        "honey_bunches_of_oats_honey_roasted", "hunt_s_sauce", "mahatma_rice",
        "nature_valley_soft_baked_oatmeal_squares", "nutrigrain_apple_cinnamon",
        "palmolive_orange", "pop_secret_light_butter", "pringles_bbq", "red_bull",
    )
    DIRNAME = "GMU"


class yumi(_GenericScene):
    """YuMi tabletop set (lib/datasets/yumi.py:27)."""

    CLASSES = ("__background__", "xmas_cup")
    DIRNAME = "YUMI"


class sym(_GenericScene):
    """Symmetry toy dataset (lib/datasets/sym.py:28)."""

    CLASSES = ("__background__", "cube")
    DIRNAME = "SYM"

    def __init__(self, image_set: str, path: Optional[str] = None):
        super().__init__(image_set, path)
        self._symmetry[1] = 1.0
