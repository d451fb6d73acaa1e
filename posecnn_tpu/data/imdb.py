"""Dataset (imdb) base class: roidb handling, segmentation + pose evaluation.

Rewrite of `lib/datasets/imdb.py` plus the evaluation logic shared by the
per-dataset classes (`lov.evaluate_result`, lib/datasets/lov.py:397-516):
per-class IoU via a confusion histogram, per-object rotation/translation
errors, ADD (or ADD-S for symmetric classes) against the
0.1*||extent|| threshold, and ADD(-S) accuracy-threshold AUC curves.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from posecnn_tpu.utils.pose_error import add, adi, re, te
from posecnn_tpu.utils.quaternion_np import quat2mat


class imdb:
    """Image database base."""

    def __init__(self, name: str):
        self._name = name
        self._num_classes = 0
        self._classes: Sequence[str] = []
        self._image_index: List[str] = []
        self._roidb: Optional[List[Dict]] = None

    @property
    def name(self):
        return self._name

    @property
    def num_classes(self):
        return len(self._classes)

    @property
    def classes(self):
        return self._classes

    @property
    def image_index(self):
        return self._image_index

    @property
    def num_images(self):
        return len(self._image_index)

    @property
    def roidb(self):
        if self._roidb is None:
            self._roidb = self.gt_roidb()
        return self._roidb

    def gt_roidb(self):
        raise NotImplementedError

    def image_path_at(self, i: int) -> str:
        raise NotImplementedError

    @staticmethod
    def fast_hist(a: np.ndarray, b: np.ndarray, n: int) -> np.ndarray:
        """Confusion histogram (lib/datasets/imdb.py:123)."""
        k = (a >= 0) & (a < n)
        return np.bincount(n * a[k].astype(int) + b[k].astype(int), minlength=n ** 2).reshape(n, n)

    def append_flipped_images(self):
        """Horizontal-flip augmentation (reference imdb.append_flipped_images)."""
        roidb = self.roidb
        flipped = []
        for entry in roidb:
            e = dict(entry)
            e["flipped"] = True
            flipped.append(e)
        self._roidb = roidb + flipped
        self._image_index = self._image_index * 2


class PoseEvaluator:
    """Accumulates segmentation IoU and pose errors over an eval run."""

    def __init__(self, classes: Sequence[str], extents: np.ndarray, points: List, symmetric_classes: Sequence[str]):
        self.classes = list(classes)
        self.num_classes = len(classes)
        self.extents = extents
        self.points = points
        self.symmetric = set(symmetric_classes)
        self.hist = np.zeros((self.num_classes, self.num_classes))
        # per-class lists of (add_error, re_deg, te_m, threshold)
        self.pose_errors: Dict[int, List] = {c: [] for c in range(self.num_classes)}

    def add_frame(
        self,
        pred_labels: np.ndarray,
        gt_labels: np.ndarray,
        rois: Optional[np.ndarray] = None,
        poses: Optional[np.ndarray] = None,
        gt_poses: Optional[np.ndarray] = None,
        gt_cls_indexes: Optional[np.ndarray] = None,
    ):
        self.hist += imdb.fast_hist(
            gt_labels.astype(np.float32).flatten(), pred_labels.flatten(), self.num_classes
        )
        if rois is None or gt_poses is None:
            return
        if gt_poses.ndim == 2:
            gt_poses = gt_poses.reshape(3, 4, 1)
        for j in range(gt_poses.shape[2]):
            cls_index = int(gt_cls_indexes[j])
            if cls_index <= 0:
                continue
            cls = self.classes[cls_index]
            for k in range(rois.shape[0]):
                if int(rois[k, 1]) != cls_index:
                    continue
                RT = np.zeros((3, 4), dtype=np.float32)
                RT[:3, :3] = quat2mat(poses[k, :4])
                RT[:, 3] = poses[k, 4:7]
                err_r = re(RT[:3, :3], gt_poses[:3, :3, j])
                err_t = te(RT[:, 3], gt_poses[:, 3, j])
                fn = adi if cls in self.symmetric else add
                err = fn(RT[:3, :3], RT[:, 3], gt_poses[:3, :3, j], gt_poses[:, 3, j], self.points[cls_index])
                thresh = 0.1 * np.linalg.norm(self.extents[cls_index, :])
                self.pose_errors[cls_index].append((err, err_r, err_t, thresh))
                break

    def segmentation_iou(self) -> Dict[str, float]:
        intersection = np.diag(self.hist)
        union = self.hist.sum(1) + self.hist.sum(0) - np.diag(self.hist)
        out = {}
        for i in range(self.num_classes):
            if union[i] > 0:
                out[self.classes[i]] = float(intersection[i] / union[i])
        return out

    def pose_accuracy(self) -> Dict[str, float]:
        """Fraction of detections with ADD(-S) < 0.1*||extent|| per class."""
        out = {}
        for c, errs in self.pose_errors.items():
            if errs:
                correct = sum(1 for e, _, _, t in errs if e < t)
                out[self.classes[c]] = correct / len(errs)
        return out

    def adds_auc(self, max_threshold: float = 0.1) -> float:
        """Area under the ADD(-S) accuracy-threshold curve up to 10 cm
        (the headline YCB-Video metric from the PoseCNN paper)."""
        errs = [e for lst in self.pose_errors.values() for (e, _, _, _) in lst]
        if not errs:
            return 0.0
        errs = np.sort(np.array(errs))
        n = len(errs)
        accuracy = np.cumsum(np.ones(n)) / n
        # integrate accuracy(threshold) over [0, max_threshold]
        prev_t, prev_a, area = 0.0, 0.0, 0.0
        for e, a in zip(errs, accuracy):
            t = min(e, max_threshold)
            area += prev_a * (t - prev_t)
            prev_t, prev_a = t, a
            if e >= max_threshold:
                break
        area += prev_a * (max_threshold - prev_t)
        return float(area / max_threshold)

    def summary(self) -> Dict[str, object]:
        return {
            "seg_iou": self.segmentation_iou(),
            "mean_iou": float(np.mean(list(self.segmentation_iou().values()) or [0.0])),
            "pose_accuracy": self.pose_accuracy(),
            "adds_auc": self.adds_auc(),
        }
