"""Prediction visualization (TEST.VISUALIZE / --vis).

Replaces the reference's matplotlib prediction rendering
(`lib/fcn/test.py:642-1113`: label overlay + detections + projected 3D
bounding boxes) with cv2 drawing written as PNGs under the output dir.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

# 12 edges of a box as corner-index pairs (corners = sign choices over xyz)
_BOX_EDGES = (
    (0, 1), (0, 2), (1, 3), (2, 3),
    (4, 5), (4, 6), (5, 7), (6, 7),
    (0, 4), (1, 5), (2, 6), (3, 7),
)


def class_colors(num_classes: int) -> np.ndarray:
    """Deterministic BGR palette: evenly spread hues (class 0 = black)."""
    import cv2

    hsv = np.zeros((num_classes, 1, 3), np.uint8)
    hsv[:, 0, 0] = (np.arange(num_classes) * 180 // max(num_classes, 1)).astype(np.uint8)
    hsv[:, 0, 1] = 255
    hsv[:, 0, 2] = 255
    bgr = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR).reshape(num_classes, 3)
    bgr[0] = 0
    return bgr


def project_box_corners(extent: np.ndarray, quat: np.ndarray, trans: np.ndarray, K: np.ndarray) -> np.ndarray:
    """8 projected 2D corners (pixels) of the model-frame bounding box under
    pose (quat, trans)."""
    from posecnn_tpu.utils.quaternion_np import quat2mat

    signs = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)], np.float64
    )
    corners = signs * (np.asarray(extent, np.float64) / 2.0)  # (8,3)
    R = quat2mat(np.asarray(quat, np.float64))
    cam = corners @ R.T + np.asarray(trans, np.float64)
    uv = cam @ np.asarray(K, np.float64).T
    return uv[:, :2] / np.maximum(uv[:, 2:3], 1e-9)


class MinibatchVisualizer:
    """TRAIN.VISUALIZE hook: renders assembled minibatches as PNGs.

    Replaces the reference's matplotlib `_vis_minibatch`
    (lib/gt_synthesize_layer/minibatch.py:650-745): input image, label
    overlay, GT centers and projected 3D boxes, written under
    <out_dir>/vis_minibatch for the first `max_batches` visualized steps.
    """

    def __init__(
        self,
        out_dir: str,
        num_classes: int,
        extents: np.ndarray,
        pixel_means: np.ndarray | None = None,
        alpha: float = 0.4,
        max_batches: int = 8,
    ):
        self.out_dir = os.path.join(out_dir, "vis_minibatch")
        self.num_classes = num_classes
        self.extents = np.asarray(extents)
        self.pixel_means = (
            np.asarray(pixel_means).reshape(1, 1, 3)
            if pixel_means is not None
            else np.array([[[102.9801, 115.9465, 122.7717]]])
        )
        self.alpha = alpha
        self.max_batches = max_batches
        self.colors = class_colors(num_classes)
        self._seen = 0
        os.makedirs(self.out_dir, exist_ok=True)

    def __call__(self, iteration: int, batch) -> None:
        import cv2

        if self._seen >= self.max_batches:
            return
        self._seen += 1
        data = np.asarray(batch["data"])
        labels = np.asarray(batch["gt_label_2d"])
        metas = np.asarray(batch["meta_data"])
        poses = np.asarray(batch.get("poses", np.zeros((0, 13), np.float32)))
        centers = batch.get("gt_centers")
        centers = None if centers is None else np.asarray(centers)
        B = data.shape[0]
        for i in range(B):
            im = data[i][..., :3]
            if im.dtype != np.uint8:  # mean-subtracted float path
                im = np.clip(im + self.pixel_means, 0, 255).astype(np.uint8)
            im = np.ascontiguousarray(im).copy()
            label = labels[i]
            if (label >= 0).any():
                overlay = self.colors[np.clip(label, 0, self.num_classes - 1)]
                mask = label > 0
                im[mask] = (
                    (1 - self.alpha) * im[mask] + self.alpha * overlay[mask]
                ).astype(np.uint8)
            K = metas[i, :9].reshape(3, 3)
            for g in range(poses.shape[0]):
                row = poses[g]
                if int(row[0]) != i or row[1] <= 0:
                    continue
                c = int(row[1])
                color = tuple(int(v) for v in self.colors[min(c, self.num_classes - 1)])
                quat, trans = row[6:10], row[10:13]
                if trans[2] > 0 and c < self.extents.shape[0]:
                    uv = project_box_corners(self.extents[c], quat, trans, K).astype(int)
                    for a, b in _BOX_EDGES:
                        cv2.line(im, tuple(uv[a]), tuple(uv[b]), color, 1, cv2.LINE_AA)
            if centers is not None:
                for g in range(centers.shape[1]):
                    c, cx, cy = int(centers[i, g, 0]), centers[i, g, 1], centers[i, g, 2]
                    if c <= 0:
                        continue
                    color = tuple(int(v) for v in self.colors[min(c, self.num_classes - 1)])
                    cv2.drawMarker(
                        im, (int(cx), int(cy)), color,
                        markerType=cv2.MARKER_CROSS, markerSize=8, thickness=1,
                    )
            cv2.imwrite(
                os.path.join(self.out_dir, f"iter{iteration:06d}_im{i}.png"), im
            )


class PredictionVisualizer:
    """Callable hook for engine.test.test_net: writes
    <out_dir>/<index>-vis.png with the label overlay, detection boxes and
    projected 3D boxes."""

    def __init__(self, out_dir: str, classes: Sequence[str], extents: np.ndarray, alpha: float = 0.4):
        self.out_dir = out_dir
        self.classes = list(classes)
        self.extents = np.asarray(extents)
        self.alpha = alpha
        self.colors = class_colors(len(self.classes))
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, index: int, frame, out, rois: np.ndarray, poses: np.ndarray):
        import cv2

        im = np.ascontiguousarray(frame.color[..., :3]).copy()
        label = np.asarray(out["label_2d"][0])
        if label.shape != im.shape[:2]:
            label = cv2.resize(
                label.astype(np.int32), (im.shape[1], im.shape[0]),
                interpolation=cv2.INTER_NEAREST,
            )
        overlay = self.colors[np.clip(label, 0, len(self.classes) - 1)]
        mask = label > 0
        im[mask] = (
            (1 - self.alpha) * im[mask] + self.alpha * overlay[mask]
        ).astype(np.uint8)

        K = np.asarray(frame.intrinsic_matrix, np.float64)
        for k in range(rois.shape[0]):
            c = int(rois[k, 1])
            if c <= 0 or c >= len(self.classes):
                continue
            color = tuple(int(v) for v in self.colors[c])
            x1, y1, x2, y2 = rois[k, 2:6].astype(int)
            cv2.rectangle(im, (x1, y1), (x2, y2), color, 1)
            cv2.putText(
                im, self.classes[c], (x1, max(y1 - 3, 10)),
                cv2.FONT_HERSHEY_SIMPLEX, 0.4, color, 1, cv2.LINE_AA,
            )
            if poses is not None and k < poses.shape[0] and poses[k, 6] > 0:
                uv = project_box_corners(
                    self.extents[c], poses[k, :4], poses[k, 4:7], K
                ).astype(int)
                for a, b in _BOX_EDGES:
                    cv2.line(im, tuple(uv[a]), tuple(uv[b]), color, 1, cv2.LINE_AA)
        cv2.imwrite(os.path.join(self.out_dir, f"{index:06d}-vis.png"), im)
