"""Host-side minibatch assembly (NumPy/cv2), fixed device shapes.

Behavioral rewrite of `lib/gt_synthesize_layer/minibatch.py`:
  * image blob: BGR, optional chromatic jitter + gaussian/motion-blur noise,
    PIXEL_MEANS subtraction before resize (minibatch.py:180-239);
  * synthetic frames composited over random backgrounds (:121-154);
  * label blob (int32 class ids; -1 for adaptation frames, :517-525);
  * vertex targets: per-pixel unit direction to the object center + log z in
    the 3 channels of the pixel's class (:543-602);
  * pose blob rows (idx, cls, 4 zeros, quat wxyz, T) (:439-451) — padded to a
    fixed MAX_GT for static device shapes (the reference's was dynamic);
  * 48-float meta_data: K*scale and K^-1 (:468-492);
  * symmetric-point rescaling trick for the ADD loss point blob (:49-63).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import cv2
import numpy as np

from posecnn_tpu.utils.blob import add_noise, chromatic_transform, pad_im
from posecnn_tpu.utils.quaternion_np import mat2quat


@dataclass
class Frame:
    """One annotated frame, the unit consumed by the minibatch builder."""

    color: np.ndarray                 # (H,W,3) uint8 BGR
    label: np.ndarray                 # (H,W) int class ids
    cls_indexes: np.ndarray           # (N,) class ids present
    poses: np.ndarray                 # (3,4,N) [R|t] per instance
    center: np.ndarray                # (N,2) projected object centers (x,y)
    intrinsic_matrix: np.ndarray      # (3,3)
    depth: Optional[np.ndarray] = None       # (H,W) raw depth
    factor_depth: float = 1000.0
    is_synthetic: bool = False        # composite over a random background
    is_adaptation: bool = False       # no labels: label blob = -1
    mask: Optional[np.ndarray] = None  # instance mask for multi-instance
    flipped: bool = False


@dataclass
class MinibatchConfig:
    num_classes: int = 22
    pixel_means: np.ndarray = field(
        default_factory=lambda: np.array([[[102.9801, 115.9465, 122.7717]]])
    )
    chromatic: bool = True
    add_noise: bool = False
    vertex_reg: bool = True
    vertex_w_inside: float = 10.0
    max_gt: int = 24
    scale: float = 1.0
    is_symmetric: bool = True
    # TPU fast path: ship uint8 frames + a small (G,4) GT-center table and
    # build the mean-subtracted input and the (B,H,W,3C) vertex targets
    # inside the train step's jit graph (ops/vertex_targets.py). This host
    # otherwise spends seconds per batch on the 162 MB target blob.
    device_targets: bool = False


def generate_vertex_targets(
    im_label: np.ndarray,
    cls_indexes: np.ndarray,
    centers: np.ndarray,
    poses: np.ndarray,
    num_classes: int,
    vertex_weights_value: float = 10.0,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-pixel (unit dir to center, log z) targets (minibatch.py:577-602)."""
    height, width = im_label.shape
    targets = np.zeros((height, width, 3 * num_classes), dtype=np.float32)
    weights = np.zeros((height, width, 3 * num_classes), dtype=np.float32)
    c = np.zeros((2, 1), dtype=np.float32)
    for i in range(1, num_classes):
        y, x = np.where(im_label == i)
        ind = np.where(cls_indexes == i)[0]
        if len(x) > 0 and len(ind) > 0:
            c[0] = centers[ind[0], 0]
            c[1] = centers[ind[0], 1]
            z = poses[2, 3, ind[0]]
            R = np.tile(c, (1, len(x))) - np.vstack((x, y))
            N = np.linalg.norm(R, axis=0) + 1e-10
            R = R / np.tile(N, (2, 1))
            targets[y, x, 3 * i + 0] = R[0, :]
            targets[y, x, 3 * i + 1] = R[1, :]
            targets[y, x, 3 * i + 2] = math.log(z)
            weights[y, x, 3 * i : 3 * i + 3] = vertex_weights_value
    return targets, weights


def composite_background(color: np.ndarray, label: np.ndarray, background: np.ndarray) -> np.ndarray:
    """Paste synthetic foreground over a background image (minibatch.py:130-154)."""
    bg = cv2.resize(background, (color.shape[1], color.shape[0]))
    out = bg.copy()
    I = np.where(label > 0)
    out[I[0], I[1], :] = color[I[0], I[1], :3]
    return out


def build_meta_data(K: np.ndarray, im_scale: float = 1.0, flip_x: bool = False) -> np.ndarray:
    K = np.asarray(K, dtype=np.float64) * im_scale
    K[2, 2] = 1
    Kinv = np.linalg.pinv(np.matrix(K))
    mdata = np.zeros(48, dtype=np.float32)
    mdata[0:9] = K.flatten()
    mdata[9:18] = np.asarray(Kinv).flatten()
    if flip_x:
        mdata[0] *= -1
        mdata[9] *= -1
        mdata[11] *= -1
    return mdata


def pose_rows(frame_index: int, frame: Frame) -> np.ndarray:
    n = frame.poses.shape[2]
    qt = np.zeros((n, 13), dtype=np.float32)
    for j in range(n):
        qt[j, 0] = frame_index
        qt[j, 1] = frame.cls_indexes[j]
        qt[j, 6:10] = mat2quat(frame.poses[:, :3, j])
        qt[j, 10:] = frame.poses[:, 3, j]
    return qt


def rescale_points(points: np.ndarray, extents: np.ndarray, symmetry: np.ndarray, is_symmetric: bool = True) -> np.ndarray:
    """Symmetric-point rescaling for the ADD loss (minibatch.py:49-63)."""
    out = points.copy()
    num_classes = points.shape[0]
    for i in range(1, num_classes):
        ext_max = np.amax(extents[i, :])
        weight = 2.0 / ext_max if ext_max > 0 else 10.0
        if weight < 10:
            weight = 10
        if symmetry[i] > 0 and is_symmetric:
            out[i] = 4 * weight * points[i]
        else:
            out[i] = weight * points[i]
    return out


def get_minibatch(
    frames: List[Frame],
    mcfg: MinibatchConfig,
    extents: np.ndarray,
    points: np.ndarray,
    symmetry: np.ndarray,
    backgrounds: Optional[List[np.ndarray]] = None,
    rng: Optional[np.random.RandomState] = None,
) -> Dict[str, np.ndarray]:
    """Assemble the device batch dict with fixed shapes."""
    rng = rng or np.random.RandomState()
    C = mcfg.num_classes
    ims, labels, metas, vtargets, vweights, center_rows = [], [], [], [], [], []
    pose_blob = np.zeros((0, 13), dtype=np.float32)

    for i, fr in enumerate(frames):
        im = pad_im(fr.color, 16)
        label = pad_im(fr.label.astype(np.int32), 16)
        if fr.is_synthetic and backgrounds:
            bg = backgrounds[rng.randint(len(backgrounds))]
            im = composite_background(im, label, bg)
        if mcfg.chromatic:
            im = chromatic_transform(im, rng=rng)
        if mcfg.add_noise:
            im = add_noise(im, rng=rng)
        if mcfg.device_targets:
            ims.append(np.ascontiguousarray(im[..., :3]).astype(np.uint8))
        else:
            im = im.astype(np.float32) - mcfg.pixel_means
            ims.append(im)
        metas.append(build_meta_data(fr.intrinsic_matrix, mcfg.scale))

        if fr.is_adaptation:
            labels.append(-1 * np.ones_like(label))
            center_rows.append(np.zeros((0, 4), np.float32))
            if not mcfg.device_targets:
                vtargets.append(np.zeros(label.shape + (3 * C,), dtype=np.float32))
                vweights.append(np.zeros(label.shape + (3 * C,), dtype=np.float32))
            continue
        labels.append(label)
        if mcfg.vertex_reg:
            if mcfg.device_targets:
                n_inst = fr.poses.shape[2]
                rows = np.zeros((n_inst, 4), np.float32)
                rows[:, 0] = fr.cls_indexes[:n_inst]
                rows[:, 1:3] = fr.center[:n_inst]
                rows[:, 3] = fr.poses[2, 3, :n_inst]
                center_rows.append(rows)
            else:
                t, w = generate_vertex_targets(
                    label, fr.cls_indexes, fr.center, fr.poses, C, mcfg.vertex_w_inside
                )
                vtargets.append(t)
                vweights.append(w)
        pose_blob = np.concatenate([pose_blob, pose_rows(i, fr)], axis=0)

    # pad GT rows to the static cap
    gt = np.zeros((mcfg.max_gt, 13), dtype=np.float32)
    n = min(len(pose_blob), mcfg.max_gt)
    gt[:n] = pose_blob[:n]

    batch = {
        "data": np.stack(ims) if mcfg.device_targets else np.stack(ims).astype(np.float32),
        "gt_label_2d": np.stack(labels).astype(np.int32),
        "meta_data": np.stack(metas).astype(np.float32),
        "poses": gt,
    }
    if mcfg.vertex_reg:
        if mcfg.device_targets:
            G = mcfg.max_gt
            gc = np.zeros((len(frames), G, 4), np.float32)
            for i, rows in enumerate(center_rows):
                k = min(len(rows), G)
                gc[i, :k] = rows[:k]
            batch["gt_centers"] = gc
        else:
            batch["vertex_targets"] = np.stack(vtargets)
            batch["vertex_weights"] = np.stack(vweights)
    if mcfg.device_targets:
        # static blobs are NOT replicated into every batch on the fast path —
        # the train step closes over points/symmetry/extents directly
        return batch
    batch["points"] = rescale_points(points, extents, symmetry, mcfg.is_symmetric)
    batch["symmetry"] = symmetry if mcfg.is_symmetric else np.zeros_like(symmetry)
    batch["extents"] = extents
    return batch
