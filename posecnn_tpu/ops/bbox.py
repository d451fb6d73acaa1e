"""Box IoU and bbox-regression transforms.

Replaces the reference's Cython `bbox_overlaps` (`lib/utils/bbox.pyx`) with a
single broadcast expression, and mirrors `lib/utils/bbox_transform.py`.
All functions work on numpy arrays or JAX tracers. Uses the Pascal VOC "+1"
pixel-area convention like the reference.
"""

from __future__ import annotations

import numpy as np


def _xp(a):
    if isinstance(a, np.ndarray):
        return np
    import jax.numpy as jnp

    return jnp


def bbox_overlaps(boxes, query_boxes):
    """IoU matrix. boxes: (N,4), query_boxes: (K,4) -> (N,K)."""
    xp = _xp(boxes)
    b_x1, b_y1, b_x2, b_y2 = boxes[:, 0:1], boxes[:, 1:2], boxes[:, 2:3], boxes[:, 3:4]
    q_x1, q_y1, q_x2, q_y2 = query_boxes[:, 0], query_boxes[:, 1], query_boxes[:, 2], query_boxes[:, 3]
    iw = xp.minimum(b_x2, q_x2[None, :]) - xp.maximum(b_x1, q_x1[None, :]) + 1
    ih = xp.minimum(b_y2, q_y2[None, :]) - xp.maximum(b_y1, q_y1[None, :]) + 1
    iw = xp.maximum(iw, 0)
    ih = xp.maximum(ih, 0)
    inter = iw * ih
    area_b = (b_x2 - b_x1 + 1) * (b_y2 - b_y1 + 1)
    area_q = (q_x2 - q_x1 + 1) * (q_y2 - q_y1 + 1)
    union = area_b + area_q[None, :] - inter
    return inter / union


def bbox_transform(ex_rois, gt_rois):
    """Regression targets (dx,dy,dw,dh) from example to GT boxes."""
    xp = _xp(ex_rois)
    ex_widths = ex_rois[:, 2] - ex_rois[:, 0] + 1.0
    ex_heights = ex_rois[:, 3] - ex_rois[:, 1] + 1.0
    ex_ctr_x = ex_rois[:, 0] + 0.5 * ex_widths
    ex_ctr_y = ex_rois[:, 1] + 0.5 * ex_heights

    gt_widths = gt_rois[:, 2] - gt_rois[:, 0] + 1.0
    gt_heights = gt_rois[:, 3] - gt_rois[:, 1] + 1.0
    gt_ctr_x = gt_rois[:, 0] + 0.5 * gt_widths
    gt_ctr_y = gt_rois[:, 1] + 0.5 * gt_heights

    dx = (gt_ctr_x - ex_ctr_x) / ex_widths
    dy = (gt_ctr_y - ex_ctr_y) / ex_heights
    dw = xp.log(gt_widths / ex_widths)
    dh = xp.log(gt_heights / ex_heights)
    return xp.stack([dx, dy, dw, dh], axis=1)


def bbox_transform_inv(boxes, deltas):
    """Decode predicted deltas back to boxes. boxes (N,4), deltas (N,4K)."""
    xp = _xp(boxes)
    widths = boxes[:, 2] - boxes[:, 0] + 1.0
    heights = boxes[:, 3] - boxes[:, 1] + 1.0
    ctr_x = boxes[:, 0] + 0.5 * widths
    ctr_y = boxes[:, 1] + 0.5 * heights

    dx = deltas[:, 0::4]
    dy = deltas[:, 1::4]
    dw = deltas[:, 2::4]
    dh = deltas[:, 3::4]

    pred_ctr_x = dx * widths[:, None] + ctr_x[:, None]
    pred_ctr_y = dy * heights[:, None] + ctr_y[:, None]
    pred_w = xp.exp(dw) * widths[:, None]
    pred_h = xp.exp(dh) * heights[:, None]

    out = xp.stack(
        [
            pred_ctr_x - 0.5 * pred_w,
            pred_ctr_y - 0.5 * pred_h,
            pred_ctr_x + 0.5 * pred_w,
            pred_ctr_y + 0.5 * pred_h,
        ],
        axis=2,
    )
    return out.reshape(boxes.shape[0], -1)


def clip_boxes(boxes, im_shape):
    """Clip (N,4K) boxes to image bounds (H, W)."""
    xp = _xp(boxes)
    h, w = im_shape[0], im_shape[1]
    x1 = xp.clip(boxes[:, 0::4], 0, w - 1)
    y1 = xp.clip(boxes[:, 1::4], 0, h - 1)
    x2 = xp.clip(boxes[:, 2::4], 0, w - 1)
    y2 = xp.clip(boxes[:, 3::4], 0, h - 1)
    out = xp.stack([x1, y1, x2, y2], axis=2)
    return out.reshape(boxes.shape[0], -1)
