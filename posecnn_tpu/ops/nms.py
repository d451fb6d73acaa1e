"""Non-maximum suppression.

Replaces the reference's CUDA bitset NMS (`lib/nms/nms_kernel.cu`) and Cython
CPU NMS (`lib/nms/cpu_nms.pyx`). The JAX version is a fixed-iteration masked
greedy sweep (static shapes, jit-safe); the numpy version is the exact
classical algorithm for host-side use. Both use the "+1" area convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def nms_np(dets: np.ndarray, thresh: float) -> np.ndarray:
    """dets: (N,5) [x1,y1,x2,y2,score] -> kept indices (descending score)."""
    if dets.size == 0:
        return np.zeros((0,), dtype=np.int64)
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        ovr = (w * h) / (areas[i] + areas[order[1:]] - w * h)
        order = order[1:][ovr <= thresh]
    return np.array(keep, dtype=np.int64)


def nms_jax(boxes: jnp.ndarray, scores: jnp.ndarray, thresh: float) -> jnp.ndarray:
    """Greedy NMS under jit. boxes: (N,4); scores: (N,) -> keep mask (N,) bool.

    Boxes with score <= -inf-like sentinel are never kept. O(N^2) IoU matrix +
    O(N) sequential sweep; N is a static pad (MAX_ROI), so this compiles once.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    b = boxes[order]
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    iw = jnp.maximum(
        0.0, jnp.minimum(x2[:, None], x2[None, :]) - jnp.maximum(x1[:, None], x1[None, :]) + 1
    )
    ih = jnp.maximum(
        0.0, jnp.minimum(y2[:, None], y2[None, :]) - jnp.maximum(y1[:, None], y1[None, :]) + 1
    )
    inter = iw * ih
    iou = inter / (areas[:, None] + areas[None, :] - inter)
    over = iou > thresh

    def body(i, keep):
        # keep[i] stays True only if no kept higher-score box overlaps it
        mask = (jnp.arange(n) < i) & keep
        sup = jnp.any(jnp.where(mask, over[i], False))
        return keep.at[i].set(~sup)

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.ones((n,), dtype=bool))
    # scatter back to original order
    keep = jnp.zeros((n,), dtype=bool).at[order].set(keep_sorted)
    return keep
