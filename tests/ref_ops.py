"""Slow, loop-level NumPy implementations of the reference CUDA op semantics.

These mirror the reference kernels line-by-line (in NumPy) and serve as the
golden oracle for the TPU ops. They are NOT used by the framework itself.
Sources: lib/hough_voting_gpu_layer/hough_voting_gpu_op.cu.cc,
lib/average_distance_loss/average_distance_loss_op_gpu.cu.cc,
lib/hard_label_layer/hard_label_op_gpu.cu.cc,
lib/roi_pooling_layer/roi_pooling_op_gpu.cu.cc.
"""

from __future__ import annotations

import numpy as np


def quat2mat_np(q):
    s, u, v, w = q
    return np.array(
        [
            [s * s + u * u - v * v - w * w, 2 * (u * v - s * w), 2 * (u * w + s * v)],
            [2 * (u * v + s * w), s * s - u * u + v * v - w * w, 2 * (v * w - s * u)],
            [2 * (u * w - s * v), 2 * (v * w + s * u), s * s - u * u - v * v + w * w],
        ]
    )


def hard_label_ref(prob, gt, threshold):
    B, H, W, C = prob.shape
    out = np.zeros_like(prob)
    for b in range(B):
        for i in range(H):
            for j in range(W):
                g = gt[b, i, j]
                if g != -1 and (g > 0 or prob[b, i, j, g] < threshold):
                    out[b, i, j, g] = 1.0
    return out


def add_loss_ref(prediction, target, weight, points, symmetry, margin):
    """Returns (loss, bottom_diff) exactly as the CUDA kernels compute them."""
    N = prediction.shape[0]
    C, P, _ = points.shape
    losses = np.zeros((N, P))
    diffs = np.zeros((N, P, 4 * C))
    for n in range(N):
        cls = -1
        for c in range(C):
            if weight[n, 4 * c] > 0:
                cls = c
                break
        if cls < 0:
            continue
        q_gt = target[n, 4 * cls : 4 * cls + 4]
        q_pr = prediction[n, 4 * cls : 4 * cls + 4]
        Rg = quat2mat_np(q_gt)
        Rp = quat2mat_np(q_pr)
        s, u, v, w = q_pr
        D = [
            2 * np.array([[s, -w, v], [w, s, -u], [-v, u, s]]),
            2 * np.array([[u, v, w], [v, -u, -s], [w, s, -u]]),
            2 * np.array([[-v, u, s], [u, v, w], [-s, w, -v]]),
            2 * np.array([[-w, -s, u], [s, -w, v], [u, v, w]]),
        ]
        pts = points[cls]
        gt_rot = pts @ Rg.T
        for p in range(P):
            x1 = Rp @ pts[p]
            if symmetry[cls] > 0:
                d2 = np.sum((gt_rot - x1) ** 2, axis=1)
                imin = int(np.argmin(d2))
            else:
                imin = p
            x2 = gt_rot[imin]
            dist = float(np.sum((x1 - x2) ** 2))
            if dist < margin:
                continue
            losses[n, p] = (dist - margin) / (2.0 * N * P)
            diff = x1 - x2
            for k in range(4):
                diffs[n, p, 4 * cls + k] += diff @ (D[k] @ pts[p]) / (N * P)
    loss = losses.sum()
    bottom_diff = diffs.sum(axis=1)
    return loss, bottom_diff


def roi_pool_ref(feat, rois, pooled, spatial_scale, pool_channel=False):
    B, H, W, C = feat.shape
    R = rois.shape[0]
    Cout = 1 if pool_channel else C
    out = np.zeros((R, pooled, pooled, Cout), dtype=feat.dtype)
    for r in range(R):
        b = int(rois[r, 0])
        cls = int(rois[r, 1])
        x1 = int(round(rois[r, 2] * spatial_scale))
        y1 = int(round(rois[r, 3] * spatial_scale))
        x2 = int(round(rois[r, 4] * spatial_scale))
        y2 = int(round(rois[r, 5] * spatial_scale))
        rw = max(x2 - x1 + 1, 1)
        rh = max(y2 - y1 + 1, 1)
        bw = rw / float(pooled)
        bh = rh / float(pooled)
        for ph in range(pooled):
            for pw in range(pooled):
                hs = min(max(int(np.floor(ph * bh)) + y1, 0), H)
                he = min(max(int(np.ceil((ph + 1) * bh)) + y1, 0), H)
                ws = min(max(int(np.floor(pw * bw)) + x1, 0), W)
                we = min(max(int(np.ceil((pw + 1) * bw)) + x1, 0), W)
                empty = (he <= hs) or (we <= ws)
                chans = [cls] if pool_channel else range(C)
                for oc, c in enumerate(chans):
                    if empty:
                        out[r, ph, pw, oc] = 0
                    else:
                        out[r, ph, pw, oc] = feat[b, hs:he, ws:we, c].max()
    return out


def project_box_ref(extent, fx, fy, px, py, distance, factor=0.6):
    xh, yh, zh = extent * 0.5
    corners = []
    for sx in (1, -1):
        for sy in (1, -1):
            for sz in (1, -1):
                corners.append((sx * xh, sy * yh, sz * zh + distance))
    xs, ys = [], []
    for X, Y, Z in corners:
        xs.append(fx * X / Z + px)
        ys.append(fy * Y / Z + py)
    width = max(xs) - min(xs) + 1
    height = max(ys) - min(ys) + 1
    return max(width, height) * factor


def hough_argmax_ref(
    label, vertex, extents, meta, num_classes,
    skip_pixels=1, inlier_threshold=0.9, label_threshold=10,
):
    """Single-image, voting_threshold<0 path. Returns per-class detections:
    dict cls -> (cx, cy, votes, mean_distance, bb_width, bb_height)."""
    H, W = label.shape
    fx, px, fy, py = meta[0], meta[2], meta[4], meta[5]
    dets = {}
    for cls in range(1, num_classes):
        idx = [(y, x) for y in range(H) for x in range(W) if label[y, x] == cls]
        if len(idx) <= label_threshold:
            continue
        samples = idx[::skip_pixels]
        hough = np.zeros((H, W))
        dsum = np.zeros((H, W))
        for cy in range(H):
            for cx in range(W):
                for (y, x) in samples:
                    u = vertex[y, x, 3 * cls + 0]
                    v = vertex[y, x, 3 * cls + 1]
                    d = np.exp(vertex[y, x, 3 * cls + 2])
                    dxx, dyy = cx - x, cy - y
                    n1 = np.sqrt(u * u + v * v)
                    n2 = np.sqrt(dxx * dxx + dyy * dyy)
                    if n1 * n2 == 0:
                        continue
                    if (u * dxx + v * dyy) / (n1 * n2) > inlier_threshold:
                        thr = project_box_ref(extents[cls], fx, fy, px, py, d)
                        if abs(x - cx) < thr and abs(y - cy) < thr:
                            hough[cy, cx] += 1
                            dsum[cy, cx] += d
        flat_idx = int(np.argmax(hough))
        cy, cx = flat_idx // W, flat_idx % W
        votes = hough[cy, cx]
        dist = dsum[cy, cx] / votes if votes > 0 else 0.0
        bb_w, bb_h = -1.0, -1.0
        if votes > 0:
            thr = project_box_ref(extents[cls], fx, fy, px, py, dist)
            for (y, x) in samples:
                u = vertex[y, x, 3 * cls + 0]
                v = vertex[y, x, 3 * cls + 1]
                dxx, dyy = cx - x, cy - y
                n1 = np.sqrt(u * u + v * v)
                n2 = np.sqrt(dxx * dxx + dyy * dyy)
                if n1 * n2 == 0:
                    continue
                if (u * dxx + v * dyy) / (n1 * n2) > inlier_threshold:
                    ax, ay = abs(x - cx), abs(y - cy)
                    if ax > bb_w and ax < thr and ay < thr:
                        bb_w = ax
                    if ay > bb_h and ax < thr and ay < thr:
                        bb_h = ay
        dets[cls] = (cx, cy, votes, dist, 2 * bb_w if votes > 0 else 0.0, 2 * bb_h if votes > 0 else 0.0)
    return dets
