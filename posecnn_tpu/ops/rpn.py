"""Region Proposal Network ops, fixed-shape JAX.

The reference runs these as host `tf.py_func`s mid-graph
(lib/rpn_layer/{generate_anchors,anchor_target_layer,proposal_layer,
proposal_target_layer}.py) — a host round-trip per step. Here they are
jit-compatible with static shapes: dynamic-size index sets become masked
fixed-size sets, random subsampling uses jax PRNG keys, and NMS is the
masked fixed-iteration sweep from ops/nms.py.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from posecnn_tpu.ops.bbox import bbox_overlaps, bbox_transform, bbox_transform_inv, clip_boxes
from posecnn_tpu.ops.nms import nms_jax


def generate_anchors(base_size=16, ratios=(0.5, 1, 2), scales=(8, 16, 32)) -> np.ndarray:
    """Base anchor windows (lib/rpn_layer/generate_anchors.py:41), host-side."""
    base_anchor = np.array([1, 1, base_size, base_size]) - 1

    def whctrs(anchor):
        w = anchor[2] - anchor[0] + 1
        h = anchor[3] - anchor[1] + 1
        x_ctr = anchor[0] + 0.5 * (w - 1)
        y_ctr = anchor[1] + 0.5 * (h - 1)
        return w, h, x_ctr, y_ctr

    def mkanchors(ws, hs, x_ctr, y_ctr):
        ws = ws[:, np.newaxis]
        hs = hs[:, np.newaxis]
        return np.hstack(
            (x_ctr - 0.5 * (ws - 1), y_ctr - 0.5 * (hs - 1), x_ctr + 0.5 * (ws - 1), y_ctr + 0.5 * (hs - 1))
        )

    w, h, x_ctr, y_ctr = whctrs(base_anchor)
    size = w * h
    size_ratios = size / np.array(ratios)
    ws = np.round(np.sqrt(size_ratios))
    hs = np.round(ws * np.array(ratios))
    ratio_anchors = mkanchors(ws, hs, x_ctr, y_ctr)
    anchors = np.vstack(
        [
            mkanchors(
                whctrs(ratio_anchors[i])[0] * np.array(scales),
                whctrs(ratio_anchors[i])[1] * np.array(scales),
                whctrs(ratio_anchors[i])[2],
                whctrs(ratio_anchors[i])[3],
            )
            for i in range(ratio_anchors.shape[0])
        ]
    )
    return anchors.astype(np.float32)


def shifted_anchors(height: int, width: int, feat_stride: int, base_anchors: np.ndarray) -> np.ndarray:
    """All anchors for an (height,width) feature map (snippets.py), host-side."""
    shift_x = np.arange(width) * feat_stride
    shift_y = np.arange(height) * feat_stride
    sx, sy = np.meshgrid(shift_x, shift_y)
    shifts = np.vstack((sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel())).T
    A = base_anchors.shape[0]
    K = shifts.shape[0]
    anchors = base_anchors.reshape(1, A, 4) + shifts.reshape(K, 1, 4)
    return anchors.reshape(K * A, 4).astype(np.float32)


def _random_subsample(key, eligible: jnp.ndarray, max_keep: int) -> jnp.ndarray:
    """Keep at most max_keep of the eligible entries, chosen uniformly.

    Fixed-shape: assigns random keys to eligible entries, keeps those whose
    rank < max_keep. Returns a bool mask.
    """
    n = eligible.shape[0]
    noise = jax.random.uniform(key, (n,))
    score = jnp.where(eligible, noise, 2.0)  # ineligible sorts last
    order = jnp.argsort(score)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return eligible & (rank < max_keep)


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray          # (A,) in {-1,0,1}
    bbox_targets: jnp.ndarray    # (A,4)
    bbox_inside_weights: jnp.ndarray
    bbox_outside_weights: jnp.ndarray


def anchor_target_layer(
    key,
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    im_info: Tuple[int, int],
    rpn_batchsize: int = 256,
    fg_fraction: float = 0.5,
    positive_overlap: float = 0.7,
    negative_overlap: float = 0.3,
    clobber_positives: bool = False,
    positive_weight: float = -1.0,
) -> AnchorTargets:
    """lib/rpn_layer/anchor_target_layer.py:18 with fixed shapes.

    gt_boxes: (G,5) zero-padded (rows with cls<=0 ignored).
    """
    A = anchors.shape[0]
    h, w = im_info
    gt_valid = gt_boxes[:, 4] > 0
    inside = (
        (anchors[:, 0] >= 0) & (anchors[:, 1] >= 0)
        & (anchors[:, 2] < w) & (anchors[:, 3] < h)
    )

    overlaps = bbox_overlaps(anchors, gt_boxes[:, :4])
    overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)
    argmax_gt = jnp.argmax(overlaps, axis=1)
    max_overlaps = jnp.max(overlaps, axis=1)
    gt_max = jnp.max(jnp.where(inside[:, None], overlaps, -1.0), axis=0)  # per gt
    is_gt_best = jnp.any(
        (overlaps >= gt_max[None, :] - 1e-5) & gt_valid[None, :] & (gt_max[None, :] > 0), axis=1
    )

    labels = jnp.full((A,), -1, jnp.int32)
    if not clobber_positives:
        labels = jnp.where(max_overlaps < negative_overlap, 0, labels)
    labels = jnp.where(is_gt_best, 1, labels)
    labels = jnp.where(max_overlaps >= positive_overlap, 1, labels)
    if clobber_positives:
        labels = jnp.where(max_overlaps < negative_overlap, 0, labels)
    labels = jnp.where(inside, labels, -1)

    # subsample
    k1, k2 = jax.random.split(key)
    num_fg = int(fg_fraction * rpn_batchsize)
    fg_keep = _random_subsample(k1, labels == 1, num_fg)
    labels = jnp.where((labels == 1) & ~fg_keep, -1, labels)
    n_fg = jnp.sum(labels == 1)
    # keep only rpn_batchsize - n_fg backgrounds
    noise = jax.random.uniform(k2, (A,))
    bg_score = jnp.where(labels == 0, noise, 2.0)
    bg_order = jnp.argsort(bg_score)
    bg_rank = jnp.zeros((A,), jnp.int32).at[bg_order].set(jnp.arange(A, dtype=jnp.int32))
    labels = jnp.where((labels == 0) & (bg_rank >= rpn_batchsize - n_fg), -1, labels)

    targets = bbox_transform(anchors, gt_boxes[argmax_gt, :4])
    inside_w = jnp.where((labels == 1)[:, None], 1.0, 0.0) * jnp.ones((1, 4))
    n_examples = jnp.maximum(jnp.sum(labels >= 0), 1)
    if positive_weight < 0:
        pos_w = 1.0 / n_examples
        neg_w = 1.0 / n_examples
    else:
        pos_w = positive_weight / jnp.maximum(jnp.sum(labels == 1), 1)
        neg_w = (1.0 - positive_weight) / jnp.maximum(jnp.sum(labels == 0), 1)
    outside_w = jnp.where(
        (labels == 1)[:, None], pos_w, jnp.where((labels == 0)[:, None], neg_w, 0.0)
    ) * jnp.ones((1, 4))
    return AnchorTargets(labels, targets, inside_w, outside_w)


def proposal_layer(
    rpn_cls_prob: jnp.ndarray,
    rpn_bbox_pred: jnp.ndarray,
    anchors: jnp.ndarray,
    im_info: Tuple[int, int],
    num_anchors: int,
    pre_nms_top_n: int = 6000,
    post_nms_top_n: int = 300,
    nms_thresh: float = 0.7,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """lib/rpn_layer/proposal_layer.py:15 — decode + top-k + NMS, fixed shape.

    rpn_cls_prob: (H,W,2A); rpn_bbox_pred: (H,W,4A); anchors: (H*W*A,4).
    Returns rois (post_nms_top_n, 5) [batch0,x1,y1,x2,y2] and scores; invalid
    rows zeroed.
    """
    H, W = rpn_cls_prob.shape[:2]
    scores = rpn_cls_prob[:, :, num_anchors:]  # fg probs (H,W,A)
    scores = scores.reshape(-1)
    deltas = rpn_bbox_pred.reshape(-1, 4)
    proposals = bbox_transform_inv(anchors, deltas)
    proposals = clip_boxes(proposals, im_info)

    n = scores.shape[0]
    k = min(pre_nms_top_n, n)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = proposals[top_idx]
    keep = nms_jax(top_boxes, top_scores, nms_thresh)
    # order survivors by score (top_k input was sorted), take post_nms_top_n
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    out_boxes = jnp.zeros((post_nms_top_n, 4))
    out_scores = jnp.zeros((post_nms_top_n,))
    sel = keep & (rank < post_nms_top_n)
    dest = jnp.where(sel, rank, post_nms_top_n)
    out_boxes = jnp.zeros((post_nms_top_n + 1, 4)).at[dest].set(top_boxes, mode="drop")[:post_nms_top_n]
    out_scores = jnp.zeros((post_nms_top_n + 1,)).at[dest].set(top_scores, mode="drop")[:post_nms_top_n]
    rois = jnp.concatenate([jnp.zeros((post_nms_top_n, 1)), out_boxes], axis=1)
    return rois, out_scores


class ProposalTargets(NamedTuple):
    rois: jnp.ndarray            # (R,5)
    scores: jnp.ndarray          # (R,)
    labels: jnp.ndarray          # (R,)
    bbox_targets: jnp.ndarray    # (R,4C)
    bbox_inside_weights: jnp.ndarray
    bbox_outside_weights: jnp.ndarray
    poses_target: jnp.ndarray    # (R,4C)
    poses_weight: jnp.ndarray


def proposal_target_layer(
    key,
    rois: jnp.ndarray,
    scores: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    poses: jnp.ndarray,
    num_classes: int,
    batch_size: int = 128,
    fg_fraction: float = 0.25,
    fg_thresh: float = 0.5,
    bg_thresh_hi: float = 0.5,
    bg_thresh_lo: float = 0.1,
    bbox_normalize_stds=(0.1, 0.1, 0.2, 0.2),
) -> ProposalTargets:
    """lib/rpn_layer/proposal_target_layer.py:17 with fixed output size.

    gt_boxes: (G,5) [x1,y1,x2,y2,cls] zero-padded; poses: (G,13).
    Output has `batch_size` rows; non-sampled rows are marked background
    with zero weights.
    """
    gt_valid = gt_boxes[:, 4] > 0
    # include gt boxes among candidates, like the reference (USE_GT aside)
    overlaps = bbox_overlaps(rois[:, 1:5], gt_boxes[:, :4])
    overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)
    gt_assignment = jnp.argmax(overlaps, axis=1)
    max_overlaps = jnp.max(overlaps, axis=1)
    labels_all = gt_boxes[gt_assignment, 4].astype(jnp.int32)
    quats = poses[gt_assignment, 6:10]

    fg = max_overlaps >= fg_thresh
    bg = (max_overlaps < bg_thresh_hi) & (max_overlaps >= bg_thresh_lo)
    k1, k2 = jax.random.split(key)
    n_fg_target = int(fg_fraction * batch_size)
    fg_keep = _random_subsample(k1, fg, n_fg_target)
    n_fg = jnp.sum(fg_keep)
    noise = jax.random.uniform(k2, (rois.shape[0],))
    bg_score = jnp.where(bg, noise, 2.0)
    bg_order = jnp.argsort(bg_score)
    bg_rank = jnp.zeros_like(bg_order).at[bg_order].set(jnp.arange(rois.shape[0]))
    bg_keep = bg & (bg_rank < batch_size - n_fg)

    sampled = fg_keep | bg_keep
    # pack sampled rows into a fixed batch_size block (fg first)
    sort_key = jnp.where(fg_keep, 0, jnp.where(bg_keep, 1, 2)) * rois.shape[0] + jnp.arange(rois.shape[0])
    order = jnp.argsort(sort_key)
    take = order[:batch_size]
    valid_row = jnp.arange(batch_size) < jnp.sum(sampled)

    out_rois = jnp.where(valid_row[:, None], rois[take], 0.0)
    out_scores = jnp.where(valid_row, scores[take], 0.0)
    out_labels = jnp.where(valid_row & fg_keep[take], labels_all[take], 0)
    out_quats = quats[take]

    # per-class bbox regression targets
    targets = bbox_transform(out_rois[:, 1:5], gt_boxes[gt_assignment[take], :4])
    targets = targets / jnp.asarray(bbox_normalize_stds)
    cls_onehot = jax.nn.one_hot(out_labels, num_classes)  # (R,C)
    bbox_targets = (cls_onehot[:, :, None] * targets[:, None, :]).reshape(batch_size, 4 * num_classes)
    is_fg_row = (out_labels > 0)[:, None, None]
    bbox_iw = jnp.where(is_fg_row, cls_onehot[:, :, None] * jnp.ones((1, 1, 4)), 0.0).reshape(
        batch_size, 4 * num_classes
    )
    bbox_ow = (bbox_iw > 0).astype(jnp.float32)

    poses_target = (cls_onehot[:, :, None] * out_quats[:, None, :]).reshape(batch_size, 4 * num_classes)
    poses_weight = jnp.where(is_fg_row, cls_onehot[:, :, None] * jnp.ones((1, 1, 4)), 0.0).reshape(
        batch_size, 4 * num_classes
    )
    poses_target = jnp.where((out_labels > 0)[:, None], poses_target, 0.0)
    return ProposalTargets(
        out_rois, out_scores, out_labels, bbox_targets, bbox_iw, bbox_ow, poses_target, poses_weight
    )
