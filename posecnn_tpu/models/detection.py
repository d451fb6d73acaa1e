"""vgg16_det: Faster-R-CNN-style detection + pose variant.

Rewrite of lib/networks/vgg16_det.py:50-167: VGG trunk -> 3x3 RPN conv ->
anchor cls/bbox heads -> in-graph anchor targets + proposal decode/NMS +
proposal targets (the reference did these via host tf.py_func) ->
crop_pool -> fc6/fc7 -> class scores, bbox deltas and quaternion head
with the ADD loss.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from posecnn_tpu.models import layers as L
from posecnn_tpu.models.backbone import init_vgg_trunk, vgg_trunk
from posecnn_tpu.ops.rpn import (
    anchor_target_layer,
    generate_anchors,
    proposal_layer,
    proposal_target_layer,
    shifted_anchors,
)
from posecnn_tpu.ops.roi_pool import crop_pool_batched


@dataclass(frozen=True)
class DetConfig:
    num_classes: int = 22
    anchor_scales: Tuple[float, ...] = (8, 16, 32)
    anchor_ratios: Tuple[float, ...] = (0.5, 1, 2)
    feature_stride: int = 16
    is_train: bool = True
    keep_prob: float = 0.5
    compute_dtype: Any = jnp.bfloat16
    rpn_pre_nms_top_n: int = 6000
    rpn_post_nms_top_n: int = 300
    rpn_nms_thresh: float = 0.7
    roi_batch_size: int = 128
    fc_dim: int = 4096

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_scales) * len(self.anchor_ratios)


def init_vgg16_det_params(key: jax.Array, cfg: DetConfig) -> Dict:
    C = cfg.num_classes
    A = cfg.num_anchors
    ks = iter(jax.random.split(key, 16))
    params: Dict[str, Any] = {}
    params.update(init_vgg_trunk(next(ks)))
    params["conv_rpn"] = L.init_conv(next(ks), 3, 3, 512, 512)
    # output heads start near zero (stddev 0.01/0.001, the reference's
    # network.py:224-240 scale): He-scaled logits on un-normalized VGG
    # activations (input std ~60) put the initial CE at ~30 nats and the
    # momentum step diverges; hidden layers keep He (from-scratch training)
    params["rpn_cls_score"] = L.init_conv(next(ks), 1, 1, 512, 2 * A, stddev=0.01)
    params["rpn_bbox_pred"] = L.init_conv(next(ks), 1, 1, 512, 4 * A, stddev=0.001)
    params["fc6"] = L.init_fc(next(ks), 7 * 7 * 512, cfg.fc_dim)
    params["fc7"] = L.init_fc(next(ks), cfg.fc_dim, cfg.fc_dim)
    params["cls_score"] = L.init_fc(next(ks), cfg.fc_dim, C, stddev=0.01)
    params["bbox_pred"] = L.init_fc(next(ks), cfg.fc_dim, 4 * C, stddev=0.001)
    params["poses_pred_unnormalized"] = L.init_fc(next(ks), cfg.fc_dim, 4 * C, stddev=0.001)
    return params


def vgg16_det_forward(
    params: Dict,
    cfg: DetConfig,
    data: jnp.ndarray,
    gt_boxes: Optional[jnp.ndarray] = None,
    gt_poses: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
) -> Dict[str, jnp.ndarray]:
    """Single-image detection graph (the reference is single-batch too,
    minibatch.py:291-292). data: (1,H,W,3); gt_boxes: (G,5); gt_poses: (G,13)."""
    assert data.shape[0] == 1, "detection path is single-image, like the reference"
    dt = cfg.compute_dtype
    C = cfg.num_classes
    A = cfg.num_anchors
    H, W = data.shape[1], data.shape[2]
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r_at, r_pt, r_d6, r_d7 = jax.random.split(rng, 4)
    keep = cfg.keep_prob if cfg.is_train else 1.0

    net = vgg_trunk(params, data, compute_dtype=dt)
    conv_rpn = L.conv2d(params["conv_rpn"], net["conv5_3"], relu=True, compute_dtype=dt)
    # relu=False on purpose: the reference's conv default (relu=True,
    # network.py:160) accidentally ReLUs these heads — clamped logits kill
    # gradients on confident negatives, and non-negative box deltas cannot
    # fit the signed regression targets at all. No released det checkpoint
    # exists, so nothing pins us to the quirk.
    rpn_cls_score = L.conv2d(params["rpn_cls_score"], conv_rpn, relu=False, compute_dtype=dt)
    rpn_bbox_pred = L.conv2d(params["rpn_bbox_pred"], conv_rpn, relu=False, compute_dtype=dt)

    Hf, Wf = conv_rpn.shape[1], conv_rpn.shape[2]
    # softmax over the 2-way (bg,fg) axis, reference reshape_score trick
    cls_pairs = rpn_cls_score.reshape(1, Hf, Wf, A, 2)
    rpn_cls_prob = jax.nn.softmax(cls_pairs, axis=-1).reshape(1, Hf, Wf, 2 * A)
    # reorder to (bg...,fg...) channel blocks like the reference layout
    rpn_prob_blocks = jnp.concatenate(
        [rpn_cls_prob.reshape(1, Hf, Wf, A, 2)[..., 0], rpn_cls_prob.reshape(1, Hf, Wf, A, 2)[..., 1]],
        axis=-1,
    )

    base = generate_anchors(cfg.feature_stride, cfg.anchor_ratios, cfg.anchor_scales)
    anchors = jnp.asarray(shifted_anchors(Hf, Wf, cfg.feature_stride, base))

    out: Dict[str, jnp.ndarray] = {
        "rpn_cls_score": rpn_cls_score,
        "rpn_bbox_pred": rpn_bbox_pred,
        "rpn_cls_prob": rpn_prob_blocks,
    }

    if cfg.is_train and gt_boxes is not None:
        at = anchor_target_layer(r_at, anchors, gt_boxes, (H, W))
        out.update(
            rpn_labels=at.labels,
            rpn_bbox_targets=at.bbox_targets,
            rpn_bbox_inside_weights=at.bbox_inside_weights,
            rpn_bbox_outside_weights=at.bbox_outside_weights,
        )

    rois, scores = proposal_layer(
        rpn_prob_blocks[0], rpn_bbox_pred[0], anchors, (H, W), A,
        pre_nms_top_n=cfg.rpn_pre_nms_top_n,
        post_nms_top_n=cfg.rpn_post_nms_top_n,
        nms_thresh=cfg.rpn_nms_thresh,
    )
    out["rois_raw"] = rois
    out["rpn_scores"] = scores

    if cfg.is_train and gt_boxes is not None:
        pt = proposal_target_layer(
            r_pt, rois, scores, gt_boxes,
            gt_poses if gt_poses is not None else jnp.zeros((gt_boxes.shape[0], 13)),
            C, batch_size=cfg.roi_batch_size,
        )
        rois_target, labels = pt.rois, pt.labels
        out.update(
            labels=pt.labels,
            bbox_targets=pt.bbox_targets,
            bbox_inside_weights=pt.bbox_inside_weights,
            bbox_outside_weights=pt.bbox_outside_weights,
            poses_target=pt.poses_target,
            poses_weight=pt.poses_weight,
        )
    else:
        rois_target = rois
        out["poses_weight"] = jnp.ones((rois.shape[0], 4 * C))
    out["rois"] = rois_target

    # RCNN head: crop_pool expects (batch, cls, x1..y2) 7-col rois
    rois7 = jnp.concatenate(
        [rois_target[:, :1], jnp.zeros((rois_target.shape[0], 1)), rois_target[:, 1:5],
         jnp.zeros((rois_target.shape[0], 1))], axis=1,
    )
    pool5 = crop_pool_batched(net["conv5_3"], rois7[None], 1.0 / cfg.feature_stride, 7)[0]
    fc6 = L.fc(params["fc6"], pool5.reshape(pool5.shape[0], -1), relu=True, compute_dtype=dt)
    fc6 = L.dropout(r_d6, fc6, keep)
    fc7 = L.fc(params["fc7"], fc6, relu=True, compute_dtype=dt)
    fc7 = L.dropout(r_d7, fc7, keep)
    # relu=False: see the RPN-head note (reference fc default quirk)
    cls_score = L.fc(params["cls_score"], fc7, relu=False)
    out["cls_score"] = cls_score
    out["cls_prob"] = jax.nn.softmax(cls_score, axis=-1)
    out["bbox_pred"] = L.fc(params["bbox_pred"], fc7, relu=False)
    poses_tanh = jnp.tanh(L.fc(params["poses_pred_unnormalized"], fc7, relu=False))
    out["poses_tanh"] = poses_tanh
    out["poses_mul"] = poses_tanh * out["poses_weight"]
    out["poses_pred"] = L.l2_normalize(out["poses_mul"], axis=1)
    return out
