"""TPU-native reimplementations of the reference's custom CUDA ops."""

from posecnn_tpu.ops.add_loss import average_distance_loss
from posecnn_tpu.ops.bbox import bbox_overlaps, bbox_transform, bbox_transform_inv, clip_boxes
from posecnn_tpu.ops.gradient_reversal import gradient_reversal
from posecnn_tpu.ops.hard_label import hard_label
from posecnn_tpu.ops.hough_voting import HoughOutputs, hough_voting
from posecnn_tpu.ops.losses import (
    lifted_structured_loss,
    loss_cross_entropy_single_frame,
    loss_quaternion,
    smooth_l1_loss,
    smooth_l1_loss_vertex,
    sparse_softmax_cross_entropy,
    triplet_loss_embedding,
)
from posecnn_tpu.ops.nms import nms_jax, nms_np
from posecnn_tpu.ops.normals import backproject_depth, compute_normals
from posecnn_tpu.ops.roi_pool import crop_pool, roi_pool

__all__ = [
    "average_distance_loss",
    "bbox_overlaps",
    "bbox_transform",
    "bbox_transform_inv",
    "clip_boxes",
    "gradient_reversal",
    "hard_label",
    "HoughOutputs",
    "hough_voting",
    "lifted_structured_loss",
    "loss_cross_entropy_single_frame",
    "loss_quaternion",
    "smooth_l1_loss",
    "smooth_l1_loss_vertex",
    "sparse_softmax_cross_entropy",
    "triplet_loss_embedding",
    "nms_jax",
    "nms_np",
    "backproject_depth",
    "compute_normals",
    "crop_pool",
    "roi_pool",
]
