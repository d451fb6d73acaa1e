"""vgg16_full: dense FCN variant fusing all five conv scales.

Rewrite of lib/networks/vgg16_full.py:72-232 — skip connections merge
conv5..conv1 with x2 bilinear deconvs at every stage for both the label and
the vertex branches; hard_label threshold is fixed at 0.7; the pose branch
uses the bilinear crop_pool (crop_pool_new) instead of exact roi_pool.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from posecnn_tpu.models import layers as L
from posecnn_tpu.models.backbone import init_vgg_trunk, vgg_trunk
from posecnn_tpu.models.posecnn import PoseCNNConfig
from posecnn_tpu.ops.hard_label import hard_label
from posecnn_tpu.ops.hough_voting import hough_voting
from posecnn_tpu.ops.roi_pool import crop_pool_batched

_SCALES = [
    ("score_conv5", "conv5_3", 512),
    ("score_conv4", "conv4_3", 512),
    ("score_conv3", "conv3_3", 256),
    ("score_conv2", "conv2_2", 128),
    ("score_conv1", "conv1_2", 64),
]


def init_posecnn_full_params(key: jax.Array, cfg: PoseCNNConfig) -> Dict:
    from posecnn_tpu.models.backbone import scaled_width

    C, U = cfg.num_classes, cfg.num_units
    ks = iter(jax.random.split(key, 32))
    params: Dict[str, Any] = {}
    params.update(init_vgg_trunk(next(ks), width_scale=cfg.trunk_scale))
    for name, _, c_i in _SCALES:
        params[name] = L.init_conv(next(ks), 1, 1, scaled_width(c_i, cfg.trunk_scale), U)
    for lvl in ("5", "4", "3", "2"):
        params[f"upscore_conv{lvl}"] = L.init_deconv(4, U)
    params["score"] = L.init_conv(next(ks), 1, 1, U, C, stddev=0.01)
    if cfg.vertex_reg:
        for name, _, c_i in _SCALES:
            params[name + "_vertex"] = L.init_conv(
                next(ks), 1, 1, scaled_width(c_i, cfg.trunk_scale), U
            )
        for lvl in ("5", "4", "3", "2"):
            params[f"upscore_conv{lvl}_vertex"] = L.init_deconv(4, U)
        params["vertex_pred"] = L.init_conv(next(ks), 1, 1, U, 3 * C, stddev=0.001)
        if cfg.pose_reg:
            c5w = scaled_width(512, cfg.trunk_scale)
            params["fc6"] = L.init_fc(next(ks), 7 * 7 * c5w, cfg.fc_dim)
            params["fc7"] = L.init_fc(next(ks), cfg.fc_dim, cfg.fc_dim)
            params["poses_pred_unnormalized"] = L.init_fc(
                next(ks), cfg.fc_dim, 4 * C, stddev=0.001
            )
    return params


def _fuse_scales(params, net, suffix, dt, rng, keep):
    h = None
    for i, (name, endpoint, _) in enumerate(_SCALES):
        s = L.conv2d(params[name + suffix], net[endpoint], relu=True, compute_dtype=dt)
        if h is None:
            h = s
        else:
            h = s + h
        if i < len(_SCALES) - 1:
            lvl = name[-1]
            h = L.deconv(params[f"upscore_conv{lvl}{suffix}"], h, stride=2)
    return L.dropout(rng, h, keep)


def posecnn_full_forward(
    params: Dict,
    cfg: PoseCNNConfig,
    data: jnp.ndarray,
    extents: jnp.ndarray,
    meta_data: jnp.ndarray,
    gt_poses: Optional[jnp.ndarray] = None,
    gt_label_2d: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
) -> Dict[str, jnp.ndarray]:
    C = cfg.num_classes
    dt = cfg.compute_dtype
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r1, r2 = jax.random.split(rng)
    keep = cfg.keep_prob if cfg.is_train else 1.0

    net = vgg_trunk(params, data, compute_dtype=dt)
    out: Dict[str, jnp.ndarray] = {}

    fused = _fuse_scales(params, net, "", dt, r1, keep)
    score = L.conv2d(params["score"], fused, relu=True, compute_dtype=dt)
    out["score"] = score
    out["prob"] = L.log_softmax_hd(score)
    prob_normalized = L.softmax_hd(score)
    out["prob_normalized"] = prob_normalized
    out["label_2d"] = L.argmax_2d(prob_normalized)
    if gt_label_2d is not None:
        # vgg16_full hard-codes threshold=0.7 (vgg16_full.py:131)
        out["gt_label_weight"] = hard_label(prob_normalized, gt_label_2d, 0.7)

    if not cfg.vertex_reg:
        return out

    fused_v = _fuse_scales(params, net, "_vertex", dt, r2, keep)
    vertex_pred = L.conv2d(params["vertex_pred"], fused_v, relu=False, compute_dtype=dt)
    out["vertex_pred"] = vertex_pred

    if gt_poses is None:
        gt_poses = jnp.zeros((1, 13), jnp.float32)
    hough = hough_voting(
        out["label_2d"], vertex_pred.astype(jnp.float32), extents, meta_data, gt_poses,
        num_classes=C, is_train=cfg.is_train, skip_pixels=cfg.skip_pixels,
        label_threshold=cfg.label_threshold, class_slots=cfg.hough_class_slots,
        max_samples=cfg.hough_max_samples, center_stride=cfg.hough_center_stride,
        refine_window=cfg.hough_refine_window, pixel_grid_stride=cfg.hough_pixel_stride,
        sampler=cfg.hough_sampler,
    )
    out.update(
        rois=hough.rois, poses_init=hough.poses_init, poses_target=hough.poses_target,
        poses_weight=hough.poses_weight, rois_valid=hough.valid, num_rois=hough.num_rois,
    )
    if not cfg.pose_reg:
        return out

    B = data.shape[0]
    R = hough.rois.shape[0]
    rois_b = hough.rois.reshape(B, R // B, 7)
    pool5 = crop_pool_batched(net["conv5_3"], rois_b, 1.0 / 16.0, 7)
    pool4 = crop_pool_batched(net["conv4_3"], rois_b, 1.0 / 8.0, 7)
    fc6 = L.fc(params["fc6"], (pool4 + pool5).reshape(R, 7, 7, -1), relu=True, compute_dtype=dt)
    fc7 = L.fc(params["fc7"], fc6, relu=True, compute_dtype=dt)
    fc8 = L.fc(params["poses_pred_unnormalized"], fc7, relu=False, compute_dtype=dt)
    poses_tanh = jnp.tanh(fc8)
    out["poses_tanh"] = poses_tanh
    out["poses_mul"] = poses_tanh * hough.poses_weight
    out["poses_pred"] = L.l2_normalize(out["poses_mul"], axis=1)
    return out
