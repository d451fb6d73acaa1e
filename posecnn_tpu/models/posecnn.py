"""PoseCNN: VGG16-FCN with semantic-label, center-voting and pose heads.

Functional rewrite of the reference `vgg16_convs` network
(lib/networks/vgg16_convs.py:79-212):

  trunk conv1-conv5 (dual tower for RGBD) ->
    label branch : score_conv5/score_conv4 (num_units) -> x2 deconv -> add
                   -> dropout -> x8 deconv -> score (C) -> log-softmax 'prob',
                   softmax 'prob_normalized', argmax 'label_2d'
    vertex branch: 128-unit embeddings, same two-scale fusion -> 'vertex_pred'
                   with 3C channels (unit center direction + log z per class)
    hough voting : label_2d + vertex_pred -> rois + initial poses (+ targets)
    pose branch  : RoI max-pool conv5_3 (1/16) + conv4_3 (1/8) -> add ->
                   fc6 -> fc7 -> fc8 (4C) -> tanh -> mask by weight ->
                   L2-normalize per quaternion -> 'poses_pred'
    adaptation   : gradient reversal -> fc9 -> domain classifier (optional)

The network is a pure function of (params, inputs, rng); all shape switches
are static Python (jit-friendly). Hough voting runs inside the same jit graph
— the reference needed host round-trips there (.cu.cc:649-652,771-774).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from posecnn_tpu.models import layers as L
from posecnn_tpu.models.backbone import init_vgg_trunk, vgg_trunk
from posecnn_tpu.ops.hard_label import hard_label
from posecnn_tpu.ops.hough_voting import HoughOutputs, hough_voting
from posecnn_tpu.ops.gradient_reversal import gradient_reversal


@dataclass(frozen=True)
class PoseCNNConfig:
    num_classes: int = 22
    num_units: int = 64
    input_format: str = "COLOR"  # COLOR | RGBD | DEPTH | NORMAL
    vertex_reg: bool = True
    # VERTEX_REG_3D: the vertex head predicts extent-normalized 3D object
    # coordinates instead of center directions; hough voting and the
    # quaternion branch are skipped (the reference gates them under
    # VERTEX_REG_2D, vgg16_convs.py:103-176) — pose decoding happens via
    # depth RANSAC (engine/ransac.ransac_from_maps)
    vertex_reg_3d: bool = False
    pose_reg: bool = True
    adaptation: bool = False
    threshold_label: float = 1.0
    vote_threshold: float = -1.0
    vote_percentage: float = 0.02
    skip_pixels: int = 10
    is_train: bool = True
    keep_prob: float = 1.0
    compute_dtype: Any = jnp.bfloat16
    # fixed-shape hough parameters (TPU-specific)
    hough_class_slots: int = 8
    hough_max_samples: int = 1024
    hough_center_stride: int = 4
    hough_refine_window: int = 16
    # candidate-pixel grid stride inside hough voting (1 = reference
    # semantics; >1 = spatially uniform subsampling, use with skip_pixels=1)
    hough_pixel_stride: int = 1
    # "exact" = reference row-major compaction; "approx" = TPU-fast
    # approx_max_k class-pixel selection (see ops/hough_voting._slot_samples)
    hough_sampler: str = "exact"
    label_threshold: int = 500
    # isolation/debug mode: drive hough voting from the GT label map + GT
    # vertex targets instead of the predicted heads (training only; needs
    # gt_centers). Gives the quaternion branch perfect detections — used to
    # isolate whether the ADD loss path can learn rotation independent of
    # label/vertex head quality (round-2 verdict task 2a). No reference
    # counterpart.
    hough_from_gt: bool = False
    # mixed teacher forcing for the pose branch (training only): per image,
    # with this probability the hough inputs are the GT label map + GT vertex
    # targets instead of the predicted heads. The reference trains its pose
    # branch on hough boxes from predicted labels, which works there because
    # ImageNet-init segmentation is usable within ~1K iters; from scratch the
    # IoU>0.2 target gate zeroes nearly every pose ROI for the first tens of
    # thousands of iterations and the quaternion head starves (round-2
    # verdict: median rotation error 127 deg at 20K iters, while the
    # GT-hough isolation run reaches 2.7 deg in 2.5K). Mixing keeps a
    # clean, full-rate pose gradient from iter 0 while still exposing the
    # head to predicted-box statistics. 0.0 = reference behavior.
    hough_gt_mix: float = 0.0
    # use bilinear crop_pool instead of exact roi_pool (faster on TPU)
    use_crop_pool: bool = False
    adapt_lambda: float = 0.01
    # fc6/fc7 width (4096 in the reference, vgg16_convs.py:180-184);
    # reducible for tiny-shape dry runs / tests
    fc_dim: int = 4096
    # VGG trunk channel-width multiplier (1.0 = reference widths). <1 shrinks
    # every conv stage (min 8 channels) — used by the multichip dryrun and
    # CPU-mesh tests, where full 512-channel convs dominate both XLA-CPU
    # compile time and single-core execution time
    trunk_scale: float = 1.0


def init_posecnn_params(key: jax.Array, cfg: PoseCNNConfig) -> Dict:
    C, U = cfg.num_classes, cfg.num_units
    ks = iter(jax.random.split(key, 24))
    params: Dict[str, Any] = {}
    from posecnn_tpu.models.backbone import scaled_width

    params.update(init_vgg_trunk(next(ks), width_scale=cfg.trunk_scale))
    dual = cfg.input_format == "RGBD"
    if dual:
        params.update(init_vgg_trunk(next(ks), suffix="_p", width_scale=cfg.trunk_scale))
    c5w = scaled_width(512, cfg.trunk_scale)  # single-tower conv4/conv5 width
    c5 = 2 * c5w if dual else c5w

    params["score_conv5"] = L.init_conv(next(ks), 1, 1, c5, U)
    params["upscore_conv5"] = L.init_deconv(4, U)
    params["score_conv4"] = L.init_conv(next(ks), 1, 1, c5, U)
    params["upscore"] = L.init_deconv(16, U)
    params["score"] = L.init_conv(next(ks), 1, 1, U, C, stddev=0.01)

    if cfg.vertex_reg:
        params["score_conv5_vertex"] = L.init_conv(next(ks), 1, 1, c5w, 128)
        params["upscore_conv5_vertex"] = L.init_deconv(4, 128)
        params["score_conv4_vertex"] = L.init_conv(next(ks), 1, 1, c5w, 128)
        params["upscore_vertex"] = L.init_deconv(16, 128)
        params["vertex_pred"] = L.init_conv(next(ks), 1, 1, 128, 3 * C, stddev=0.001)
        if cfg.pose_reg:
            params["fc6"] = L.init_fc(next(ks), 7 * 7 * c5w, cfg.fc_dim)
            params["fc7"] = L.init_fc(next(ks), cfg.fc_dim, cfg.fc_dim)
            params["fc8"] = L.init_fc(next(ks), cfg.fc_dim, 4 * C, stddev=0.001)
            if cfg.adaptation:
                params["fc9"] = L.init_fc(next(ks), 7 * 7 * c5w, 256)
                params["domain_score"] = L.init_fc(next(ks), 256, 2, stddev=0.01)
    return params


def posecnn_forward(
    params: Dict,
    cfg: PoseCNNConfig,
    data: jnp.ndarray,
    extents: jnp.ndarray,
    meta_data: jnp.ndarray,
    gt_poses: Optional[jnp.ndarray] = None,
    gt_label_2d: Optional[jnp.ndarray] = None,
    data_p: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    gt_centers: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Run the full network; returns a dict of named endpoints.

    data: (B,H,W,3) mean-subtracted BGR; extents: (C,3); meta_data: (B,48);
    gt_poses: (G,13) zero-padded (training / target matching);
    gt_label_2d: (B,H,W) int32 (training).
    """
    C = cfg.num_classes
    dt = cfg.compute_dtype
    train = cfg.is_train
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r_drop, r_dropv, r_d6, r_d7, r_d9 = jax.random.split(rng, 5)
    keep = cfg.keep_prob if train else 1.0

    net = vgg_trunk(params, data, compute_dtype=dt)
    if cfg.input_format == "RGBD":
        assert data_p is not None
        net_p = vgg_trunk(params, data_p, suffix="_p", compute_dtype=dt)
        conv5 = jnp.concatenate([net["conv5_3"], net_p["conv5_3_p"]], axis=-1)
        conv4 = jnp.concatenate([net["conv4_3"], net_p["conv4_3_p"]], axis=-1)
    else:
        conv5 = net["conv5_3"]
        conv4 = net["conv4_3"]
    out: Dict[str, jnp.ndarray] = {"conv4_3": net["conv4_3"], "conv5_3": net["conv5_3"]}

    # ---- semantic labeling branch
    score_conv5 = L.conv2d(params["score_conv5"], conv5, relu=True, compute_dtype=dt)
    upscore_conv5 = L.deconv(params["upscore_conv5"], score_conv5, stride=2)
    score_conv4 = L.conv2d(params["score_conv4"], conv4, relu=True, compute_dtype=dt)
    add_score = score_conv4 + upscore_conv5
    add_score = L.dropout(r_drop, add_score, keep)
    # 1x1 score conv applied at 1/8 res, then x8 upsample (exact commute —
    # see conv1x1_upsample; the reference order is deconv-then-conv,
    # vgg16_convs.py:92-95)
    score = L.conv1x1_upsample(
        params["score"], params["upscore"], add_score, stride=8, relu=True, compute_dtype=dt
    )
    out["score"] = score
    out["prob"] = L.log_softmax_hd(score)
    prob_normalized = L.softmax_hd(score)
    out["prob_normalized"] = prob_normalized
    label_2d = L.argmax_2d(prob_normalized)
    out["label_2d"] = label_2d

    if gt_label_2d is not None:
        out["gt_label_weight"] = hard_label(prob_normalized, gt_label_2d, cfg.threshold_label)

    if not cfg.vertex_reg:
        return out

    # ---- vertex (center direction + log depth) branch
    sc5v = L.conv2d(params["score_conv5_vertex"], net["conv5_3"], relu=False, compute_dtype=dt)
    up5v = L.deconv(params["upscore_conv5_vertex"], sc5v, stride=2)
    sc4v = L.conv2d(params["score_conv4_vertex"], net["conv4_3"], relu=False, compute_dtype=dt)
    addv = sc4v + up5v
    addv = L.dropout(r_dropv, addv, keep)
    vertex_pred = L.conv1x1_upsample(
        params["vertex_pred"], params["upscore_vertex"], addv, stride=8, relu=False,
        compute_dtype=dt,
    )
    out["vertex_pred"] = vertex_pred

    if cfg.vertex_reg_3d:
        # 3D object-coordinate mode: no hough voting / quaternion branch
        return out

    # ---- hough voting (in-graph; zero gradients)
    if gt_poses is None:
        gt_poses = jnp.zeros((1, 13), jnp.float32)
    hough_label, hough_vert = label_2d, vertex_pred
    if cfg.hough_from_gt:
        assert gt_label_2d is not None and gt_centers is not None, (
            "hough_from_gt needs gt_label_2d and gt_centers"
        )
        from posecnn_tpu.ops.vertex_targets import vertex_targets_device

        gt_vt, _ = vertex_targets_device(gt_label_2d, gt_centers, C)
        hough_label, hough_vert = gt_label_2d, gt_vt
    elif train and cfg.hough_gt_mix > 0.0:
        assert gt_label_2d is not None and gt_centers is not None, (
            "hough_gt_mix needs gt_label_2d and gt_centers"
        )
        from posecnn_tpu.ops.vertex_targets import vertex_targets_device

        gt_vt, _ = vertex_targets_device(gt_label_2d, gt_centers, C)
        r_mix = jax.random.fold_in(rng, 0x6D69)  # leave the dropout stream intact
        pick_gt = jax.random.bernoulli(
            r_mix, cfg.hough_gt_mix, (gt_label_2d.shape[0],)
        )
        hough_label = jnp.where(pick_gt[:, None, None], gt_label_2d, label_2d)
        hough_vert = jnp.where(
            pick_gt[:, None, None, None], gt_vt, vertex_pred.astype(jnp.float32)
        )
    if cfg.vote_threshold > 0:
        # multi-instance local-max mode (VOTING_THRESHOLD > 0 configs)
        from posecnn_tpu.ops.hough_voting import hough_voting_multi

        hough: HoughOutputs = hough_voting_multi(
            hough_label,
            hough_vert.astype(jnp.float32),
            extents,
            meta_data,
            gt_poses,
            num_classes=C,
            is_train=train,
            voting_threshold=cfg.vote_threshold,
            per_threshold=cfg.vote_percentage,
            skip_pixels=cfg.skip_pixels,
            label_threshold=cfg.label_threshold,
            class_slots=cfg.hough_class_slots,
            max_samples=cfg.hough_max_samples,
            pixel_grid_stride=cfg.hough_pixel_stride,
            sampler=cfg.hough_sampler,
        )
    else:
        hough = hough_voting(
            hough_label,
            hough_vert.astype(jnp.float32),
            extents,
            meta_data,
            gt_poses,
            num_classes=C,
            is_train=train,
            skip_pixels=cfg.skip_pixels,
            voting_threshold=cfg.vote_threshold,
            per_threshold=cfg.vote_percentage,
            label_threshold=cfg.label_threshold,
            class_slots=cfg.hough_class_slots,
            max_samples=cfg.hough_max_samples,
            center_stride=cfg.hough_center_stride,
            refine_window=cfg.hough_refine_window,
            pixel_grid_stride=cfg.hough_pixel_stride,
            sampler=cfg.hough_sampler,
        )
    out["rois"] = hough.rois
    out["poses_init"] = hough.poses_init
    out["poses_target"] = hough.poses_target
    out["poses_weight"] = hough.poses_weight
    out["rois_valid"] = hough.valid
    out["num_rois"] = hough.num_rois
    if cfg.adaptation:
        out["label_domain"] = hough.domains

    if not cfg.pose_reg:
        return out

    # ---- quaternion regression branch
    # hough rows have (batch, slot, jitter) layout, so they reshape to a
    # batch-aligned (B, D, 7) block: each device pools only its own image
    # under the data-sharded mesh (no cross-device gathers)
    B = data.shape[0]
    R = hough.rois.shape[0]
    rois_b = hough.rois.reshape(B, R // B, 7)
    # pool in the compute dtype: the pooled features feed bf16 FCs anyway,
    # and max/lerp in bf16 halves the full-map masked-max bandwidth
    c5 = net["conv5_3"].astype(dt)
    c4 = net["conv4_3"].astype(dt)
    if cfg.use_crop_pool:
        from posecnn_tpu.ops.roi_pool import crop_pool_batched

        pool5 = crop_pool_batched(c5, rois_b, spatial_scale=1.0 / 16.0, pool_size=7)
        pool4 = crop_pool_batched(c4, rois_b, spatial_scale=1.0 / 8.0, pool_size=7)
    else:
        from posecnn_tpu.ops.roi_pool import roi_pool_batched

        pool5 = roi_pool_batched(c5, rois_b, 7, 1.0 / 16.0)
        pool4 = roi_pool_batched(c4, rois_b, 7, 1.0 / 8.0)
    pool_score = (pool5 + pool4).reshape(R, 7, 7, -1)
    fc6 = L.fc(params["fc6"], pool_score, relu=True, compute_dtype=dt)
    fc6 = L.dropout(r_d6, fc6, keep)
    fc7 = L.fc(params["fc7"], fc6, relu=True, compute_dtype=dt)
    fc7 = L.dropout(r_d7, fc7, keep)
    fc8 = L.fc(params["fc8"], fc7, relu=False, compute_dtype=dt)
    poses_tanh = jnp.tanh(fc8)
    poses_mul = poses_tanh * hough.poses_weight
    # per-quaternion L2 normalization: tf.nn.l2_normalize(dim=1) normalizes the
    # whole 4C row in the reference graph (vgg16_convs.py:196-197)
    poses_pred = L.l2_normalize(poses_mul, axis=1)
    out["poses_tanh"] = poses_tanh
    out["poses_mul"] = poses_mul
    out["poses_pred"] = poses_pred

    if cfg.adaptation:
        rev = gradient_reversal(pool_score, cfg.adapt_lambda)
        fc9 = L.fc(params["fc9"], rev, relu=True, compute_dtype=dt)
        fc9 = L.dropout(r_d9, fc9, keep)
        # relu=False: the reference fc default (relu=True, network.py:393)
        # ReLU'd the 2-way domain logits, zeroing the adversarial gradient
        # whenever both pre-activations go negative; training-only head, so
        # nothing checkpoint-parity-relevant pins the quirk
        domain_score = L.fc(params["domain_score"], fc9, relu=False)
        out["domain_score"] = domain_score
        out["domain_prob"] = jax.nn.softmax(domain_score, axis=-1)
        out["domain_label"] = jnp.argmax(domain_score, axis=-1).astype(jnp.int32)

    return out
