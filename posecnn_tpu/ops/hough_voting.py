"""Hough center voting: TPU-native, fixed-shape rewrite of the reference CUDA op
(`lib/hough_voting_gpu_layer/hough_voting_gpu_op.cu.cc`).

Semantics reproduced (per batch image):
  1. classes with more than `label_threshold` labeled pixels are "active"
     (`hough_voting_gpu_op.cc:357`, host round-trip in the reference — here a
     fixed number of class *slots* filled in ascending class order);
  2. class pixels are subsampled with stride `skip_pixels`
     (`vgg16_convs.py:22`; the CUDA pixel list order is nondeterministic
     atomicAdd order — here deterministic row-major order) and capped at
     `max_samples`;
  3. every center x every sampled pixel votes if the predicted unit direction
     points at the center within `inlier_threshold` cosine (`.cu.cc:32-42`)
     and the center is inside a box projected from the class 3D extent at the
     pixel's predicted depth (`project_box`, `.cu.cc:84-120`, factor 0.6);
  4. `voting_threshold < 0` (the reference default): one detection per active
     class at the vote argmax (`thrust::max_element`, `.cu.cc:744-762`);
     otherwise local maxima above the threshold with a vote-percentage test
     (`compute_max_indexes_kernel`, `.cu.cc:335-383`);
  5. a second pass measures the inlier bounding box at the winning center
     using the mean voted depth (`.cu.cc:296-326`);
  6. detections emit ROIs (batch,cls,x1,y1,x2,y2,score), initial poses
     (unit quaternion + (rx·z, ry·z, z)), and — in training — GT quaternion
     targets matched by projected-box IoU > 0.2 plus 8 jittered copies of
     each box (`compute_rois_kernel`, `.cu.cc:386-576`).

TPU design notes:
  * everything is static-shape: S class slots, P pixel samples, fixed
    detection rows, zero-padded with a validity mask (the CUDA version used
    host mallocs + dynamic shapes + `MAX_ROI=128`);
  * the O(centers x pixels) vote accumulation is a chunked broadcast-reduce
    (VPU) over a center grid of stride `center_stride`, followed by an exact
    full-resolution refinement window around the coarse argmax
    (`center_stride=1` reproduces reference numerics exactly);
  * gradients are zero for all inputs, like the reference (`.cc:54-60`).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from posecnn_tpu.utils.quaternion import quat2mat

# NumPy (not jnp) on purpose: a module-level jnp.array commits the default
# backend at import time, before CLIs can select a device — observed as the
# online CLI hanging on an unreachable TPU tunnel despite --device cpu.
# jnp ops auto-convert these at trace time.
import numpy as _np

_CORNER_SIGNS = _np.array(
    [
        [1, 1, 1], [-1, 1, 1], [1, -1, 1], [-1, -1, 1],
        [1, 1, -1], [-1, 1, -1], [1, -1, -1], [-1, -1, -1],
    ],
    dtype=_np.float32,
)

# jitter offsets, reference order (.cu.cc:470-576): (-1,-1),(1,-1),(-1,1),(1,1),
# (0,-1),(-1,0),(0,1),(1,0); row 0 is the unjittered box
_JITTER = _np.array(
    [[0, 0], [-1, -1], [1, -1], [-1, 1], [1, 1], [0, -1], [-1, 0], [0, 1], [1, 0]],
    dtype=_np.float32,
)


class HoughOutputs(NamedTuple):
    rois: jnp.ndarray          # (R, 7) batch, cls, x1, y1, x2, y2, score
    poses_init: jnp.ndarray    # (R, 7) w,x,y,z, tx, ty, tz
    poses_target: jnp.ndarray  # (R, 4C)
    poses_weight: jnp.ndarray  # (R, 4C)
    domains: jnp.ndarray       # (R,) int32
    valid: jnp.ndarray         # (R,) bool
    num_rois: jnp.ndarray      # () int32


def _project_box_threshold(extent, fx, fy, px, py, distance, factor=0.6):
    """Max projected extent-box dimension at given distance(s). (.cu.cc:84-120)

    extent: (3,); distance: (...,) -> threshold: (...,)
    """
    half = extent * 0.5  # (3,)
    cx = _CORNER_SIGNS * half  # (8,3)
    X, Y, Z0 = cx[:, 0], cx[:, 1], cx[:, 2]
    Z = Z0 + distance[..., None]  # (...,8)
    x = fx * (X / Z) + px
    y = fy * (Y / Z) + py
    width = jnp.max(x, axis=-1) - jnp.min(x, axis=-1) + 1
    height = jnp.max(y, axis=-1) - jnp.min(y, axis=-1) + 1
    return jnp.maximum(width, height) * factor


def _sample_class_pixels(label_flat, cls, skip_pixels, max_samples, slot_valid, pixel_index=None):
    """Deterministic fixed-size subsample of one class's pixels.

    Returns (indices (P,), valid (P,)) — every `skip_pixels`-th pixel of the
    class in row-major order, padded to P = max_samples. `pixel_index` maps
    candidate positions to flat pixel indices (identity if None) — used by
    the strided-grid fast path where `label_flat` is already subsampled.
    """
    hw = label_flat.shape[0]
    if pixel_index is None:
        pixel_index = jnp.arange(hw, dtype=jnp.int32)
    m = (label_flat == cls) & slot_valid
    rank = jnp.cumsum(m) - 1
    take = m & (rank % skip_pixels == 0)
    srank = jnp.cumsum(take) - 1
    keep = take & (srank < max_samples)
    dest = jnp.where(keep, srank, max_samples)
    samp = jnp.zeros((max_samples + 1,), dtype=jnp.int32).at[dest].set(
        pixel_index, mode="drop"
    )
    n_kept = jnp.sum(keep)
    return samp[:max_samples], jnp.arange(max_samples) < n_kept


def _slot_samples(
    lab_cand, cls, ok, vert, extent, cand_index, W, P, skip_pixels, fx, fy, px_, py_, sampler
):
    """Select up to P sample pixels of class `cls` and gather their vote data.

    sampler="exact": the reference's every-skip_pixels-th class pixel in
    row-major order (stream compaction: cumsum + scatter).
    sampler="approx": `jax.lax.approx_max_k` over the 0/1 class mask — a
    hardware-accelerated tiled reduction (the compaction scatter is ~2.3 ms
    per 640x480 frame on TPU, the hottest op of the inference graph). All
    class pixels share key 1.0, so any k of them form a valid top-k; the
    tiling spreads picks across the image like the reference's spatial
    subsample. skip_pixels is ignored in this mode.
    """
    if sampler == "approx":
        keep = ((lab_cand == cls) & ok).astype(jnp.float32)
        # approx_max_k requires k < reduction size; small frames (toy/LINEMOD
        # crops) can have fewer candidates than P — clamp and pad invalid
        k = min(P, int(keep.shape[-1]))
        vals, idx_c = jax.lax.approx_max_k(keep, k)
        if k < P:
            vals = jnp.pad(vals, (0, P - k), constant_values=0.0)
            idx_c = jnp.pad(idx_c, (0, P - k), constant_values=0)
        svalid = vals > 0.5
        idx = cand_index[idx_c] if cand_index is not None else idx_c
    else:
        idx, svalid = _sample_class_pixels(
            lab_cand, cls, skip_pixels, P, ok, pixel_index=cand_index
        )
    x = (idx % W).astype(jnp.float32)
    y = (idx // W).astype(jnp.float32)
    u = jnp.where(svalid, vert[idx, 3 * cls + 0], 0.0)
    v = jnp.where(svalid, vert[idx, 3 * cls + 1], 0.0)
    # sanitize padded rows: exp of garbage could be inf -> 0*inf = NaN
    d = jnp.where(svalid, jnp.exp(vert[idx, 3 * cls + 2]), 0.0)
    thr = _project_box_threshold(extent, fx, fy, px_, py_, d)
    return x, y, u, v, d, thr, svalid


def _vote_terms(cx, cy, x, y, u, v, thr, valid, inlier_threshold):
    """Inlier mask for centers (broadcast) x samples.

    cx/cy broadcast against per-sample x,y,u,v,thr (sample axis first).
    Implements angle_distance > thr as dot > thr*|u||c-p|, evaluated
    sqrt-free as dot > 0 and dot^2 > thr^2*|u|^2*|c-p|^2 (no division; the
    CUDA NaN-compare at c==p is 'false' either way).
    """
    dx = cx - x
    dy = cy - y
    dot = u * dx + v * dy
    n1sq = u * u + v * v
    n2sq = dx * dx + dy * dy
    inlier = (dot > 0.0) & (dot * dot > (inlier_threshold * inlier_threshold) * n1sq * n2sq)
    boxed = (jnp.abs(dx) < thr) & (jnp.abs(dy) < thr)
    return inlier & boxed & valid


def _accumulate_votes(sx, sy, su, sv, sd, sthr, svalid, cxs, cys, inlier_threshold, chunk):
    """Chunked broadcast-reduce of votes/depth-sums over a center grid.

    sx..svalid: (P,) sample data; cxs: (Gw,), cys: (Gh,).
    Returns votes (Gh,Gw) f32 and dsum (Gh,Gw) f32.
    """
    P = sx.shape[0]
    gh, gw = cys.shape[0], cxs.shape[0]
    n_chunks = P // chunk
    data = (
        sx.reshape(n_chunks, chunk), sy.reshape(n_chunks, chunk),
        su.reshape(n_chunks, chunk), sv.reshape(n_chunks, chunk),
        sd.reshape(n_chunks, chunk), sthr.reshape(n_chunks, chunk),
        svalid.reshape(n_chunks, chunk),
    )

    def body(carry, xs):
        votes, dsum = carry
        x, y, u, v, d, thr, val = xs
        ok = _vote_terms(
            cxs[None, None, :], cys[None, :, None],
            x[:, None, None], y[:, None, None],
            u[:, None, None], v[:, None, None],
            thr[:, None, None], val[:, None, None],
            inlier_threshold,
        )
        okf = ok.astype(jnp.float32)
        votes = votes + jnp.sum(okf, axis=0)
        dsum = dsum + jnp.sum(okf * d[:, None, None], axis=0)
        return (votes, dsum), None

    init = (jnp.zeros((gh, gw), jnp.float32), jnp.zeros((gh, gw), jnp.float32))
    (votes, dsum), _ = jax.lax.scan(body, init, data)
    return votes, dsum


def _iou(box_a, box_b):
    """(.cu.cc:72-82) — scalar/broadcast IoU with +1 convention."""
    left = jnp.maximum(box_a[..., 0], box_b[..., 0])
    right = jnp.minimum(box_a[..., 2], box_b[..., 2])
    top = jnp.maximum(box_a[..., 1], box_b[..., 1])
    bottom = jnp.minimum(box_a[..., 3], box_b[..., 3])
    w = jnp.maximum(right - left + 1, 0.0)
    h = jnp.maximum(bottom - top + 1, 0.0)
    inter = w * h
    sa = (box_a[..., 2] - box_a[..., 0] + 1) * (box_a[..., 3] - box_a[..., 1] + 1)
    sb = (box_b[..., 2] - box_b[..., 0] + 1) * (box_b[..., 3] - box_b[..., 1] + 1)
    return inter / (sa + sb - inter)


def _project_gt_box(extent, quat, trans, fx, fy, px, py):
    """Project the GT-pose extent box to 2D (.cu.cc:124-172)."""
    half = extent * 0.5
    corners = _CORNER_SIGNS * half  # (8,3)
    R = quat2mat(quat)
    pc = corners @ R.T + trans  # (8,3)
    x = fx * pc[:, 0] / pc[:, 2] + px
    y = fy * pc[:, 1] / pc[:, 2] + py
    return jnp.stack([jnp.min(x), jnp.min(y), jnp.max(x), jnp.max(y)])


def hough_voting(
    label: jnp.ndarray,
    vertex_pred: jnp.ndarray,
    extents: jnp.ndarray,
    meta_data: jnp.ndarray,
    gt_poses: jnp.ndarray,
    *,
    num_classes: int,
    is_train: bool,
    skip_pixels: int = 10,
    inlier_threshold: float = 0.9,
    label_threshold: int = 500,
    voting_threshold: float = -1.0,
    per_threshold: float = 0.02,
    class_slots: int = 8,
    max_samples: int = 1024,
    center_stride: int = 4,
    refine_window: int = 16,
    sample_chunk: int = 128,
    pixel_grid_stride: int = 1,
    use_pallas: Optional[bool] = None,
    sampler: str = "exact",
) -> HoughOutputs:
    """Fixed-shape Hough voting.

    label: (B,H,W) int32; vertex_pred: (B,H,W,3C); extents: (C,3);
    meta_data: (B,48) (only fx=meta[0], px=meta[2], fy=meta[4], py=meta[5]
    are read, like the reference); gt_poses: (G,13) zero-padded
    (rows with cls<=0 are ignored).

    Only the `voting_threshold < 0` per-class-argmax mode is implemented here
    (the reference default for both training and testing — VOTING_THRESHOLD
    defaults to -1, lib/fcn/config.py:67,216); the multi-instance local-max
    mode lives in `hough_voting_multi` (same file, stride-1 only).
    """
    B, H, W = label.shape
    C = num_classes
    S = class_slots
    P = max_samples
    J = 9 if is_train else 1
    sample_chunk = min(sample_chunk, P)
    assert P % sample_chunk == 0, f"max_samples {P} not divisible by chunk {sample_chunk}"
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    label_flat = label.reshape(B, H * W)
    vert_flat = vertex_pred.reshape(B, H * W, 3 * C)
    gt_cls = gt_poses[:, 1]
    gt_batch = gt_poses[:, 0]
    gt_any = jnp.any(gt_cls > 0)

    # coarse center grid
    gxs = jnp.arange(0, W, center_stride, dtype=jnp.float32)
    gys = jnp.arange(0, H, center_stride, dtype=jnp.float32)

    # strided-grid candidate subsampling (TPU fast path): compaction runs a
    # scatter whose cost scales with the candidate count — on a g-strided
    # pixel grid it shrinks g^2-fold. g=1 reproduces reference semantics
    # (row-major every-skip_pixels-th class pixel); g>1 replaces the pixel
    # skip with a spatially uniform grid (set skip_pixels=1 alongside).
    g = pixel_grid_stride
    if g > 1:
        grid_rows = jnp.arange(0, H, g)
        grid_cols = jnp.arange(0, W, g)
        cand_index = (grid_rows[:, None] * W + grid_cols[None, :]).reshape(-1).astype(jnp.int32)
    else:
        cand_index = None

    def one_image(lab, vert, meta, b_idx):
        fx, px_, fy, py_ = meta[0], meta[2], meta[4], meta[5]

        # class histogram as a compare-reduce, not a scatter-add (a 307k-
        # element scatter costs ~6 ms on TPU; this is a fused VPU reduce)
        counts = jnp.sum(
            (lab[None, :] == jnp.arange(C, dtype=lab.dtype)[:, None]).astype(jnp.int32), axis=1
        )
        active = (counts > label_threshold) & (jnp.arange(C) > 0)
        order = jnp.sort(jnp.where(active, jnp.arange(C), C))
        if S > C:  # more slots than classes: pad with the invalid marker C
            order = jnp.pad(order, (0, S - C), constant_values=C)
        slot_cls = order[:S]
        slot_valid = slot_cls < C
        slot_cls_safe = jnp.where(slot_valid, slot_cls, 0)

        lab_cand = lab[cand_index] if cand_index is not None else lab

        def per_slot(cls, ok):
            return _slot_samples(
                lab_cand, cls, ok, vert, extents[cls], cand_index, W, P,
                skip_pixels, fx, fy, px_, py_, sampler,
            )

        sx, sy, su, sv, sd, sthr, svalid = jax.vmap(per_slot)(slot_cls_safe, slot_valid)

        gw = gxs.shape[0]
        gh = gys.shape[0]
        if use_pallas:
            from posecnn_tpu.ops.pallas.voting import accumulate_votes_slots

            tsq = (inlier_threshold * inlier_threshold) * (su * su + sv * sv)
            packed = jnp.stack(
                [sx, sy, su, sv, sd, sthr, tsq, svalid.astype(jnp.float32)], axis=1
            )  # (S, 8, P)
            cx_grid = jnp.tile(gxs, gh)
            cy_grid = jnp.repeat(gys, gw)
            centers = jnp.stack([cx_grid, cy_grid], axis=0)  # (2, Gh*Gw)
            flat, dflat = accumulate_votes_slots(packed, centers)
            dsum = dflat.reshape(S, gh, gw)
        else:

            def slot_votes(args):
                x, y, u, v, d, thr, val = args
                return _accumulate_votes(
                    x, y, u, v, d, thr, val, gxs, gys, inlier_threshold, sample_chunk
                )

            votes, dsum = jax.lax.map(slot_votes, (sx, sy, su, sv, sd, sthr, svalid))
            # (S, Gh, Gw)
            flat = votes.reshape(S, -1)

        # per-slot coarse argmax (thrust::max_element — first max wins)
        best = jnp.argmax(flat, axis=1)
        bx = gxs[best % gw]
        by = gys[best // gw]

        if center_stride > 1:
            # exact full-res refinement around the coarse argmax
            RW = refine_window
            x0 = jnp.clip(bx - (RW - center_stride) // 2, 0, W - RW)
            y0 = jnp.clip(by - (RW - center_stride) // 2, 0, H - RW)
            off = jnp.arange(RW, dtype=jnp.float32)

            def refine(args):
                x, y, u, v, d, thr, val, rx0, ry0 = args
                cxs = rx0 + off
                cys = ry0 + off
                v2, d2 = _accumulate_votes(
                    x, y, u, v, d, thr, val, cxs, cys, inlier_threshold, sample_chunk
                )
                f = v2.reshape(-1)
                j = jnp.argmax(f)
                return cxs[j % RW], cys[j // RW], f[j], d2.reshape(-1)[j]

            # vmap, not lax.map: the window is tiny (S x RW^2 x P) and a
            # sequential scan over slots costs S kernel launches
            cx, cy, vbest, dbest = jax.vmap(refine)(
                (sx, sy, su, sv, sd, sthr, svalid, x0, y0)
            )
        else:
            cx, cy = bx, by
            vbest = flat[jnp.arange(S), best]
            dbest = dsum.reshape(S, -1)[jnp.arange(S), best]

        dist = jnp.where(vbest > 0, dbest / jnp.maximum(vbest, 1.0), 0.0)

        # second pass: inlier bbox at the winning center with mean distance
        def slot_bb(args):
            x, y, u, v, thr_mean, val, ccx, ccy = args
            dx = x - ccx
            dy = y - ccy
            dot = u * (ccx - x) + v * (ccy - y)
            n1sq = u * u + v * v
            n2sq = dx * dx + dy * dy
            inl = (dot > 0.0) & (
                dot * dot > (inlier_threshold * inlier_threshold) * n1sq * n2sq
            )
            okb = (jnp.abs(dx) < thr_mean) & (jnp.abs(dy) < thr_mean) & inl & val
            bw = jnp.max(jnp.where(okb, jnp.abs(dx), -1.0))
            bh = jnp.max(jnp.where(okb, jnp.abs(dy), -1.0))
            return bw, bh

        thr_mean = jax.vmap(
            lambda c, d: _project_box_threshold(extents[c], fx, fy, px_, py_, d[None])[0]
        )(slot_cls_safe, dist)
        bw, bh = jax.vmap(slot_bb)(
            (sx, sy, su, sv, thr_mean[:, None] * jnp.ones_like(sx), svalid, cx, cy)
        )
        bb_width = jnp.where(vbest > 0, 2.0 * bw, 0.0)
        bb_height = jnp.where(vbest > 0, 2.0 * bh, 0.0)

        # detection outputs (.cu.cc:386-444)
        scale = 0.05
        rx = (cx - px_) / fx
        ry = (cy - py_) / fy
        box = jnp.stack(
            [
                cx - bb_width * (0.5 + scale),
                cy - bb_height * (0.5 + scale),
                cx + bb_width * (0.5 + scale),
                cy + bb_height * (0.5 + scale),
            ],
            axis=1,
        )  # (S,4)
        pose = jnp.stack(
            [
                jnp.ones_like(dist), jnp.zeros_like(dist), jnp.zeros_like(dist),
                jnp.zeros_like(dist), rx * dist, ry * dist, dist,
            ],
            axis=1,
        )  # (S,7)

        # GT quaternion targets by projected-box IoU > 0.2 (first match wins)
        def slot_target(cls, det_box, ok):
            def gt_box(g):
                return _project_gt_box(
                    extents[jnp.clip(g[1].astype(jnp.int32), 0, C - 1)],
                    g[6:10], g[10:13], fx, fy, px_, py_,
                )

            boxes_gt = jax.vmap(gt_box)(gt_poses)  # (G,4)
            ious = _iou(det_box[None, :], boxes_gt)
            match = (
                (gt_cls.astype(jnp.int32) == cls)
                & (gt_batch.astype(jnp.int32) == b_idx)
                & (gt_cls > 0)
                & (ious > 0.2)
            )
            found = jnp.any(match)
            first = jnp.argmax(match)
            quat = gt_poses[first, 6:10] * found
            tgt = jnp.zeros((4 * C,)).at[4 * cls + jnp.arange(4)].set(quat)
            wgt = jnp.zeros((4 * C,)).at[4 * cls + jnp.arange(4)].set(
                jnp.where(found & ok, 1.0, 0.0)
            )
            return jnp.where(ok, tgt, 0.0), wgt

        targets, weights = jax.vmap(slot_target)(slot_cls_safe, box, slot_valid)
        domain = jnp.where(gt_any, 0, 1) * jnp.ones((S,), jnp.int32)

        return slot_cls_safe, slot_valid, box, vbest, pose, targets, weights, domain

    metas = meta_data.reshape(B, -1)
    outs = jax.vmap(one_image)(label_flat, vert_flat, metas, jnp.arange(B))
    slot_cls, slot_valid, box, score, pose, targets, weights, domain = outs

    # expand jitter rows (training: 9 rows per detection, .cu.cc:446-576)
    ww = box[..., 2] - box[..., 0]
    hh = box[..., 3] - box[..., 1]
    shift = _JITTER  # (J9,2) — row 0 = no shift
    jbox = jnp.stack(
        [
            box[..., None, 0] + shift[None, None, :J, 0] * 0.05 * ww[..., None],
            box[..., None, 1] + shift[None, None, :J, 1] * 0.05 * hh[..., None],
            box[..., None, 0] + shift[None, None, :J, 0] * 0.05 * ww[..., None] + ww[..., None],
            box[..., None, 1] + shift[None, None, :J, 1] * 0.05 * hh[..., None] + hh[..., None],
        ],
        axis=-1,
    )  # (B,S,J,4)
    if not is_train:
        jbox = box[:, :, None, :]

    batch_col = jnp.broadcast_to(jnp.arange(B, dtype=jnp.float32)[:, None, None], (B, S, J))
    cls_col = jnp.broadcast_to(slot_cls[:, :, None].astype(jnp.float32), (B, S, J))
    score_col = jnp.broadcast_to(score[:, :, None], (B, S, J))
    rois = jnp.concatenate(
        [batch_col[..., None], cls_col[..., None], jbox, score_col[..., None]], axis=-1
    )  # (B,S,J,7)

    R = B * S * J
    valid = jnp.broadcast_to(slot_valid[:, :, None], (B, S, J)).reshape(R)
    rois = jnp.where(valid[:, None], rois.reshape(R, 7), 0.0)
    poses_init = jnp.where(
        valid[:, None],
        jnp.broadcast_to(pose[:, :, None, :], (B, S, J, 7)).reshape(R, 7),
        0.0,
    )
    poses_target = jnp.broadcast_to(targets[:, :, None, :], (B, S, J, 4 * C)).reshape(R, 4 * C)
    poses_weight = jnp.broadcast_to(weights[:, :, None, :], (B, S, J, 4 * C)).reshape(R, 4 * C)
    poses_target = jnp.where(valid[:, None], poses_target, 0.0)
    poses_weight = jnp.where(valid[:, None], poses_weight, 0.0)
    domains = jnp.where(valid, jnp.broadcast_to(domain[:, :, None], (B, S, J)).reshape(R), 0)
    num_rois = jnp.sum(valid.astype(jnp.int32))

    out = HoughOutputs(rois, poses_init, poses_target, poses_weight, domains, valid, num_rois)
    return jax.tree_util.tree_map(jax.lax.stop_gradient, out)


def hough_voting_multi(
    label: jnp.ndarray,
    vertex_pred: jnp.ndarray,
    extents: jnp.ndarray,
    meta_data: jnp.ndarray,
    gt_poses: jnp.ndarray,
    *,
    num_classes: int,
    is_train: bool,
    voting_threshold: float,
    per_threshold: float = 0.02,
    skip_pixels: int = 10,
    inlier_threshold: float = 0.9,
    label_threshold: int = 500,
    class_slots: int = 8,
    max_samples: int = 1024,
    max_detections_per_image: int = 16,
    sample_chunk: int = 128,
    pixel_grid_stride: int = 1,
    sampler: str = "exact",
) -> HoughOutputs:
    """Multi-instance mode (`voting_threshold > 0`): local maxima of the
    dense vote map instead of one argmax per class.

    Reference: compute_max_indexes_kernel (.cu.cc:335-383) — a center is
    emitted when its votes exceed `voting_threshold`, it is a local max in a
    7x7 window, its inlier bbox is positive and votes/(bbw*bbh) >=
    `per_threshold`. Detections are capped at MAX_ROI/batch per image
    (here `max_detections_per_image`), top-scored first. Full-resolution
    vote maps only (center_stride=1): local maxima don't survive coarse
    grids. Costs one extra dense pass for the per-center inlier bbox.
    """
    B, H, W = label.shape
    C = num_classes
    S = class_slots
    P = max_samples
    D = max_detections_per_image
    J = 9 if is_train else 1
    sample_chunk = min(sample_chunk, P)
    assert P % sample_chunk == 0, f"max_samples {P} not divisible by chunk {sample_chunk}"

    label_flat = label.reshape(B, H * W)
    vert_flat = vertex_pred.reshape(B, H * W, 3 * C)
    gt_cls = gt_poses[:, 1]
    gt_batch = gt_poses[:, 0]
    gt_any = jnp.any(gt_cls > 0)
    gxs = jnp.arange(0, W, dtype=jnp.float32)
    gys = jnp.arange(0, H, dtype=jnp.float32)

    g = pixel_grid_stride
    if g > 1:
        grid_rows = jnp.arange(0, H, g)
        grid_cols = jnp.arange(0, W, g)
        cand_index = (grid_rows[:, None] * W + grid_cols[None, :]).reshape(-1).astype(jnp.int32)
    else:
        cand_index = None

    def one_image(lab, vert, meta, b_idx):
        fx, px_, fy, py_ = meta[0], meta[2], meta[4], meta[5]
        counts = jnp.sum(
            (lab[None, :] == jnp.arange(C, dtype=lab.dtype)[:, None]).astype(jnp.int32), axis=1
        )
        active = (counts > label_threshold) & (jnp.arange(C) > 0)
        order = jnp.sort(jnp.where(active, jnp.arange(C), C))
        if S > C:
            order = jnp.pad(order, (0, S - C), constant_values=C)
        slot_cls = order[:S]
        slot_valid = slot_cls < C
        slot_cls_safe = jnp.where(slot_valid, slot_cls, 0)
        lab_cand = lab[cand_index] if cand_index is not None else lab

        def per_slot(cls, ok):
            return _slot_samples(
                lab_cand, cls, ok, vert, extents[cls], cand_index, W, P,
                skip_pixels, fx, fy, px_, py_, sampler,
            )

        sx, sy, su, sv, sd, sthr, svalid = jax.vmap(per_slot)(slot_cls_safe, slot_valid)

        def slot_votes(args):
            x, y, u, v, d, thr, val = args
            return _accumulate_votes(x, y, u, v, d, thr, val, gxs, gys, inlier_threshold, sample_chunk)

        votes, dsum = jax.lax.map(slot_votes, (sx, sy, su, sv, sd, sthr, svalid))
        dist = jnp.where(votes > 0, dsum / jnp.maximum(votes, 1.0), 0.0)  # (S,H,W)

        # dense per-center inlier bbox using the per-center mean distance
        thr_c = jax.vmap(
            lambda c, dmap: _project_box_threshold(
                extents[c], fx, fy, px_, py_, dmap.reshape(-1)
            ).reshape(H, W)
        )(slot_cls_safe, dist)  # (S,H,W)

        def slot_bb_dense(args):
            x, y, u, v, val, thr_map = args
            n_chunks = P // sample_chunk
            data = (
                x.reshape(n_chunks, -1), y.reshape(n_chunks, -1),
                u.reshape(n_chunks, -1), v.reshape(n_chunks, -1),
                val.reshape(n_chunks, -1),
            )

            def body(carry, xs):
                bw, bh = carry
                xc, yc, uc, vc, vl = xs
                dx = gxs[None, None, :] - xc[:, None, None]
                dy = gys[None, :, None] - yc[:, None, None]
                dot = uc[:, None, None] * dx + vc[:, None, None] * dy
                n1sq = (uc * uc + vc * vc)[:, None, None]
                n2sq = dx * dx + dy * dy
                inl = (
                    (dot > 0.0)
                    & (dot * dot > (inlier_threshold * inlier_threshold) * n1sq * n2sq)
                    & vl[:, None, None]
                )
                okb = inl & (jnp.abs(dx) < thr_map[None]) & (jnp.abs(dy) < thr_map[None])
                bw = jnp.maximum(bw, jnp.max(jnp.where(okb, jnp.abs(dx), -1.0), axis=0))
                bh = jnp.maximum(bh, jnp.max(jnp.where(okb, jnp.abs(dy), -1.0), axis=0))
                return (bw, bh), None

            init = (jnp.full((H, W), -1.0), jnp.full((H, W), -1.0))
            (bw, bh), _ = jax.lax.scan(body, init, data)
            return bw, bh

        bw, bh = jax.lax.map(slot_bb_dense, (sx, sy, su, sv, svalid, thr_c))
        bb_w = jnp.where(votes > 0, 2.0 * bw, 0.0)
        bb_h = jnp.where(votes > 0, 2.0 * bh, 0.0)

        # local max in a 7x7 window (kernel_size=3, .cu.cc:347)
        winmax = jax.lax.reduce_window(
            votes, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 7, 7), window_strides=(1, 1, 1), padding="SAME",
        )
        selected = (
            (votes > voting_threshold)
            & (bb_h > 0) & (bb_w > 0)
            & (votes >= winmax)
            & (votes / jnp.maximum(bb_h * bb_w, 1e-9) >= per_threshold)
            & slot_valid[:, None, None]
        )
        score_flat = jnp.where(selected, votes, -1.0).reshape(-1)
        top_scores, top_idx = jax.lax.top_k(score_flat, D)
        det_valid = top_scores > 0
        s_idx = top_idx // (H * W)
        pix = top_idx % (H * W)
        cy = (pix // W).astype(jnp.float32)
        cx = (pix % W).astype(jnp.float32)
        cls_det = slot_cls_safe[s_idx]
        d_det = dist.reshape(S, -1)[s_idx, pix]
        bw_det = bb_w.reshape(S, -1)[s_idx, pix]
        bh_det = bb_h.reshape(S, -1)[s_idx, pix]

        scale = 0.05
        rx = (cx - px_) / fx
        ry = (cy - py_) / fy
        box = jnp.stack(
            [
                cx - bw_det * (0.5 + scale), cy - bh_det * (0.5 + scale),
                cx + bw_det * (0.5 + scale), cy + bh_det * (0.5 + scale),
            ],
            axis=1,
        )
        pose = jnp.stack(
            [
                jnp.ones_like(d_det), jnp.zeros_like(d_det), jnp.zeros_like(d_det),
                jnp.zeros_like(d_det), rx * d_det, ry * d_det, d_det,
            ],
            axis=1,
        )

        def det_target(cls, det_box, ok):
            def gt_box(gt_row):
                return _project_gt_box(
                    extents[jnp.clip(gt_row[1].astype(jnp.int32), 0, C - 1)],
                    gt_row[6:10], gt_row[10:13], fx, fy, px_, py_,
                )

            boxes_gt = jax.vmap(gt_box)(gt_poses)
            ious = _iou(det_box[None, :], boxes_gt)
            match = (
                (gt_cls.astype(jnp.int32) == cls)
                & (gt_batch.astype(jnp.int32) == b_idx)
                & (gt_cls > 0) & (ious > 0.2)
            )
            found = jnp.any(match)
            first = jnp.argmax(match)
            quat = gt_poses[first, 6:10] * found
            tgt = jnp.zeros((4 * C,)).at[4 * cls + jnp.arange(4)].set(quat)
            wgt = jnp.zeros((4 * C,)).at[4 * cls + jnp.arange(4)].set(
                jnp.where(found & ok, 1.0, 0.0)
            )
            return jnp.where(ok, tgt, 0.0), wgt

        targets, weights = jax.vmap(det_target)(cls_det, box, det_valid)
        domain = jnp.where(gt_any, 0, 1) * jnp.ones((D,), jnp.int32)
        return cls_det, det_valid, box, top_scores, pose, targets, weights, domain

    metas = meta_data.reshape(B, -1)
    outs = jax.vmap(one_image)(label_flat, vert_flat, metas, jnp.arange(B))
    cls_det, det_valid, box, score, pose, targets, weights, domain = outs

    ww = box[..., 2] - box[..., 0]
    hh = box[..., 3] - box[..., 1]
    jbox = jnp.stack(
        [
            box[..., None, 0] + _JITTER[None, None, :J, 0] * 0.05 * ww[..., None],
            box[..., None, 1] + _JITTER[None, None, :J, 1] * 0.05 * hh[..., None],
            box[..., None, 0] + _JITTER[None, None, :J, 0] * 0.05 * ww[..., None] + ww[..., None],
            box[..., None, 1] + _JITTER[None, None, :J, 1] * 0.05 * hh[..., None] + hh[..., None],
        ],
        axis=-1,
    )
    if not is_train:
        jbox = box[:, :, None, :]

    batch_col = jnp.broadcast_to(jnp.arange(B, dtype=jnp.float32)[:, None, None], (B, D, J))
    cls_col = jnp.broadcast_to(cls_det[:, :, None].astype(jnp.float32), (B, D, J))
    score_col = jnp.broadcast_to(score[:, :, None], (B, D, J))
    rois = jnp.concatenate(
        [batch_col[..., None], cls_col[..., None], jbox, score_col[..., None]], axis=-1
    )
    R = B * D * J
    valid = jnp.broadcast_to(det_valid[:, :, None], (B, D, J)).reshape(R)
    rois = jnp.where(valid[:, None], rois.reshape(R, 7), 0.0)
    poses_init = jnp.where(
        valid[:, None], jnp.broadcast_to(pose[:, :, None, :], (B, D, J, 7)).reshape(R, 7), 0.0
    )
    poses_target = jnp.where(
        valid[:, None],
        jnp.broadcast_to(targets[:, :, None, :], (B, D, J, 4 * C)).reshape(R, 4 * C), 0.0,
    )
    poses_weight = jnp.where(
        valid[:, None],
        jnp.broadcast_to(weights[:, :, None, :], (B, D, J, 4 * C)).reshape(R, 4 * C), 0.0,
    )
    domains = jnp.where(valid, jnp.broadcast_to(domain[:, :, None], (B, D, J)).reshape(R), 0)
    num_rois = jnp.sum(valid.astype(jnp.int32))
    out = HoughOutputs(rois, poses_init, poses_target, poses_weight, domains, valid, num_rois)
    return jax.tree_util.tree_map(jax.lax.stop_gradient, out)
