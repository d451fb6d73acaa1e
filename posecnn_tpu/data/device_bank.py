"""Device-resident training data bank.

TPU-first replacement for the host minibatch pipeline on fixed datasets:
the whole training set is staged into device HBM once (uint8 frames +
compact annotation tables, ~1.2 MB/frame for 480x640 COLOR), and every
train step samples its batch *inside* the jit graph with `jax.random` +
`jnp.take`. Host involvement per step drops to zero, which matters here
because the host has a single CPU core: the measured host pipeline costs
~90 ms/iter against a ~13 ms device step, idling the chip ~85%.

The reference streams minibatches through a Python/C++ data layer every
iteration (lib/gt_synthesize_layer/layer.py + minibatch.py) — a design
forced by GPU-host architectures and giant real datasets. The frozen
synthetic sets used here (2K frames, ~2.5 GB as uint8) fit in a v5e's
16 GB HBM with room for the model, so the TPU-native answer is to keep
the data next to the MXU and make sampling part of the compiled step.

Augmentation stays in-graph (ops/chromatic.py HLS jitter + gaussian
noise, already device-side); the bank path draws their per-image
parameters with `jax.random` instead of shipping them from the host.
The one host-only augmentation arm — the ~10% motion-blur branch of
add_noise (utils/blob.py) — is approximated as "no noise" for those
images; see make_bank_train_step.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from posecnn_tpu.data.minibatch import (
    MinibatchConfig, build_meta_data, pad_im, pose_rows,
)


def build_bank(
    dataset,
    mcfg: MinibatchConfig,
    limit: Optional[int] = None,
    log=None,
) -> Dict[str, np.ndarray]:
    """Stack every frame of `dataset` into fixed-shape host arrays.

    Returns a dict ready for `jax.device_put`:
      data       (N,H,W,3) uint8   raw BGR frames (device preprocessing
                                   subtracts pixel means in the train step)
      label      (N,H,W)   uint8   class-index segmentation
      gt_centers (N,G,4)   float32 per-frame hough table rows
                                   [cls, cx, cy, z]
      pose_rows  (N,G,13)  float32 per-frame GT pose rows in the
                                   minibatch `poses` layout (col 0 — the
                                   batch index — is filled at sample time)
      meta_data  (N,48)    float32 K / K^-1 metadata

    G is the largest per-frame instance count (capped at mcfg.max_gt).
    """
    n = dataset.num_images if limit is None else min(limit, dataset.num_images)
    frames = []
    g_max = 1
    for i in range(n):
        f = dataset.load_frame(i)
        frames.append(f)
        g_max = max(g_max, int(f.poses.shape[2]))
        if log and (i + 1) % 500 == 0:
            log(f"bank: loaded {i + 1}/{n} frames")
    g_max = min(g_max, mcfg.max_gt)
    return pack_frames(frames, g_max)


def pack_frames(frames, g_max: int) -> Dict[str, np.ndarray]:
    """Pack a list of `Frame`s into the fixed-shape bank-row arrays.

    Shared by the one-shot `build_bank` staging and the continuous
    `bank_refresh.BankRefresher` chunk producer, so refreshed rows are
    bit-identical in layout to the initially staged ones.
    """
    n = len(frames)
    f0 = frames[0]
    im0 = pad_im(f0.color, 16)
    H, W = im0.shape[:2]
    data = np.zeros((n, H, W, 3), np.uint8)
    label = np.zeros((n, H, W), np.uint8)
    gt_centers = np.zeros((n, g_max, 4), np.float32)
    prow = np.zeros((n, g_max, 13), np.float32)
    metas = np.zeros((n, 48), np.float32)
    for i, f in enumerate(frames):
        im = pad_im(f.color, 16)
        data[i] = np.clip(np.round(im[..., :3]), 0, 255).astype(np.uint8)
        lab = pad_im(f.label.astype(np.int32), 16)
        label[i] = lab.astype(np.uint8)
        k = min(int(f.poses.shape[2]), g_max)
        gt_centers[i, :k, 0] = f.cls_indexes[:k]
        gt_centers[i, :k, 1:3] = f.center[:k]
        gt_centers[i, :k, 3] = f.poses[2, 3, :k]
        prow[i, :k] = pose_rows(0, f)[:k]
        metas[i] = build_meta_data(f.intrinsic_matrix)
    return {
        "data": data,
        "label": label,
        "gt_centers": gt_centers,
        "pose_rows": prow,
        "meta_data": metas,
    }


def bank_nbytes(bank: Dict[str, np.ndarray]) -> int:
    return sum(int(v.nbytes) for v in bank.values())
