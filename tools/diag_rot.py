#!/usr/bin/env python
"""Rotation-error decomposition for a trained checkpoint (round-3 accuracy).

Separates two failure modes the summary metric ("median_err_r_deg" in
eval_summary.json) cannot distinguish:

  * head failure — the class-sliced quaternion regressor itself has not
    learned: GT-hough rotation error stays near the ~126 deg uniform-random
    median;
  * ROI mismatch — the head is fine on perfect ROIs but the predicted hough
    boxes/centers it sees at eval are off-distribution: GT-hough error is
    low while predicted-hough error stays high.

Runs the SAME checkpoint over the SAME frozen-val frames twice — once with
`hough_from_gt=True` (the pose branch sees perfect ROIs, as in
tools/isolate_pose.py) and once with the normal predicted-hough eval path —
and reports median/p90 rotation error (non-symmetric classes) for each arm.

Reference context: the reference trains its pose branch on hough ROIs from
predicted labels (hough_voting_gpu_op.cu.cc:386-576, IoU>0.2 GT matching),
so head-vs-ROI attribution is the first question when rotation stalls.

Usage:
  python tools/diag_rot.py --model <ckpt.npz> [--frames 16] [--device tpu]
"""

from __future__ import annotations

import _init_paths  # noqa: F401

import argparse
import json
import os
from dataclasses import replace

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--imdb", default="lov_syn_val")
    ap.add_argument("--device", default="tpu")
    ap.add_argument("--out", default="output/diag_rot.json")
    return ap.parse_args()


def main():
    args = parse_args()
    import jax

    if args.device != "tpu":
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp

    from posecnn_tpu.core.checkpoint import restore_checkpoint
    from posecnn_tpu.data.factory import get_imdb
    from posecnn_tpu.data.minibatch import MinibatchConfig, build_meta_data
    from posecnn_tpu.engine.train import TrainHParams, create_train_state
    from posecnn_tpu.models.posecnn import PoseCNNConfig, posecnn_forward
    from posecnn_tpu.utils.quaternion_np import quat2mat

    dataset = get_imdb(args.imdb)
    C = dataset.num_classes
    symmetry = np.asarray(dataset._symmetry, np.float32)
    points_all = np.asarray(dataset._points_all, np.float32)
    extents = np.asarray(dataset._extents, np.float32)

    mcfg = MinibatchConfig(num_classes=C)
    base_cfg = PoseCNNConfig(
        num_classes=C, is_train=False, keep_prob=1.0, vertex_reg=True,
        pose_reg=True,
    )
    state = create_train_state(
        replace(base_cfg, is_train=True), TrainHParams(), jax.random.PRNGKey(0)
    )
    params = restore_checkpoint(args.model, state)[0]

    means = jnp.asarray(mcfg.pixel_means, jnp.float32).reshape(1, 1, 1, 3)
    ext_j = jnp.asarray(extents)

    def make_infer(gt_hough):
        icfg = replace(base_cfg, hough_from_gt=gt_hough)

        @jax.jit
        def infer(params, raw_u8, meta, gt_label, gt_centers):
            data = raw_u8.astype(jnp.float32) - means
            out = posecnn_forward(
                params, icfg, data, ext_j, meta,
                gt_label_2d=gt_label, gt_centers=gt_centers,
            )
            return {k: out[k] for k in
                    ("rois", "rois_valid", "poses_init", "poses_tanh")}

        return infer

    n = min(args.frames, dataset.num_images)
    frames = [dataset.load_frame(i) for i in range(n)]
    max_gt = mcfg.max_gt

    def frame_inputs(f):
        g = np.zeros((max_gt, 4), np.float32)
        k = len(f.cls_indexes)
        g[:k, 0] = f.cls_indexes
        g[:k, 1:3] = f.center[:k]
        g[:k, 3] = f.poses[2, 3, :k]
        return (f.color, f.label.astype(np.int32), g,
                build_meta_data(f.intrinsic_matrix))

    def run_arm(gt_hough):
        infer = make_infer(gt_hough)
        rot_errs, z_errs, xy_errs = [], [], []
        for fi, f in enumerate(frames):
            col, lab, gc, meta = frame_inputs(f)
            out = jax.device_get(infer(
                params, jnp.asarray(col[None]), jnp.asarray(meta[None]),
                jnp.asarray(lab[None]), jnp.asarray(gc[None]),
            ))
            rois = out["rois"]
            valid = out["rois_valid"].astype(bool)
            gt_cls = f.cls_indexes.astype(int)
            for r in np.nonzero(valid)[0]:
                c = int(rois[r, 1])
                hits = np.nonzero(gt_cls == c)[0]
                if not len(hits):
                    continue
                j = hits[0]
                q = out["poses_tanh"][r, 4 * c : 4 * c + 4]
                q = q / max(np.linalg.norm(q), 1e-12)
                R_pred = quat2mat(q)
                R_gt = f.poses[:, :3, j]
                t_gt = f.poses[:, 3, j]
                t_pred = out["poses_init"][r, 4:7]
                if symmetry[c] == 0:
                    cosang = np.clip(
                        (np.trace(R_pred @ R_gt.T) - 1) / 2, -1, 1)
                    rot_errs.append(float(np.degrees(np.arccos(cosang))))
                z_errs.append(abs(float(t_pred[2] - t_gt[2])))
                xy_errs.append(float(np.hypot(
                    t_pred[0] - t_gt[0], t_pred[1] - t_gt[1])))
        return {
            "rot_median_deg": float(np.median(rot_errs)) if rot_errs else None,
            "rot_p90_deg": (float(np.percentile(rot_errs, 90))
                            if rot_errs else None),
            "z_median_m": float(np.median(z_errs)) if z_errs else None,
            "xy_median_m": float(np.median(xy_errs)) if xy_errs else None,
            "n_rot": len(rot_errs),
        }

    report = {
        "model": args.model,
        "imdb": args.imdb,
        "frames": n,
        "gt_hough": run_arm(True),
        "pred_hough": run_arm(False),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
