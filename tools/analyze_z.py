#!/usr/bin/env python
"""Isolate the z-channel error of the center-voting translation (round-2
verdict task 2b).

Loads an eval run's per-frame `detections.npz` plus the frozen val split,
matches detections to GT objects by class, and decomposes the translation
error into xy vs z, reporting the predicted-vs-GT z relationship (robust
linear fit z_pred ~ a*z_gt + b and Pearson r). A systematic scale/offset in
the log-z vertex channel or in the hough mean-depth readout
(reference: lib/gt_synthesize_layer/minibatch.py:543-602 writes
log(z) targets; hough_voting_gpu_op.cu.cc:296-326 averages voted depth)
shows up as a != 1 / b != 0 with high r; an under-trained channel shows up
as low r.

Usage:
  python tools/analyze_z.py --dets output/<run>/detections.npz \
      [--val data/lov_syn_val_v3] [--out output/<run>/z_analysis.json]
"""

from __future__ import annotations

import _init_paths  # noqa: F401

import argparse
import glob
import json
import os

import numpy as np


def match_frame(det_poses, det_rois, gt_cls, gt_poses):
    """Greedy one-to-one class match; yields (cls, pred_T, gt_T) triples."""
    used = set()
    for i in range(det_rois.shape[0]):
        cls = int(det_rois[i, 1])
        if cls <= 0:
            continue
        cands = [j for j in range(len(gt_cls)) if int(gt_cls[j]) == cls and j not in used]
        if not cands:
            continue
        pred_t = det_poses[i, 4:7]
        j = min(cands, key=lambda j: np.linalg.norm(gt_poses[:, 3, j] - pred_t))
        used.add(j)
        yield cls, pred_t, gt_poses[:, 3, j]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dets", required=True)
    ap.add_argument("--val", default="data/lov_syn_val_v3")
    ap.add_argument("--out", default=None)
    ap.add_argument("--poses_key", default="poses", choices=["poses", "poses_refined", "poses_icp"])
    args = ap.parse_args()

    dets = np.load(args.dets, allow_pickle=True)
    frames = sorted({k.split("_")[0] for k in dets.files})
    rows = []
    missing_gt = 0
    for f in frames:
        gt_path = os.path.join(args.val, f + ".npz")
        if not os.path.exists(gt_path):
            missing_gt += 1
            continue
        gt = np.load(gt_path, allow_pickle=True)
        for cls, pt, gtt in match_frame(
            dets[f + "_" + args.poses_key], dets[f + "_rois"], gt["cls_indexes"], gt["poses"]
        ):
            rows.append((cls, *pt, *gtt))
    if not rows:
        raise SystemExit(f"no matched detections under {args.val}")
    if missing_gt:
        print(f"WARNING: {missing_gt}/{len(frames)} det frames have no GT "
              f"file under {args.val} — wrong --val split?", flush=True)
    r = np.asarray(rows, np.float64)
    cls, pred, gt = r[:, 0], r[:, 1:4], r[:, 4:7]
    xy_err = np.linalg.norm(pred[:, :2] - gt[:, :2], axis=1)
    z_err = np.abs(pred[:, 2] - gt[:, 2])
    # least-squares z_pred = a*z_gt + b and correlation
    A = np.stack([gt[:, 2], np.ones_like(gt[:, 2])], axis=1)
    (a, b), *_ = np.linalg.lstsq(A, pred[:, 2], rcond=None)
    cc = np.corrcoef(gt[:, 2], pred[:, 2])[0, 1]
    report = {
        "dets": args.dets,
        # the GT population matched against — a dets file evaluated on a
        # different split than --val silently matches only the overlap
        # (caught live: a 256-frame v4 eval analyzed against the v3 dir
        # matched 64 frames), so the report must name its GT source
        "val_gt_dir": args.val,
        "poses_key": args.poses_key,
        "n_matched": int(len(rows)),
        "xy_err_median_m": float(np.median(xy_err)),
        "z_err_median_m": float(np.median(z_err)),
        "z_fit_slope": float(a),
        "z_fit_intercept_m": float(b),
        "z_pearson_r": float(cc),
        "z_gt_range_m": [float(gt[:, 2].min()), float(gt[:, 2].max())],
        "z_pred_range_m": [float(pred[:, 2].min()), float(pred[:, 2].max())],
        # per-decile mean signed error: reveals range-dependent bias
        "z_signed_err_by_gt_decile": [
            float(np.mean((pred[:, 2] - gt[:, 2])[q]))
            for q in np.array_split(np.argsort(gt[:, 2]), 10)
        ],
    }
    # slope<1 with high correlation is ATTENUATION toward the training
    # depth prior, not a readout bug: the voting/target mechanics are
    # exonerated by golden tests (GT-fed hough readout exact to <1e-3,
    # tests/test_hough.py) and both 160K runs regress onto the same line
    # regardless of data freshness — see DESIGN.md sec 14
    verdict = (
        "ATTENUATED toward depth prior (high correlation, slope<1; "
        "regression-to-prior under ambiguous scale cues, not a readout bug)"
        if cc > 0.9 and (abs(a - 1) > 0.1 or abs(b) > 0.05)
        else "well-calibrated" if cc > 0.9 else "under-trained z channel (low correlation)"
    )
    report["verdict"] = verdict
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=2)


if __name__ == "__main__":
    main()
