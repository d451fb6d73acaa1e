#!/usr/bin/env python
"""Log-z regression sanity check (round-2 verdict task 2b).

Compares predicted object depth (hough mean-voted z, poses[:,6]) against GT
z per detection over an eval run's `detections.npz`, matched greedily by
class. Prints a compact scatter summary: bias, correlation, and quantile
errors, plus the same for xy — isolating whether the dominant translation
error is the z channel (vertex log-z head / hough depth averaging,
reference hough_voting_gpu_op.cu.cc:296-326) or the 2D center vote.

Usage:
  python tools/analyze_z.py --dets output/<eval_dir>/detections.npz \
      --imdb lov_syn_val [--out output/<eval_dir>/z_analysis.json]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dets", required=True)
    ap.add_argument("--imdb", default="lov_syn_val")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from posecnn_tpu.data.factory import get_imdb

    imdb = get_imdb(args.imdb)
    d = np.load(args.dets)
    frames = sorted({k.split("_")[0] for k in d.keys()})

    rows = []  # (cls, z_pred, z_gt, x_pred, x_gt, y_pred, y_gt)
    for fk in frames:
        i = int(fk)
        if i >= imdb.num_images:
            continue
        frame = imdb.load_frame(i)
        rois = d[f"{fk}_rois"]
        poses = d[f"{fk}_poses"]
        gt_cls = frame.cls_indexes.astype(int)
        for r in range(len(rois)):
            c = int(rois[r, 1])
            hits = np.where(gt_cls == c)[0]
            if len(hits) == 0:
                continue
            # single-instance scenes: first hit
            j = hits[0]
            t_gt = frame.poses[:, 3, j]
            t_pred = poses[r, 4:7]
            rows.append((c, t_pred[2], t_gt[2], t_pred[0], t_gt[0], t_pred[1], t_gt[1]))

    if not rows:
        print("no matched detections")
        sys.exit(1)
    a = np.array(rows)
    zp, zg = a[:, 1], a[:, 2]
    xy_err = np.hypot(a[:, 3] - a[:, 4], a[:, 5] - a[:, 6])
    z_err = zp - zg
    summary = {
        "n": int(len(a)),
        "z_bias": float(np.mean(z_err)),
        "z_median_abs_err": float(np.median(np.abs(z_err))),
        "z_p90_abs_err": float(np.percentile(np.abs(z_err), 90)),
        "z_corr": float(np.corrcoef(zp, zg)[0, 1]),
        "z_pred_mean": float(zp.mean()),
        "z_gt_mean": float(zg.mean()),
        "z_pred_std": float(zp.std()),
        "z_gt_std": float(zg.std()),
        "xy_median_err": float(np.median(xy_err)),
        "slope": float(np.polyfit(zg, zp, 1)[0]),
    }
    print(json.dumps(summary, indent=1))
    # coarse ASCII scatter: gt z bins vs mean pred z
    bins = np.linspace(zg.min(), zg.max(), 9)
    print("\n gt z bin        mean pred z   (n)")
    for b0, b1 in zip(bins[:-1], bins[1:]):
        m = (zg >= b0) & (zg < b1)
        if m.sum():
            print(f" [{b0:.2f},{b1:.2f})   {zp[m].mean():8.3f}   ({int(m.sum())})")
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(summary, fh, indent=1)


if __name__ == "__main__":
    main()
