#!/usr/bin/env python
"""Pose-branch isolation experiment (round-2 verdict task 2a).

Question: can the quaternion head + ADD loss learn rotation AT ALL when the
detection pipeline is perfect? Trains the full network on a tiny fixed
synthetic set with TPU.HOUGH_FROM_GT semantics (hough voting consumes GT
labels + GT-derived vertex targets, so the pose branch always sees perfect
ROIs and pose targets — reference context: the RoIs the pose branch trains
on come from hough_voting_gpu_op.cu.cc:386-576 matched to GT by IoU>0.2),
then measures the rotation/z error trajectory on those same frames with
GT-hough inference.

Interpretation:
  * rotation error collapses  -> the branch/loss machinery works; the full
    run's stall is signal/iteration-count, not a bug;
  * rotation error stays ~126 deg (uniform-random median) -> bug in the
    branch, loss, or quaternion conventions.

Usage:
  python tools/isolate_pose.py --iters 3000 --frames 16 --report_every 500
"""

from __future__ import annotations

import _init_paths  # noqa: F401

import argparse
import json
import os
import time
from dataclasses import replace

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--report_every", type=int, default=500)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--lr", type=float, default=0.001)
    ap.add_argument("--margin", type=float, default=0.0001)
    ap.add_argument("--device", default="tpu")
    ap.add_argument("--out", default="output/isolate_pose")
    ap.add_argument(
        "--from_net_hough", action="store_true",
        help="control arm: hough from the network's own label/vertex heads",
    )
    return ap.parse_args()


def main():
    args = parse_args()
    import jax

    if args.device != "tpu":
        jax.config.update("jax_platforms", args.device)
    import jax.numpy as jnp

    from posecnn_tpu.data.layer import GtSynthesizeLayer, prefetch
    from posecnn_tpu.data.lov import lov
    from posecnn_tpu.data.minibatch import (
        MinibatchConfig, build_meta_data, rescale_points,
    )
    from posecnn_tpu.data.synthetic import SyntheticDataset
    from posecnn_tpu.engine.train import TrainHParams, create_train_state, make_train_step
    from posecnn_tpu.models.posecnn import PoseCNNConfig, posecnn_forward
    from posecnn_tpu.parallel.mesh import make_mesh
    from posecnn_tpu.utils.quaternion_np import quat2mat

    dataset = SyntheticDataset(lov("train"), split="tiny", num_images=args.frames)
    C = dataset.num_classes
    extents = np.asarray(dataset._extents, np.float32)
    symmetry = np.asarray(dataset._symmetry, np.float32)
    points_all = np.asarray(dataset._points_all, np.float32)
    loss_points = rescale_points(points_all, extents, symmetry)

    model_cfg = PoseCNNConfig(
        num_classes=C, is_train=True, vertex_reg=True, pose_reg=True,
        hough_from_gt=not args.from_net_hough,
    )
    hp = TrainHParams(
        learning_rate=args.lr, momentum=0.9, gamma=0.1, stepsize=10 ** 9,
        weight_reg=0.0001, vertex_w=5.0, pose_w=1.0, margin=args.margin,
        pose_norm_valid=True, clip_grad_norm=10.0,
    )
    mcfg = MinibatchConfig(num_classes=C, chromatic=False, add_noise=False,
                           vertex_reg=True, device_targets=True)
    layer = GtSynthesizeLayer(dataset, mcfg, ims_per_batch=args.batch, seed=3)
    mesh = make_mesh()
    step_fn = make_train_step(
        model_cfg, hp, mesh, jnp.asarray(loss_points), jnp.asarray(symmetry),
        jnp.asarray(extents),
    )
    state = create_train_state(model_cfg, hp, jax.random.PRNGKey(3))

    # ---- GT-hough eval: quaternion extraction with perfect detections
    eval_cfg = replace(model_cfg, is_train=False, keep_prob=1.0, hough_from_gt=True)
    means = jnp.asarray(mcfg.pixel_means, jnp.float32).reshape(1, 1, 1, 3)

    @jax.jit
    def infer_gt_hough(params, raw_u8, meta, ext, gt_label, gt_centers):
        data = raw_u8.astype(jnp.float32) - means
        out = posecnn_forward(params, eval_cfg, data, ext, meta,
                              gt_label_2d=gt_label, gt_centers=gt_centers)
        return {k: out[k] for k in ("rois", "rois_valid", "poses_init", "poses_tanh")}

    # fixed eval inputs (the train frames themselves — this is an overfit probe)
    frames = [dataset.load_frame(i) for i in range(args.frames)]
    max_gt = mcfg.max_gt

    def frame_inputs(f):
        g = np.zeros((max_gt, 4), np.float32)
        n = len(f.cls_indexes)
        g[:n, 0] = f.cls_indexes
        g[:n, 1:3] = f.center[:n]
        g[:n, 3] = f.poses[2, 3, :n]
        return f.color, f.label.astype(np.int32), g, build_meta_data(f.intrinsic_matrix)

    eb = 4  # eval chunk
    eval_chunks = []
    for s in range(0, args.frames, eb):
        fs = frames[s : s + eb]
        while len(fs) < eb:
            fs = fs + [frames[-1]]
        cols, labs, gcs, metas = zip(*[frame_inputs(f) for f in fs])
        eval_chunks.append((
            jnp.asarray(np.stack(cols)), jnp.asarray(np.stack(labs)),
            jnp.asarray(np.stack(gcs)), jnp.asarray(np.stack(metas)),
            min(eb, args.frames - s),
        ))
    ext_j = jnp.asarray(extents)

    def evaluate(params):
        """Median rotation error (non-symmetric classes), ADD on raw points,
        z / xy translation errors, over GT-hough detections."""
        rot_errs, adds, z_errs, xy_errs = [], [], [], []
        fi = 0
        for cols, labs, gcs, metas, n_real in eval_chunks:
            out = jax.device_get(infer_gt_hough(params, cols, metas, ext_j, labs, gcs))
            rois = out["rois"]
            valid = out["rois_valid"].astype(bool)
            for b in range(n_real):
                f = frames[fi]
                gt_cls = f.cls_indexes.astype(int)
                sel = valid & (rois[:, 0].astype(int) == b)
                for r in np.nonzero(sel)[0]:
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
                    pts = points_all[c]
                    x1 = pts @ R_pred.T
                    x2 = pts @ R_gt.T
                    if symmetry[c] > 0:
                        from scipy.spatial import cKDTree

                        d = cKDTree(x2).query(x1)[0].mean()
                    else:
                        d = np.linalg.norm(x1 - x2, axis=1).mean()
                        cosang = np.clip((np.trace(R_pred @ R_gt.T) - 1) / 2, -1, 1)
                        rot_errs.append(np.degrees(np.arccos(cosang)))
                    adds.append(d)
                    z_errs.append(abs(t_pred[2] - t_gt[2]))
                    xy_errs.append(np.hypot(t_pred[0] - t_gt[0], t_pred[1] - t_gt[1]))
                fi += 1
        return {
            "rot_median_deg": float(np.median(rot_errs)) if rot_errs else None,
            "rot_p90_deg": float(np.percentile(rot_errs, 90)) if rot_errs else None,
            "add_mean_m": float(np.mean(adds)) if adds else None,
            "z_median_m": float(np.median(z_errs)) if z_errs else None,
            "xy_median_m": float(np.median(xy_errs)) if xy_errs else None,
            "n_dets": len(adds),
        }

    os.makedirs(args.out, exist_ok=True)
    trajectory = []
    rng = jax.random.PRNGKey(3)
    data_iter = prefetch(iter(layer), depth=2)
    t0 = time.time()
    m0 = evaluate(state[0])
    m0["iter"] = 0
    trajectory.append(m0)
    print(f"iter 0: {m0}")
    for it in range(1, args.iters + 1):
        batch = next(data_iter)
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, batch, sub)
        if it % 100 == 0:
            m = {k: float(v) for k, v in metrics.items()}
            print(f"iter {it}: loss {m['loss']:.4f} pose {m.get('loss_pose', 0):.4f} "
                  f"cls {m.get('loss_cls', 0):.4f} vert {m.get('loss_vertex', 0):.4f} "
                  f"({time.time() - t0:.1f}s)")
        if it % args.report_every == 0:
            m = evaluate(state[0])
            m["iter"] = it
            m["loss_pose"] = float(metrics["loss_pose"])
            trajectory.append(m)
            print(f"eval @ {it}: {m}")
    report = {
        "config": {
            "iters": args.iters, "frames": args.frames, "batch": args.batch,
            "lr": args.lr, "margin": args.margin,
            "hough_from_gt": not args.from_net_hough,
        },
        "trajectory": trajectory,
    }
    with open(os.path.join(args.out, "report.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {args.out}/report.json")


if __name__ == "__main__":
    main()
