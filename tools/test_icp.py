#!/usr/bin/env python
"""ICP smoke tool (reference tools/test_icp.py): perturb a known pose,
refine against the model's own point cloud, report the recovered error."""

from __future__ import annotations

import _init_paths  # noqa: F401

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--imdb", default="lov_syn_val")
    parser.add_argument("--cls", type=int, default=3)
    parser.add_argument("--iters", type=int, default=30)
    args = parser.parse_args()

    import jax.numpy as jnp

    from posecnn_tpu.data.factory import get_imdb
    from posecnn_tpu.engine.refine import icp_refine
    from posecnn_tpu.utils.quaternion_np import mat2quat
    from posecnn_tpu.utils.quaternion import quat2mat

    ds = get_imdb(args.imdb)
    pts = np.asarray(ds._points_all[args.cls] if isinstance(ds._points_all, list)
                     else ds._points_all[args.cls])
    pts = pts[pts.any(axis=1)][:2048]
    rng = np.random.RandomState(0)

    # GT pose: random rotation + translation in front of the camera
    a = rng.randn(4); a /= np.linalg.norm(a)
    R_gt = np.asarray(quat2mat(jnp.asarray(a, jnp.float32)))
    t_gt = np.array([0.05, -0.02, 0.9], np.float32)
    target = pts @ R_gt.T + t_gt

    # perturbed initialization (~10 deg, 3 cm)
    d = np.array([1.0, 0.06, -0.04, 0.05]); d /= np.linalg.norm(d)
    q0 = np.asarray(jnp.asarray(_qmul(a, d), jnp.float32))
    t0 = t_gt + np.array([0.02, -0.015, 0.02], np.float32)

    q, t = icp_refine(
        jnp.asarray(q0, jnp.float32), jnp.asarray(t0, jnp.float32),
        jnp.asarray(pts, jnp.float32), jnp.asarray(target, jnp.float32),
        jnp.ones((target.shape[0],), bool), iters=args.iters,
    )
    R = np.asarray(quat2mat(q))
    err_t0 = np.linalg.norm(t0 - t_gt)
    err_t = np.linalg.norm(np.asarray(t) - t_gt)
    add0 = np.linalg.norm(pts @ (np.asarray(quat2mat(jnp.asarray(q0))) - R_gt).T + (t0 - t_gt), axis=1).mean()
    add = np.linalg.norm(pts @ (R - R_gt).T + (np.asarray(t) - t_gt), axis=1).mean()
    print(f"translation error: {err_t0 * 100:.2f} cm -> {err_t * 100:.2f} cm")
    print(f"ADD:               {add0 * 100:.2f} cm -> {add * 100:.2f} cm")
    return 0 if add < add0 * 0.5 else 1


def _qmul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


if __name__ == "__main__":
    raise SystemExit(main())
