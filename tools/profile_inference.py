#!/usr/bin/env python
"""Stage-level latency breakdown of the flagship inference graph.

Measures steady-state on-device latency of nested prefixes of the PoseCNN
forward (same chained-scan method as bench.py: each iteration's input is
perturbed by the previous output inside one jit, so frames execute strictly
serially and nothing is loop-invariant):

  trunk        vgg conv1-5                                  (models/posecnn.py:164)
  +seg         + semantic labeling branch -> label_2d       (:176-192)
  +vertex      + center-direction/log-z branch              (:201-210)
  +hough       + in-graph hough voting                      (:243-289)
  full         + RoI pool + fc6/7/8 quaternion head         (:300-330)

Successive differences are per-stage shares of the frame. Writes a JSON
report (BASELINE.md round-5, verdict weak #6).

Usage: python tools/profile_inference.py [--out output/profile_inference.json]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def chained_latency(fn, params, raw, iters=4, K=25):
    """Median-free steady-state: serial chain of K frames inside one jit."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(params, raw, seed):
        def body(s, _):
            r = (raw + s).astype(jnp.uint8)
            out = fn(params, r)
            tot = sum(o.astype(jnp.float32).sum()
                      for o in jax.tree_util.tree_leaves(out))
            return (tot * 1e-9).astype(jnp.uint8), None

        s, _ = jax.lax.scan(body, seed, None, length=K)
        return s

    seed = chained(params, raw, jnp.uint8(0))
    jax.device_get(seed)
    t0 = time.perf_counter()
    for _ in range(iters):
        seed = chained(params, raw, seed)
    jax.device_get(seed)
    return (time.perf_counter() - t0) / (iters * K)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="output/profile_inference.json")
    ap.add_argument("--center_stride", type=int, default=None,
                    help="override hough_center_stride (coarse-grid A/B)")
    ap.add_argument("--refine_window", type=int, default=None,
                    help="override hough_refine_window")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg, entry
    from posecnn_tpu.models.backbone import vgg_trunk
    from posecnn_tpu.models.posecnn import posecnn_forward

    fn_full, (params, raw, meta, extents) = entry()
    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randint(0, 255, size=raw.shape, dtype=np.uint8))
    means = jnp.asarray([102.9801, 115.9465, 122.7717], jnp.float32).reshape(1, 1, 1, 3)
    base_cfg = _flagship_cfg(is_train=False)
    hough_over = {}
    if args.center_stride is not None:
        hough_over["hough_center_stride"] = args.center_stride
    if args.refine_window is not None:
        hough_over["hough_refine_window"] = args.refine_window
    if hough_over:
        base_cfg = dataclasses.replace(base_cfg, **hough_over)

    def stage_trunk(p, r):
        net = vgg_trunk(p, r.astype(jnp.float32) - means,
                        compute_dtype=base_cfg.compute_dtype)
        return net["conv4_3"], net["conv5_3"]

    def make_stage(**overrides):
        cfg = dataclasses.replace(base_cfg, **overrides)

        def fn(p, r):
            out = posecnn_forward(p, cfg, r.astype(jnp.float32) - means,
                                  extents, meta)
            return tuple(out[k] for k in sorted(out)
                         if k not in ("prob", "prob_normalized"))

        return fn

    stages = [
        ("trunk", stage_trunk),
        ("+seg", make_stage(vertex_reg=False)),
        ("+vertex", make_stage(vertex_reg_3d=True)),
        ("+hough", make_stage(pose_reg=False)),
        ("full", make_stage()),
    ]

    report = {"method": "chained lax.scan, serial frames, all heads consumed",
              "stages": []}
    prev = 0.0
    for name, fn in stages:
        lat = chained_latency(fn, params, raw)
        report["stages"].append({
            "stage": name,
            "cumulative_ms": round(lat * 1e3, 3),
            "delta_ms": round((lat - prev) * 1e3, 3),
        })
        prev = lat
        print(f"{name:8s} cumulative {lat * 1e3:7.3f} ms  "
              f"delta {report['stages'][-1]['delta_ms']:7.3f} ms", flush=True)
    report["full_fps"] = round(1.0 / prev, 2)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
