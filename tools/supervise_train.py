#!/usr/bin/env python
"""Stall-tolerant training supervisor.

The reference has no failure recovery at all: a wedged TF session loses up
to SNAPSHOT_ITERS iterations (`lib/fcn/train.py:238-253`). Here the device
link is a remote TPU tunnel that can wedge a single RPC indefinitely, so
long runs are driven through this supervisor:

  * launches `tools/train_net.py --resume` as a child process;
  * watches the run's `train_metrics.csv` for forward progress;
  * on a stall (no new metric row for --stall-sec) sends SIGTERM — the
    Solver's signal handler snapshots the current state (engine/train.py)
    so the kill is lossless — then escalates to SIGKILL and relaunches
    with --resume;
  * exits when the child completes the requested iteration count.

Usage:
  python tools/supervise_train.py --cfg experiments/cfgs/foo.yml \
      --imdb lov_syn_train --iters 40000 [--stall-sec 120] [--max-restarts 20]
"""

import argparse
import os
import signal
import subprocess
import sys
import time

import _init_paths  # noqa: F401


def latest_row(csv_path):
    """(iter, mtime) of the metrics file, or (None, None)."""
    try:
        st = os.stat(csv_path)
    except OSError:
        return None, None
    try:
        with open(csv_path, "rb") as f:
            f.seek(max(0, st.st_size - 4096))
            lines = f.read().decode(errors="replace").strip().splitlines()
        last = lines[-1].split(",")
        return int(float(last[0])), st.st_mtime
    except (ValueError, IndexError, OSError):
        return None, st.st_mtime


def latest_ckpt_iter(out_dir):
    """Highest iteration among `*_iter_N.npz` snapshots in the run dir.

    The metrics CSV only gains a row every TRAIN.DISPLAY iterations, so a
    run whose --iters is not a DISPLAY multiple finishes with a final CSV
    row short of --iters; the final checkpoint is the authoritative
    completion marker.
    """
    best = None
    try:
        names = os.listdir(out_dir)
    except OSError:
        return None
    for name in names:
        if not name.endswith(".npz") or "_iter_" not in name:
            continue
        try:
            it = int(name.rsplit("_iter_", 1)[1].split(".")[0])
        except ValueError:
            continue
        best = it if best is None else max(best, it)
    return best


def run_dir_for(cfg_file, imdb_name, network, output_override):
    if output_override:
        return output_override
    from posecnn_tpu.core.config import cfg_from_file, get_output_dir
    from posecnn_tpu.data.factory import get_imdb

    if cfg_file:
        cfg_from_file(cfg_file)
    imdb = get_imdb(imdb_name)
    # same (imdb, network) layout as tools/train_net.py:162
    return get_output_dir(imdb.name, network)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--imdb", required=True)
    ap.add_argument("--iters", type=int, required=True)
    ap.add_argument("--network", default="vgg16_convs",
                    help="network name (must match the child's run dir)")
    ap.add_argument("--output", default=None)
    ap.add_argument("--stall-sec", type=float, default=120.0)
    ap.add_argument("--warmup-sec", type=float, default=900.0,
                    help="stall threshold before the first new metric row")
    ap.add_argument("--grace-sec", type=float, default=90.0,
                    help="SIGTERM->SIGKILL grace (covers the signal snapshot)")
    ap.add_argument("--max-restarts", type=int, default=20)
    ap.add_argument("--log", default=None, help="child stdout/stderr file")
    args, passthrough = ap.parse_known_args()

    out_dir = run_dir_for(args.cfg, args.imdb, args.network, args.output)
    csv_path = os.path.join(out_dir, "train_metrics.csv")
    print(f"[supervisor] run dir: {out_dir}", flush=True)

    base_cmd = [
        sys.executable, os.path.join(os.path.dirname(__file__), "train_net.py"),
        "--cfg", args.cfg, "--imdb", args.imdb, "--iters", str(args.iters),
        "--network", args.network, "--resume",
    ] + passthrough
    if args.output:
        base_cmd += ["--output", args.output]

    logf = open(args.log, "ab", buffering=0) if args.log else None
    restarts = 0
    clean_exits_no_progress = 0
    while True:
        it0, _ = latest_row(csv_path)
        print(f"[supervisor] launch (restart {restarts}, resume from "
              f"iter={it0 if it0 is not None else 'scratch'})", flush=True)
        child = subprocess.Popen(
            base_cmd, stdout=logf or None, stderr=subprocess.STDOUT if logf else None,
            start_new_session=True,
        )
        # progress watch: a fresh launch pays checkpoint load + (cached)
        # compile before the first row lands, so the stall threshold is
        # --warmup-sec until this launch writes its first new row, then
        # --stall-sec
        last_change = time.time()
        last_it, _ = latest_row(csv_path)
        progressed = False
        stalled = False
        while True:
            rc = child.poll()
            if rc is not None:
                break
            time.sleep(10.0)
            it, _ = latest_row(csv_path)
            if it != last_it:
                last_it = it
                last_change = time.time()
                progressed = True
            threshold = args.stall_sec if progressed else args.warmup_sec
            if time.time() - last_change > threshold:
                stalled = True
                break
        if stalled:
            print(f"[supervisor] stall at iter={last_it}: SIGTERM "
                  f"(snapshot-on-signal), grace {args.grace_sec}s", flush=True)
            try:
                os.killpg(child.pid, signal.SIGTERM)
            except ProcessLookupError:
                pass
            try:
                child.wait(timeout=args.grace_sec)
            except subprocess.TimeoutExpired:
                print("[supervisor] grace expired: SIGKILL", flush=True)
                try:
                    os.killpg(child.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                child.wait()
        else:
            rc = child.returncode
            it, _ = latest_row(csv_path)
            if rc == 0:
                # CSV rows land every TRAIN.DISPLAY iters, so the final row
                # can be short of --iters; the final checkpoint (or two
                # consecutive clean exits without CSV progress — the child
                # itself refuses to train past max_iters) settles it
                ckpt_it = latest_ckpt_iter(out_dir)
                if (it is not None and it >= args.iters) or \
                        (ckpt_it is not None and ckpt_it >= args.iters):
                    print(f"[supervisor] complete at iter={it} "
                          f"(ckpt={ckpt_it})", flush=True)
                    return 0
                if not progressed:
                    clean_exits_no_progress += 1
                    if clean_exits_no_progress >= 2:
                        print(f"[supervisor] two clean exits without CSV "
                              f"progress (iter={it}, ckpt={ckpt_it}): "
                              f"treating run as complete", flush=True)
                        return 0
                else:
                    clean_exits_no_progress = 0
            else:
                clean_exits_no_progress = 0
            print(f"[supervisor] child exited rc={rc} at iter={it}", flush=True)
        restarts += 1
        if restarts > args.max_restarts:
            print("[supervisor] max restarts exceeded", flush=True)
            return 1
        time.sleep(3.0)


if __name__ == "__main__":
    sys.exit(main())
