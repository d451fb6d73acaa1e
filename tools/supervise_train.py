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


def latest_ckpt(out_dir, prefix=None):
    """(iter, filename) of the newest `*_iter_N.npz` snapshot, or (None, None).

    The metrics CSV only gains a row every TRAIN.DISPLAY iterations, so a
    run whose --iters is not a DISPLAY multiple finishes with a final CSV
    row short of --iters; the final checkpoint is the authoritative
    completion marker. With `prefix`, only snapshots of THIS run's
    TRAIN.SNAPSHOT_PREFIX count — a stale checkpoint from a previous longer
    run sharing the output dir must not satisfy a new run's completion.
    """
    best, best_name = None, None
    try:
        names = os.listdir(out_dir)
    except OSError:
        return None, None
    for name in names:
        if not name.endswith(".npz") or "_iter_" not in name:
            continue
        if prefix and not name.startswith(prefix + "_iter_"):
            continue
        try:
            it = int(name.rsplit("_iter_", 1)[1].split(".")[0])
        except ValueError:
            continue
        if best is None or it > best:
            best, best_name = it, name
    return best, best_name


def latest_ckpt_iter(out_dir, prefix=None):
    return latest_ckpt(out_dir, prefix)[0]


def wait_snapshot_then_kill(child, out_dir, prefix, grace_sec,
                            settle_sec=90.0, poll_sec=5.0, log=print):
    """After SIGTERM: give the snapshot-on-signal a real chance to land.

    The Solver's handler fetches the full train state device->host before
    writing (atomic tmp+rename, core/checkpoint.py:59-65); through the
    debug tunnel that fetch has measured anywhere from ~20 s (round-5
    npz snapshots) to ~15 min (round-1 orbax), so a fixed short
    grace SIGKILLs mid-snapshot and loses up to SNAPSHOT_ITERS — observed
    live in round 4 (stall kill at 14960 resumed from 10000). Policy:

      * the child exiting on its own is the clean path (snapshot done);
      * a NEW checkpoint landing (atomic rename => complete) makes SIGKILL
        safe — allow `settle_sec` more for a clean exit, then kill;
      * otherwise wait the full `grace_sec` before SIGKILL (a wedged child
        whose signal flag never gets checked can't snapshot; waiting
        longer than the measured snapshot time buys nothing).

    Returns "clean", "snapshot-kill", or "grace-kill".
    """
    pre_it = latest_ckpt_iter(out_dir, prefix)
    pre_it = -1 if pre_it is None else pre_it
    deadline = time.time() + grace_sec
    landed_at = None
    while time.time() < deadline:
        if child.poll() is not None:
            return "clean"
        cur = latest_ckpt_iter(out_dir, prefix)
        if landed_at is None and cur is not None and cur > pre_it:
            landed_at = time.time()
            log(f"[supervisor] signal snapshot landed (iter={cur}); "
                f"allowing {settle_sec}s for clean exit")
        if landed_at is not None and time.time() - landed_at > settle_sec:
            break
        time.sleep(poll_sec)
    outcome = "snapshot-kill" if landed_at is not None else "grace-kill"
    log(f"[supervisor] {outcome}: SIGKILL")
    try:
        os.killpg(child.pid, signal.SIGKILL)
    except ProcessLookupError:
        pass
    child.wait()
    return outcome


def run_meta_for(cfg_file, imdb_name, network, output_override):
    """(run_dir, snapshot_prefix, snapshot_iters) for the child run."""
    from posecnn_tpu.core.config import cfg, cfg_from_file, get_output_dir

    if cfg_file:
        cfg_from_file(cfg_file)
    prefix = cfg.TRAIN.SNAPSHOT_PREFIX
    snap_iters = cfg.TRAIN.SNAPSHOT_ITERS
    if output_override:
        return output_override, prefix, snap_iters
    from posecnn_tpu.data.factory import get_imdb

    imdb = get_imdb(imdb_name)
    # same (imdb, network) layout as tools/train_net.py:162
    return get_output_dir(imdb.name, network), prefix, snap_iters


def run_dir_for(cfg_file, imdb_name, network, output_override):
    return run_meta_for(cfg_file, imdb_name, network, output_override)[0]


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
    ap.add_argument("--grace-sec", type=float, default=1800.0,
                    help="SIGTERM->SIGKILL grace; must cover the measured "
                         "signal-snapshot time (measured 20 s-15 min "
                         "through the tunnel, BASELINE.md). A landed "
                         "snapshot short-circuits the wait (--settle-sec).")
    ap.add_argument("--settle-sec", type=float, default=90.0,
                    help="extra wait for a clean exit once the signal "
                         "snapshot has landed on disk")
    ap.add_argument("--max-restarts", type=int, default=20)
    ap.add_argument("--log", default=None, help="child stdout/stderr file")
    args, passthrough = ap.parse_known_args()

    out_dir, snap_prefix, snap_iters = run_meta_for(
        args.cfg, args.imdb, args.network, args.output)
    csv_path = os.path.join(out_dir, "train_metrics.csv")
    print(f"[supervisor] run dir: {out_dir} "
          f"(snapshots {snap_prefix}_iter_N.npz every {snap_iters})", flush=True)

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
            outcome = wait_snapshot_then_kill(
                child, out_dir, snap_prefix, args.grace_sec,
                settle_sec=args.settle_sec,
                log=lambda m: print(m, flush=True))
            print(f"[supervisor] stall handled: {outcome}", flush=True)
        else:
            rc = child.returncode
            it, _ = latest_row(csv_path)
            if rc == 0:
                # CSV rows land every TRAIN.DISPLAY iters, so the final row
                # can be short of --iters; the final checkpoint settles it
                ckpt_it, ckpt_name = latest_ckpt(out_dir, snap_prefix)
                if (it is not None and it >= args.iters) or \
                        (ckpt_it is not None and ckpt_it >= args.iters):
                    print(f"[supervisor] complete at iter={it} "
                          f"(ckpt={ckpt_name})", flush=True)
                    return 0
                if not progressed:
                    # the child itself refuses to train past max_iters, so
                    # repeated clean exits without CSV progress mean it
                    # believes it's done — but only call that completion
                    # when a checkpoint actually reached within one
                    # snapshot interval of --iters; anything else (e.g. an
                    # externally SIGTERMed child exiting 0 early) is a
                    # give-up, reported as failure, not success
                    clean_exits_no_progress += 1
                    if clean_exits_no_progress >= 2:
                        best = max(ckpt_it or -1, it or -1)
                        if best >= args.iters - snap_iters and best >= 0:
                            print(f"[supervisor] two clean exits without "
                                  f"CSV progress at iter={best} (within one "
                                  f"SNAPSHOT_ITERS of {args.iters}, "
                                  f"ckpt={ckpt_name}): complete", flush=True)
                            return 0
                        print(f"[supervisor] giving up: two clean exits "
                              f"without progress but iter={best} is short "
                              f"of --iters {args.iters} "
                              f"(ckpt={ckpt_name})", flush=True)
                        return 2
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
