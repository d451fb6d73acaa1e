"""Unit tests for the training supervisor's progress/completion logic.

The supervisor (tools/supervise_train.py) has no reference counterpart —
the reference loses up to SNAPSHOT_ITERS iterations on any wedge
(``lib/fcn/train.py:238-253``).  These tests pin the pure helpers that the
stall/complete decisions ride on, so the relaunch loop is trustworthy
without spinning up real children.
"""

import importlib.util
import os
import sys

import pytest

_TOOLS = os.path.join(os.path.dirname(__file__), os.pardir, "tools")


@pytest.fixture(scope="module")
def sup():
    sys.path.insert(0, os.path.abspath(_TOOLS))
    spec = importlib.util.spec_from_file_location(
        "supervise_train", os.path.join(_TOOLS, "supervise_train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestLatestRow:
    def test_missing_file(self, sup, tmp_path):
        it, mtime = sup.latest_row(str(tmp_path / "nope.csv"))
        assert it is None and mtime is None

    def test_normal_rows(self, sup, tmp_path):
        p = tmp_path / "train_metrics.csv"
        p.write_text("iter,time,loss\n20,1.0,0.5\n40,2.0,0.4\n")
        it, mtime = sup.latest_row(str(p))
        assert it == 40
        assert mtime is not None

    def test_header_only_is_unparseable(self, sup, tmp_path):
        p = tmp_path / "train_metrics.csv"
        p.write_text("iter,time,loss\n")
        it, mtime = sup.latest_row(str(p))
        assert it is None
        assert mtime is not None  # file exists; mtime still reported

    def test_long_file_reads_tail_only(self, sup, tmp_path):
        # > 4096-byte file: the helper seeks to the tail; the last row must
        # still be parsed even when the seek lands mid-line
        p = tmp_path / "train_metrics.csv"
        rows = ["iter,time,loss"]
        rows += [f"{i},{i}.0,0.{i % 10}" for i in range(20, 20001, 20)]
        p.write_text("\n".join(rows) + "\n")
        assert p.stat().st_size > 4096
        it, _ = sup.latest_row(str(p))
        assert it == 20000

    def test_truncated_last_line(self, sup, tmp_path):
        # a SIGKILL mid-write leaves a partial row; must not crash, and a
        # float-formatted iter still parses
        p = tmp_path / "train_metrics.csv"
        p.write_text("iter,time,loss\n20,1.0,0.5\n40.0,2.0")
        it, _ = sup.latest_row(str(p))
        assert it == 40


class TestLatestCkptIter:
    def test_missing_dir(self, sup, tmp_path):
        assert sup.latest_ckpt_iter(str(tmp_path / "nope")) is None

    def test_empty_dir(self, sup, tmp_path):
        assert sup.latest_ckpt_iter(str(tmp_path)) is None

    def test_picks_max_and_ignores_noise(self, sup, tmp_path):
        for name in [
            "vgg16_fcn_color_iter_40000.npz",
            "vgg16_fcn_color_iter_160000.npz",
            "vgg16_fcn_color_iter_80000.npz",
            "train_metrics.csv",            # not a checkpoint
            "vgg16_fcn_color_iter_bad.npz",  # unparseable iter
            "eval_summary.npz",             # no _iter_ marker
        ]:
            (tmp_path / name).write_bytes(b"x")
        assert sup.latest_ckpt_iter(str(tmp_path)) == 160000

    def test_completion_when_csv_short_of_iters(self, sup, tmp_path):
        # the exact scenario from the advisor finding: --iters not a
        # DISPLAY multiple -> final CSV row < --iters, but the final
        # checkpoint exists.  The completion predicate used by main() is
        # (csv_it >= iters) or (ckpt_it >= iters); assert the ckpt side.
        (tmp_path / "net_iter_16001.npz").write_bytes(b"x")
        csv = tmp_path / "train_metrics.csv"
        csv.write_text("iter,time,loss\n16000,1.0,0.1\n")
        csv_it, _ = sup.latest_row(str(csv))
        ckpt_it = sup.latest_ckpt_iter(str(tmp_path))
        iters = 16001
        assert not (csv_it is not None and csv_it >= iters)
        assert ckpt_it is not None and ckpt_it >= iters


class TestRunDirFor:
    def test_output_override_wins(self, sup):
        assert sup.run_dir_for(None, "ignored", "vgg16_convs",
                               "/tmp/override") == "/tmp/override"


class TestPrefixFilter:
    def test_stale_other_run_ckpt_ignored(self, sup, tmp_path):
        # advisor finding: a reused output dir holding a longer previous
        # run's snapshots must not satisfy a new run's completion
        (tmp_path / "old_long_run_iter_160000.npz").write_bytes(b"x")
        (tmp_path / "vgg16_fcn_new_iter_5000.npz").write_bytes(b"x")
        it, name = sup.latest_ckpt(str(tmp_path), prefix="vgg16_fcn_new")
        assert (it, name) == (5000, "vgg16_fcn_new_iter_5000.npz")
        # unfiltered view still sees the global max (back-compat helper)
        assert sup.latest_ckpt_iter(str(tmp_path)) == 160000

    def test_prefix_must_match_full_stem(self, sup, tmp_path):
        (tmp_path / "net_v2_iter_100.npz").write_bytes(b"x")
        assert sup.latest_ckpt(str(tmp_path), prefix="net")[0] is None


def _spawn(code):
    import subprocess
    import sys

    return subprocess.Popen([sys.executable, "-c", code],
                            start_new_session=True)


class TestWaitSnapshotThenKill:
    """The round-4 live failure: a 90 s fixed grace SIGKILLed the child
    mid-signal-snapshot (device fetch ~15 min) and the resume lost ~5K
    iterations. These pin the replacement policy with real child
    processes."""

    def test_clean_exit_within_grace(self, sup, tmp_path):
        child = _spawn("import time; time.sleep(0.5)")
        out = sup.wait_snapshot_then_kill(
            child, str(tmp_path), "net", grace_sec=30.0,
            settle_sec=0.2, poll_sec=0.1, log=lambda m: None)
        assert out == "clean"
        assert child.returncode == 0

    def test_snapshot_lands_then_kill(self, sup, tmp_path):
        # child simulates a slow snapshot (atomic rename) then wedges: the
        # supervisor must NOT wait the full grace once the snapshot is on
        # disk, and must SIGKILL after settle
        import time as _t

        code = (
            "import os, time\n"
            f"d = {str(tmp_path)!r}\n"
            "time.sleep(0.6)\n"
            "tmp = os.path.join(d, 'net_iter_150.npz.tmp')\n"
            "open(tmp, 'wb').write(b'x')\n"
            "os.replace(tmp, os.path.join(d, 'net_iter_150.npz'))\n"
            "time.sleep(600)\n"
        )
        (tmp_path / "net_iter_100.npz").write_bytes(b"x")  # pre-kill ckpt
        child = _spawn(code)
        t0 = _t.time()
        out = sup.wait_snapshot_then_kill(
            child, str(tmp_path), "net", grace_sec=120.0,
            settle_sec=0.3, poll_sec=0.1, log=lambda m: None)
        assert out == "snapshot-kill"
        assert _t.time() - t0 < 30.0  # short-circuited, not full grace
        assert child.poll() is not None

    def test_grace_expiry_kills_wedged_child(self, sup, tmp_path):
        child = _spawn("import time; time.sleep(600)")
        out = sup.wait_snapshot_then_kill(
            child, str(tmp_path), "net", grace_sec=0.5,
            settle_sec=0.2, poll_sec=0.1, log=lambda m: None)
        assert out == "grace-kill"
        assert child.poll() is not None

    def test_pre_existing_ckpt_not_mistaken_for_fresh(self, sup, tmp_path):
        # a checkpoint that predates the SIGTERM must not count as the
        # signal snapshot landing
        (tmp_path / "net_iter_100.npz").write_bytes(b"x")
        child = _spawn("import time; time.sleep(600)")
        out = sup.wait_snapshot_then_kill(
            child, str(tmp_path), "net", grace_sec=0.6,
            settle_sec=0.1, poll_sec=0.1, log=lambda m: None)
        assert out == "grace-kill"
