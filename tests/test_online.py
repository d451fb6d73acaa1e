"""Online streaming inference tool (the ROS-node equivalent,
reference ros/listener.py): watch-dir mode and the JSON-over-TCP server."""

import json
import os
import socket
import sys
import threading

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def _engine():
    import argparse

    import online as onl

    args = argparse.Namespace(
        cfg_file="experiments/cfgs/toy_pose.yml", model=None, device="cpu"
    )
    return onl, onl.build_engine(args)


@pytest.fixture(scope="module")
def engine():
    return _engine()


def _frame(tmpdir, name="000001"):
    import cv2

    im = (np.random.RandomState(0).rand(96, 128, 3) * 255).astype(np.uint8)
    path = os.path.join(str(tmpdir), f"{name}-color.png")
    cv2.imwrite(path, im)
    return path


def test_watch_loop_processes_frames(engine, tmp_path):
    onl, process = engine
    _frame(tmp_path)
    onl.watch_loop(process, str(tmp_path), poll=0.01, once=True)
    out = json.load(open(os.path.join(str(tmp_path), "000001-posecnn.json")))
    assert out["frame"] == "000001"
    assert isinstance(out["detections"], list)
    for d in out["detections"]:
        assert set(d) >= {"class", "box", "score", "quaternion_wxyz", "translation"}


def test_tcp_server_detections(engine, tmp_path):
    onl, process = engine
    path = _frame(tmp_path)
    with socket.socket() as probe:
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]

    t = threading.Thread(target=onl.serve, args=(process, port), daemon=True)
    t.start()
    import time

    deadline = time.time() + 30
    while time.time() < deadline:
        try:
            s = socket.create_connection(("127.0.0.1", port), timeout=1)
            break
        except OSError:
            time.sleep(0.2)
    else:
        pytest.fail("server did not come up")
    with s:
        # the 1s connect timeout sticks to the socket; the first frame jit-
        # compiles under CI contention, so give the response plenty of room
        s.settimeout(300)
        s.sendall((json.dumps({"file": path}) + "\n").encode())
        buf = b""
        while not buf.endswith(b"\n"):
            chunk = s.recv(65536)
            if not chunk:
                break
            buf += chunk
    resp = json.loads(buf)
    assert resp["ok"] is True
    assert isinstance(resp["detections"], list)
