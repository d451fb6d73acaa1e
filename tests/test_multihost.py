"""Real multi-process (multi-"host") test: two coordinated CPU processes
form one global JAX runtime, build a 4-device global mesh, and run (a) a
cross-process psum and (b) the REAL PoseCNN train step (tiny trunk) with
each process contributing its local half of the global batch — gradients
reduce over a data axis that spans both processes.

This is the CPU stand-in for a 2-host TPU pod slice: same
jax.distributed.initialize + global-mesh + make_array_from_process_local_data
path the TPU deployment uses (SURVEY.md §2.3 comm-backend deliverable)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    sys.path.insert(0, os.environ["POSECNN_REPO"])
    from posecnn_tpu.parallel.launch import global_batch_from_local, initialize, process_local_batch_size
    from posecnn_tpu.parallel.mesh import MeshSpec, make_mesh

    initialize()  # from POSECNN_* env
    pid = jax.process_index()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())

    mesh = make_mesh(MeshSpec(data=4, model=1))
    assert process_local_batch_size(mesh, 8) == 4

    # sanity: cross-process psum through a plain jit reduction
    local = np.arange(4 * 3, dtype=np.float32).reshape(4, 3) + 100 * pid
    batch0 = global_batch_from_local(mesh, {"x": local}, batch_keys=("x",))
    import jax.numpy as jnp

    total = float(jax.jit(jnp.sum)(batch0["x"]))
    expect = float(np.arange(12).sum() + (np.arange(12) + 100).sum())
    assert abs(total - expect) < 1e-3, (total, expect)

    # the REAL train step (tiny model) across both processes: each process
    # contributes its local half of the global batch of 8 frames; params
    # replicate, gradients psum over the 4-device data axis spanning hosts
    from posecnn_tpu.engine.train import TrainHParams, create_train_state, make_train_step
    from posecnn_tpu.models.posecnn import PoseCNNConfig

    C, H, W = 4, 32, 32
    cfg = PoseCNNConfig(
        num_classes=C, num_units=8, trunk_scale=0.25, vertex_reg=True,
        pose_reg=True, is_train=True, keep_prob=1.0, compute_dtype=jnp.float32,
        hough_class_slots=2, hough_max_samples=32, hough_center_stride=4,
        hough_refine_window=8, label_threshold=5, fc_dim=64,
        # teacher-forced hough so the detections match their GT rows and the
        # ADD branch is numerically live across the process boundary (the
        # gradient path the reference spends 805 CUDA lines on,
        # average_distance_loss_op_gpu.cu.cc) — not just compiled
        hough_gt_mix=1.0,
    )
    hp = TrainHParams(stepsize=1000, learning_rate=0.01, vertex_w=1.0)

    # the SAME coherent global scene built in both processes (seed-pinned);
    # each contributes its local half of the 8 images, GT tables replicate
    from posecnn_tpu.utils.gate_batch import live_pose_batch

    gb = {k: np.asarray(v)
          for k, v in live_pose_batch(8, H, W, C, np.random.RandomState(42)).items()}
    batch_keys = ("data", "gt_label_2d", "gt_centers", "meta_data",
                  "chroma_dhls", "noise_sigma")
    local_batch = {
        k: (v[pid * 4:(pid + 1) * 4] if k in batch_keys else v)
        for k, v in gb.items()
    }
    batch = global_batch_from_local(mesh, local_batch, batch_keys=batch_keys)
    assert batch["poses"].shape == gb["poses"].shape, batch["poses"].shape
    assert batch["data"].shape == (8, H, W, 3), batch["data"].shape

    rng2 = np.random.RandomState(0)
    points = jnp.asarray(rng2.randn(C, 32, 3).astype(np.float32) * 0.05)
    symmetry = jnp.zeros(C)
    extents = jnp.asarray(0.1 + 0.1 * rng2.rand(C, 3).astype(np.float32))
    state = create_train_state(cfg, hp, jax.random.PRNGKey(0))
    step_fn = make_train_step(cfg, hp, mesh, points, symmetry, extents, donate=False)
    losses = []
    for i in range(2):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        loss = float(metrics["loss"])
        assert np.isfinite(loss), metrics
        losses.append(loss)
    loss_pose = float(metrics["loss_pose"])
    assert loss_pose > 0.0, f"pose branch inert across hosts: {metrics}"
    print(f"proc {pid} ok total={total} losses={losses} loss_pose={loss_pose}")
    """
)


@pytest.mark.slow
def test_two_process_global_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update(
            POSECNN_REPO=repo,
            POSECNN_COORDINATOR=f"127.0.0.1:{port}",
            POSECNN_NUM_PROCESSES="2",
            POSECNN_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} ok" in out
