"""End-to-end training tests on the 8-device CPU mesh: full train step
(forward + hough + ADD loss + backward + momentum update), loss decrease,
snapshot/restore, and batched-vs-generic RoI pooling agreement."""

import jax
import jax.numpy as jnp
import numpy as np

from posecnn_tpu.engine.train import TrainHParams, create_train_state, make_train_step
from posecnn_tpu.models.posecnn import PoseCNNConfig, init_posecnn_params
from posecnn_tpu.parallel.mesh import MeshSpec, make_mesh

C = 4
H = W = 32
B = 8


def _cfg():
    return PoseCNNConfig(
        num_classes=C, num_units=8, trunk_scale=0.25, vertex_reg=True, pose_reg=True, is_train=True,
        keep_prob=1.0, compute_dtype=jnp.float32, hough_class_slots=2,
        hough_max_samples=32, hough_center_stride=4, hough_refine_window=8,
        label_threshold=5, fc_dim=64,
    )


def _batch(rng):
    meta = np.zeros((B, 48), np.float32)
    meta[:, 0] = meta[:, 4] = 60.0
    meta[:, 2], meta[:, 5] = W / 2.0, H / 2.0
    return {
        "data": jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)),
        "gt_label_2d": jnp.asarray(rng.randint(0, C, size=(B, H, W)).astype(np.int32)),
        "vertex_targets": jnp.asarray(rng.randn(B, H, W, 3 * C).astype(np.float32) * 0.1),
        "vertex_weights": jnp.asarray((rng.rand(B, H, W, 3 * C) > 0.7).astype(np.float32)),
        "meta_data": jnp.asarray(meta),
        "poses": jnp.zeros((8, 13), jnp.float32),
    }


def test_train_step_runs_and_loss_decreases():
    rng = np.random.RandomState(0)
    cfg = _cfg()
    hp = TrainHParams(stepsize=1000, learning_rate=0.01, vertex_w=1.0)
    mesh = make_mesh(MeshSpec(data=8, model=1))
    points = jnp.asarray(rng.randn(C, 32, 3).astype(np.float32) * 0.05)
    symmetry = jnp.zeros(C)
    extents = jnp.asarray(0.1 + 0.1 * rng.rand(C, 3).astype(np.float32))

    state = create_train_state(cfg, hp, jax.random.PRNGKey(0))
    step = make_train_step(cfg, hp, mesh, points, symmetry, extents, donate=False)
    batch = _batch(rng)

    losses = []
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    # same batch repeated: total loss must go down
    assert losses[-1] < losses[0]
    assert int(state[2]) == 4


def test_resume_past_decay_applies_decayed_lr():
    """Regression (round-5 z A/B incident): the applied lr must follow the
    solver's restored step counter, not optax's internal ScaleBySchedule
    count. A CHECKPOINT_OPT_STATE=False resume re-inits opt_state, and with
    the schedule inside optax.sgd a post-decay resume trained at
    sched(0)=LEARNING_RATE while logging sched(step) — 10x hot, destroying a
    settled model (val IoU 0.894->0.52 in 12K iters). Simulate that resume:
    fresh opt_state + step counter past the decay boundary; the parameter
    update must be gamma x the pre-decay update."""
    rng = np.random.RandomState(1)
    cfg = _cfg()
    hp = TrainHParams(stepsize=10, learning_rate=0.01, gamma=0.1, vertex_w=1.0)
    mesh = make_mesh(MeshSpec(data=8, model=1))
    points = jnp.asarray(rng.randn(C, 32, 3).astype(np.float32) * 0.05)
    symmetry = jnp.zeros(C)
    extents = jnp.asarray(0.1 + 0.1 * rng.rand(C, 3).astype(np.float32))
    step = make_train_step(cfg, hp, mesh, points, symmetry, extents, donate=False)
    batch = _batch(rng)

    def delta_from(step_counter):
        # fresh params + fresh opt_state at a given restored step counter —
        # exactly what Solver.resume builds when opt state isn't snapshotted
        state = create_train_state(cfg, hp, jax.random.PRNGKey(0))
        state = (state[0], state[1], jnp.asarray(step_counter, jnp.int32))
        (params2, _, _), metrics = step(state, batch, jax.random.PRNGKey(7))
        deltas = jax.tree_util.tree_map(
            lambda a, b: jnp.sum(jnp.abs(a - b)), params2, state[0]
        )
        d = float(sum(jax.tree_util.tree_leaves(deltas)))
        return d, float(metrics["lr"])

    d0, lr0 = delta_from(0)
    d1, lr1 = delta_from(hp.stepsize + 1)
    assert np.isclose(lr0, hp.learning_rate)
    assert np.isclose(lr1, hp.learning_rate * hp.gamma)
    # same grads, same momentum init: update magnitudes scale with the lr
    # (5% tolerance: f32 param-delta cancellation at 1e-8 magnitudes; the
    # regression this guards was a 10x error)
    assert np.isclose(d1 / d0, hp.gamma, rtol=5e-2), (d0, d1)


def _blob_scene(B=2, G=2):
    """Per-image class blobs with consistent GT labels/centers/poses, so the
    IoU>0.2 target gate actually matches when hough runs on GT inputs."""
    label = np.zeros((B, H, W), np.int32)
    centers = np.zeros((B, G, 4), np.float32)  # rows [cls, cx, cy, z]
    poses = np.zeros((B * G, 13), np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    for b in range(B):
        cx, cy, z, cls = 14.0 + 2 * b, 15.0, 1.0, 1 + b % (C - 1)
        label[b][(xx - cx) ** 2 + (yy - cy) ** 2 < 64] = cls
        centers[b, 0] = [cls, cx, cy, z]
        poses[b * G, 0] = b
        poses[b * G, 1] = cls
        poses[b * G, 6:10] = [1, 0, 0, 0]
        poses[b * G, 10:] = [(cx - W / 2.0) / 60.0 * z, (cy - H / 2.0) / 60.0 * z, z]
    return label, centers, poses


def test_hough_gt_mix_matches_hough_from_gt_at_p1():
    """hough_gt_mix=1.0 must produce the same hough ROIs/targets as the
    deterministic hough_from_gt isolation path."""
    from posecnn_tpu.models.posecnn import init_posecnn_params, posecnn_forward

    rng = np.random.RandomState(1)
    label, centers, poses = _blob_scene()
    B = label.shape[0]
    meta = np.zeros((B, 48), np.float32)
    meta[:, 0] = meta[:, 4] = 60.0
    meta[:, 2], meta[:, 5] = W / 2.0, H / 2.0
    data = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    extents = jnp.asarray(np.full((C, 3), 0.25, np.float32))
    base = _cfg()
    params = init_posecnn_params(jax.random.PRNGKey(0), base)
    kw = dict(
        gt_poses=jnp.asarray(poses),
        gt_label_2d=jnp.asarray(label),
        gt_centers=jnp.asarray(centers),
        rng=jax.random.PRNGKey(7),
    )
    from dataclasses import replace

    out_iso = posecnn_forward(
        params, replace(base, hough_from_gt=True), data, extents, jnp.asarray(meta), **kw
    )
    out_mix = posecnn_forward(
        params, replace(base, hough_gt_mix=1.0), data, extents, jnp.asarray(meta), **kw
    )
    np.testing.assert_allclose(np.asarray(out_iso["rois"]), np.asarray(out_mix["rois"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out_iso["poses_target"]), np.asarray(out_mix["poses_target"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_iso["poses_weight"]), np.asarray(out_mix["poses_weight"]), rtol=1e-6
    )
    # GT-driven hough must yield matched pose targets (nonzero weights)
    assert np.asarray(out_mix["poses_weight"]).sum() > 0


def test_train_step_hough_gt_mix_runs():
    """Full train step with mixed teacher forcing: compiles, runs, finite."""
    rng = np.random.RandomState(0)
    from dataclasses import replace

    cfg = replace(_cfg(), hough_gt_mix=0.5)
    hp = TrainHParams(stepsize=1000, learning_rate=0.01, vertex_w=1.0)
    mesh = make_mesh(MeshSpec(data=8, model=1))
    points = jnp.asarray(rng.randn(C, 32, 3).astype(np.float32) * 0.05)
    label, centers, poses = _blob_scene(B=B)
    meta = np.zeros((B, 48), np.float32)
    meta[:, 0] = meta[:, 4] = 60.0
    meta[:, 2], meta[:, 5] = W / 2.0, H / 2.0
    batch = {
        "data": jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)),
        "gt_label_2d": jnp.asarray(label),
        "gt_centers": jnp.asarray(centers),
        "vertex_targets": jnp.asarray(rng.randn(B, H, W, 3 * C).astype(np.float32) * 0.1),
        "vertex_weights": jnp.asarray((rng.rand(B, H, W, 3 * C) > 0.7).astype(np.float32)),
        "meta_data": jnp.asarray(meta),
        "poses": jnp.asarray(poses),
    }
    state = create_train_state(cfg, hp, jax.random.PRNGKey(0))
    step = make_train_step(cfg, hp, mesh, points, jnp.zeros(C), jnp.asarray(np.full((C, 3), 0.25, np.float32)), donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics.get("loss_pose", metrics["loss"])))


def test_roi_pool_batched_matches_generic():
    from posecnn_tpu.ops.roi_pool import roi_pool, roi_pool_batched

    rng = np.random.RandomState(1)
    feat = rng.randn(2, 8, 10, 6).astype(np.float32)
    D = 3
    rois = np.zeros((2, D, 7), np.float32)
    for b in range(2):
        for d in range(D):
            x1, y1 = rng.randint(0, 50), rng.randint(0, 30)
            rois[b, d] = [b, rng.randint(0, 6), x1, y1, x1 + rng.randint(8, 40), y1 + rng.randint(8, 40), 1.0]
    batched = np.asarray(roi_pool_batched(jnp.asarray(feat), jnp.asarray(rois), 4, 1.0 / 8.0))
    generic = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois.reshape(-1, 7)), 4, 4, 1.0 / 8.0))
    np.testing.assert_allclose(batched.reshape(-1, 4, 4, 6), generic, atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    from posecnn_tpu.core.checkpoint import restore_checkpoint, save_checkpoint

    cfg = _cfg()
    hp = TrainHParams()
    state = create_train_state(cfg, hp, jax.random.PRNGKey(0))
    path = save_checkpoint(str(tmp_path), state, step=7, prefix="t")
    state2 = create_train_state(cfg, hp, jax.random.PRNGKey(1))
    restored = restore_checkpoint(path, state2)
    leaves1 = jax.tree_util.tree_leaves(state[0])
    leaves2 = jax.tree_util.tree_leaves(restored[0])
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_solver_resume_roundtrip(tmp_path):
    """snapshot -> resume restores params and the iteration counter."""
    import numpy as np

    from posecnn_tpu.engine.train import Solver, TrainHParams, create_train_state
    from posecnn_tpu.models.posecnn import PoseCNNConfig

    C = 3
    cfg = PoseCNNConfig(
        num_classes=C, num_units=8, trunk_scale=0.25, vertex_reg=False, pose_reg=False,
        is_train=True, compute_dtype=jnp.float32, fc_dim=32,
    )
    hp = TrainHParams()
    rng = np.random.RandomState(0)
    solver = Solver(
        cfg, hp, points=np.zeros((C, 8, 3), np.float32),
        symmetry=np.zeros(C, np.float32), extents=0.1 + np.zeros((C, 3), np.float32),
        output_dir=str(tmp_path), snapshot_iters=10**9, display=10**9,
    )
    state = create_train_state(cfg, hp, jax.random.PRNGKey(0))
    solver.snapshot(state, it=7)
    state2 = create_train_state(cfg, hp, jax.random.PRNGKey(1))
    restored, start = solver.resume(state2, log=None)
    assert start == 0 or start == int(restored[2])
    p0 = jax.tree_util.tree_leaves(state[0])
    p1 = jax.tree_util.tree_leaves(restored[0])
    for a, b in zip(p0, p1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_train_step_tensor_parallel_mesh():
    """The train step must compile and run on a (data=4, model=2) mesh with
    fc6 channel-sharded over the model axis (TP via param_sharding)."""
    import numpy as np

    from posecnn_tpu.engine.train import (
        TrainHParams, create_train_state, make_train_step, state_shardings,
    )
    from posecnn_tpu.models.posecnn import PoseCNNConfig
    from posecnn_tpu.parallel.mesh import MODEL_AXIS, MeshSpec, make_mesh

    C = 3
    cfg = PoseCNNConfig(
        num_classes=C, num_units=8, trunk_scale=0.25, vertex_reg=True, pose_reg=True,
        is_train=True, compute_dtype=jnp.float32, hough_class_slots=2,
        hough_max_samples=32, hough_center_stride=4, hough_refine_window=8,
        label_threshold=5, fc_dim=256,
    )
    hp = TrainHParams(stepsize=100)
    mesh = make_mesh(MeshSpec(data=4, model=2))
    # narrow-trunk test graph: lower the TP size threshold (as the multichip
    # dryrun does) so the scaled fc6 kernel still channel-shards
    from posecnn_tpu.parallel import mesh as mesh_mod

    old_tp = mesh_mod.TP_MIN_SIZE
    mesh_mod.set_tp_min_size(1 << 14)
    ssh = state_shardings(mesh, create_train_state(cfg, hp, jax.random.PRNGKey(0)))
    # fc6 kernel crosses the (lowered) TP size threshold -> model-sharded
    assert MODEL_AXIS in str(ssh[0]["fc6"]["weights"].spec)

    rng = np.random.RandomState(0)
    B, H, W, P = 4, 32, 32, 16
    state = create_train_state(cfg, hp, jax.random.PRNGKey(0))
    step = make_train_step(
        cfg, hp, mesh,
        jnp.asarray(rng.randn(C, P, 3).astype(np.float32) * 0.05),
        jnp.zeros(C, jnp.float32),
        jnp.asarray(0.1 + 0.1 * rng.rand(C, 3).astype(np.float32)),
        donate=False,
    )
    meta = np.zeros((B, 48), np.float32)
    meta[:, 0] = meta[:, 4] = 60.0
    meta[:, 2], meta[:, 5] = W / 2.0, H / 2.0
    batch = {
        "data": jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)),
        "gt_label_2d": jnp.asarray(rng.randint(0, C, size=(B, H, W)).astype(np.int32)),
        "vertex_targets": jnp.asarray(rng.randn(B, H, W, 3 * C).astype(np.float32) * 0.1),
        "vertex_weights": jnp.asarray((rng.rand(B, H, W, 3 * C) > 0.7).astype(np.float32)),
        "meta_data": jnp.asarray(meta),
        "poses": jnp.asarray(np.zeros((4, 13), np.float32)),
    }
    try:
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
    finally:
        mesh_mod.set_tp_min_size(old_tp)


def test_solver_sigterm_snapshot_survives_broken_log(tmp_path):
    """A SIGTERM whose downstream log pipe is already dead must still write
    the preemption snapshot (the log wrapper swallows OSError)."""
    import os
    import signal
    import threading

    from posecnn_tpu.engine.train import Solver, TrainHParams, create_train_state
    from posecnn_tpu.models.posecnn import PoseCNNConfig

    C3 = 3
    cfg = PoseCNNConfig(
        num_classes=C3, num_units=8, trunk_scale=0.25, vertex_reg=False,
        pose_reg=False, is_train=True, compute_dtype=jnp.float32, fc_dim=32,
    )
    hp = TrainHParams()
    rng = np.random.RandomState(0)
    # single-device mesh: the 8-virtual-device compile takes minutes on a
    # contended single-core host and the point here is signal handling
    solver = Solver(
        cfg, hp, points=np.zeros((C3, 8, 3), np.float32),
        symmetry=np.zeros(C3, np.float32), extents=0.1 + np.zeros((C3, 3), np.float32),
        output_dir=str(tmp_path), snapshot_iters=10**9, display=1,
        mesh=make_mesh(MeshSpec(data=1, model=1)),
    )

    def broken_log(msg):
        raise BrokenPipeError(32, "Broken pipe")

    meta = np.zeros((1, 48), np.float32)
    meta[:, 0] = meta[:, 4] = 60.0
    meta[:, 2], meta[:, 5] = W / 2.0, H / 2.0

    def batches():
        while True:
            yield {
                "data": jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32)),
                "gt_label_2d": jnp.zeros((1, H, W), jnp.int32),
                "meta_data": jnp.asarray(meta),
                "poses": jnp.zeros((8, 13), jnp.float32),
            }

    state = create_train_state(cfg, hp, jax.random.PRNGKey(0))
    # deliver SIGTERM shortly after the loop starts; the loop then hits the
    # broken log on the display line AND on the "signal received" line
    threading.Timer(0.5, lambda: os.kill(os.getpid(), signal.SIGTERM)).start()
    solver.train(batches(), state, max_iters=10**6, log=broken_log)
    snaps = [f for f in os.listdir(tmp_path) if "iter_" in f]
    assert snaps, "preemption snapshot missing after SIGTERM with broken log"


def test_solver_snapshot_final_gate(tmp_path):
    """TRAIN.SNAPSHOT_FINAL=False skips the end-of-run snapshot (measurement
    runs must not pay the ~15 min device->host state fetch); the default
    keeps writing it when max_iters is off the periodic grid."""
    import os

    from posecnn_tpu.engine.train import Solver, TrainHParams, create_train_state
    from posecnn_tpu.models.posecnn import PoseCNNConfig

    C3 = 3
    cfg = PoseCNNConfig(
        num_classes=C3, num_units=8, trunk_scale=0.25, vertex_reg=False,
        pose_reg=False, is_train=True, compute_dtype=jnp.float32, fc_dim=32,
    )
    hp = TrainHParams()
    rng = np.random.RandomState(0)
    meta = np.zeros((1, 48), np.float32)
    meta[:, 0] = meta[:, 4] = 60.0
    meta[:, 2], meta[:, 5] = W / 2.0, H / 2.0

    def batches():
        while True:
            yield {
                "data": jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32)),
                "gt_label_2d": jnp.zeros((1, H, W), jnp.int32),
                "meta_data": jnp.asarray(meta),
                "poses": jnp.zeros((8, 13), jnp.float32),
            }

    for final, expect in ((False, 0), (True, 1)):
        out = tmp_path / f"final_{final}"
        out.mkdir()
        solver = Solver(
            cfg, hp, points=np.zeros((C3, 8, 3), np.float32),
            symmetry=np.zeros(C3, np.float32),
            extents=0.1 + np.zeros((C3, 3), np.float32),
            output_dir=str(out), snapshot_iters=10**9, display=10**9,
            mesh=make_mesh(MeshSpec(data=1, model=1)), snapshot_final=final,
        )
        state = create_train_state(cfg, hp, jax.random.PRNGKey(0))
        solver.train(batches(), state, max_iters=2, log=None,
                     handle_signals=False)
        snaps = [f for f in os.listdir(out) if "iter_" in f]
        assert len(snaps) == expect, (final, snaps)


def _delta_ratio(step_fn, make_state, run):
    """|Δparams| after one step with a fresh opt state at counter 0 vs past
    the decay boundary — must scale with sched(step), not optax's count."""
    def delta(counter):
        params, opt_state, _ = make_state()
        state = (params, opt_state, jnp.asarray(counter, jnp.int32))
        params2, lr = run(step_fn, state)
        deltas = jax.tree_util.tree_map(
            lambda a, b: jnp.sum(jnp.abs(a - b)), params2, params
        )
        return float(sum(jax.tree_util.tree_leaves(deltas))), lr
    d0, lr0 = delta(0)
    d1, lr1 = delta(11)  # stepsize=10 below
    return d0, d1, lr0, lr1


def test_det_step_applies_decayed_lr_and_accepts_numpy_points():
    """Regression: the unit-lr optimizer refactor scaled updates by
    sched(step) in make_train_step but the det step applied raw unit-lr
    updates (effective lr 1.0). Also: train_net.py passes numpy
    points/symmetry, which raised TracerArrayConversionError when indexed by
    a traced class id inside the jitted step."""
    from posecnn_tpu.data.factory import get_imdb
    from posecnn_tpu.engine.train import (
        create_det_train_state, det_batch_from_frame, make_det_train_step,
    )
    from posecnn_tpu.models.detection import DetConfig

    imdb = get_imdb("toy_train")
    cfg = DetConfig(
        num_classes=imdb.num_classes, is_train=True, compute_dtype=jnp.float32,
        rpn_pre_nms_top_n=64, rpn_post_nms_top_n=16, roi_batch_size=16, fc_dim=64,
    )
    hp = TrainHParams(stepsize=10, learning_rate=0.01, gamma=0.1)
    points = np.stack([np.asarray(p) for p in imdb._points_all]) \
        if isinstance(imdb._points_all, list) else np.asarray(imdb._points_all)
    # numpy on purpose — the CLI path
    step = make_det_train_step(cfg, hp, points, np.asarray(imdb._symmetry))
    batch = det_batch_from_frame(imdb.load_frame(0), max_gt=8)

    def run(step_fn, state):
        (params2, _, _), m = step_fn(state, batch, jax.random.PRNGKey(7))
        return params2, float(m["lr"])

    d0, d1, lr0, lr1 = _delta_ratio(
        step, lambda: create_det_train_state(cfg, hp, jax.random.PRNGKey(0)), run
    )
    assert np.isclose(lr0, hp.learning_rate) and np.isclose(lr1, hp.learning_rate * hp.gamma)
    assert np.isclose(d1 / d0, hp.gamma, rtol=5e-2), (d0, d1)


def test_video_step_applies_decayed_lr():
    """Same regression for the multi-frame GRU step (effective lr was 1.0)."""
    from posecnn_tpu.engine.train import make_optimizer, make_video_train_step
    from posecnn_tpu.models.video import VideoConfig, init_video_params

    cfg = VideoConfig(num_classes=3, num_units=4, compute_dtype=jnp.float32)
    hp = TrainHParams(stepsize=10, learning_rate=0.01, gamma=0.1)
    mesh = make_mesh(MeshSpec(data=1, model=1))
    step = make_video_train_step(cfg, hp, mesh, donate=False)

    T, Bv, Hv, Wv = 2, 1, 16, 16
    rng = np.random.RandomState(0)
    meta = np.zeros((T, Bv, 48), np.float32)
    K = np.array([[10.0, 0, 8], [0, 10.0, 8], [0, 0, 1]])
    meta[..., 0:9] = K.flatten()
    meta[..., 9:18] = np.linalg.inv(K).flatten()
    meta[..., 18:30] = np.hstack([np.eye(3), np.zeros((3, 1))]).flatten()
    meta[..., 30:42] = np.hstack([np.eye(3), np.zeros((3, 1))]).flatten()
    batch = {
        "data": jnp.asarray(rng.randn(T, Bv, Hv, Wv, 3).astype(np.float32)),
        "gt_label_2d": jnp.asarray(rng.randint(0, 3, (T, Bv, Hv, Wv)).astype(np.int32)),
        "depth": jnp.ones((T, Bv, Hv, Wv)),
        "meta_data": jnp.asarray(meta),
    }

    tx = make_optimizer(hp)

    def make_state():
        params = init_video_params(jax.random.PRNGKey(0), cfg)
        return params, tx.init(params), jnp.asarray(0, jnp.int32)

    def run(step_fn, state):
        (params2, _, _), m = step_fn(state, batch)
        return params2, float(m["lr"])

    d0, d1, lr0, lr1 = _delta_ratio(step, make_state, run)
    assert np.isclose(lr0, hp.learning_rate) and np.isclose(lr1, hp.learning_rate * hp.gamma)
    assert np.isclose(d1 / d0, hp.gamma, rtol=5e-2), (d0, d1)
