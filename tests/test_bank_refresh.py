"""Continuous bank refresh (data/bank_refresh.py): the never-reuse-a-frame
property of the reference's render thread (tools/train_net.py:155-258),
restored on top of the device-resident bank."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from posecnn_tpu.data.bank_refresh import (
    REFRESH_SEED0, BankRefresher, chunk_positions, make_bank_updater,
    refresh_synthesizer, refreshing_bank_iter,
)
from posecnn_tpu.data.device_bank import build_bank, pack_frames


def _toy_imdb():
    from posecnn_tpu.data.synthetic import SyntheticDataset
    from posecnn_tpu.data.toy import toy

    base = toy("train", num_classes=4, num_images=4, height=96, width=128)
    return SyntheticDataset(base, split="train", num_images=6,
                            width=128, height=96, max_objects=3)


class TestChunkPositions:
    def test_exact_tiling(self):
        assert chunk_positions(8, 4) == [0, 4]

    def test_tail_window_overlaps(self):
        # 10 rows, chunk 4: strides 0,4 leave rows 8-9 unreachable without
        # the final overlapping window at 6
        assert chunk_positions(10, 4) == [0, 4, 6]

    def test_chunk_covers_bank(self):
        assert chunk_positions(3, 8) == [0]

    def test_every_row_reachable(self):
        for n, c in [(2000, 64), (100, 7), (5, 2)]:
            covered = np.zeros(n, bool)
            for p in chunk_positions(n, c):
                covered[p:p + min(c, n)] = True
            assert covered.all(), (n, c)


def test_pack_frames_matches_build_bank():
    """Refreshed rows must be bit-identical in layout to staged ones."""
    from posecnn_tpu.data.minibatch import MinibatchConfig

    ds = _toy_imdb()
    mcfg = MinibatchConfig(num_classes=ds.num_classes,
                           pixel_means=(102.9801, 115.9465, 122.7717))
    staged = build_bank(ds, mcfg)
    g_max = staged["gt_centers"].shape[1]
    packed = pack_frames([ds.load_frame(i) for i in range(ds.num_images)],
                         g_max)
    assert set(staged) == set(packed)
    for k in staged:
        np.testing.assert_array_equal(staged[k], packed[k])


def test_updater_splices_slice_without_touching_rest():
    bank = {
        "data": jnp.arange(8 * 3, dtype=jnp.uint8).reshape(8, 3),
        "meta": jnp.arange(8.0).reshape(8, 1),
    }
    chunk = {
        "data": jnp.full((2, 3), 99, jnp.uint8),
        "meta": jnp.full((2, 1), -1.0),
    }
    update = make_bank_updater()
    out = update(bank, chunk, jnp.asarray(4, jnp.int32))
    np.testing.assert_array_equal(np.asarray(out["data"][4:6]), 99)
    np.testing.assert_array_equal(np.asarray(out["data"][:4]),
                                  np.asarray(bank["data"][:4]))
    np.testing.assert_array_equal(np.asarray(out["data"][6:]),
                                  np.asarray(bank["data"][6:]))
    np.testing.assert_array_equal(np.asarray(out["meta"][4:6]), -1.0)
    # the updater must NOT donate: the solver's prefetch keeps the previous
    # bank in flight inside the step that runs after the splice
    np.testing.assert_array_equal(np.asarray(bank["data"][4]),
                                  np.arange(12, 15, dtype=np.uint8))
    # traced start: a different offset reuses the same compilation
    out2 = update(bank, chunk, jnp.asarray(0, jnp.int32))
    np.testing.assert_array_equal(np.asarray(out2["data"][0:2]), 99)


def test_refresher_produces_fresh_deterministic_chunks():
    ds = _toy_imdb()
    synth = refresh_synthesizer(ds)
    assert synth is ds.synth  # SyntheticDataset carries its synthesizer

    r = BankRefresher(synth, g_max=3, chunk_size=2, seed_offset=0)
    r.start()
    deadline = time.time() + 60
    chunk = None
    while chunk is None and time.time() < deadline:
        chunk = r.poll()
        time.sleep(0.05)
    r.stop()
    assert chunk is not None, "refresher produced nothing in 60s"
    assert chunk["data"].shape[1:] == (96, 128, 3)
    assert chunk["gt_centers"].shape == (2, 3, 4)
    # deterministic in the seed stream: frame 0 == a direct render of
    # REFRESH_SEED0, and differs from the frozen train stream (seed0 0)
    f_direct = synth.render_scene(np.random.RandomState(REFRESH_SEED0))
    packed = pack_frames([f_direct], 3)
    np.testing.assert_array_equal(chunk["data"][0], packed["data"][0])
    f_train0 = ds.load_frame(0)
    assert not np.array_equal(chunk["data"][0],
                              pack_frames([f_train0], 3)["data"][0])


def test_counter_sidecar_survives_restart(tmp_path):
    """advisor r4: seed_offset=start_iter alone replays identical seeds when
    a child wedged before iterations advanced; the sidecar persists the true
    high-water counter so a kill+resume keeps advancing through NEW scenes."""
    ds = _toy_imdb()
    synth = refresh_synthesizer(ds)
    path = str(tmp_path / "bank_refresh_counter.txt")

    r1 = BankRefresher(synth, g_max=3, chunk_size=2, seed_offset=0,
                       counter_path=path)
    r1.start()
    deadline = time.time() + 60
    while r1.poll() is None and time.time() < deadline:
        time.sleep(0.05)
    r1.stop()
    r1.join(timeout=30)
    with open(path) as fh:
        persisted = int(fh.read())
    assert persisted >= 2  # at least one chunk's seeds recorded

    # "resume" at the SAME start_iter: without the sidecar this replays
    # seeds [0, 2); with it the counter resumes past the persisted mark
    r2 = BankRefresher(synth, g_max=3, chunk_size=2, seed_offset=0,
                       counter_path=path)
    assert r2._counter == persisted
    # a later start_iter still wins when it is ahead of the sidecar
    r3 = BankRefresher(synth, g_max=3, chunk_size=2,
                       seed_offset=persisted + 100, counter_path=path)
    assert r3._counter == persisted + 100


def test_refresh_synthesizer_rebuilds_from_frozen_manifest(tmp_path):
    """advisor r4: a FrozenSyntheticDataset's refresh distribution must come
    from the render params its freeze pinned into manifest.json, not from
    hardcoded 640x480/5-object defaults."""
    from posecnn_tpu.data.synthetic import (
        FrozenSyntheticDataset, SyntheticDataset, freeze_dataset,
    )
    from posecnn_tpu.data.toy import toy

    base = toy("train", num_classes=4, num_images=4, height=96, width=128)
    live = SyntheticDataset(base, split="train", num_images=2,
                            width=128, height=96, max_objects=3)
    out = str(tmp_path / "snap")
    manifest = freeze_dataset(live, out)
    assert manifest["render_params"]["width"] == 128
    assert manifest["render_params"]["max_objects"] == 3

    frozen = FrozenSyntheticDataset(base, out)
    synth = refresh_synthesizer(frozen)
    assert (synth.width, synth.height) == (128, 96)
    assert synth.max_objects == 3
    assert synth.min_visible == live.synth.min_visible

    # manifests predating render_params fall back to the era's defaults
    del frozen.manifest["render_params"]
    synth_legacy = refresh_synthesizer(frozen)
    assert (synth_legacy.width, synth_legacy.height) == (640, 480)
    assert synth_legacy.max_objects == 5


def test_refreshing_bank_iter_end_to_end():
    """Iterator yields a usable bank every step and splices chunks in as
    they arrive; spliced rows replace old ones at rotating offsets."""
    ds = _toy_imdb()
    from posecnn_tpu.data.minibatch import MinibatchConfig

    mcfg = MinibatchConfig(num_classes=ds.num_classes,
                           pixel_means=(102.9801, 115.9465, 122.7717))
    bank = jax.device_put(build_bank(ds, mcfg))
    n = bank["data"].shape[0]
    g_max = bank["gt_centers"].shape[1]

    r = BankRefresher(refresh_synthesizer(ds), g_max=g_max, chunk_size=2)
    r.start()
    it = iter(refreshing_bank_iter(bank, r))
    orig = np.asarray(bank["data"])
    deadline = time.time() + 120
    changed_rows = set()
    while time.time() < deadline and len(changed_rows) < n:
        cur = next(it)
        now = np.asarray(cur["data"])
        for i in range(n):
            if not np.array_equal(now[i], orig[i]):
                changed_rows.add(i)
        if len(changed_rows) >= 4:  # enough evidence of rotation
            break
        time.sleep(0.05)
    r.stop()
    assert len(changed_rows) >= 4, f"only rows {changed_rows} refreshed"
    # annotation tables moved with the images: some refreshed row's GT
    # centers differ from the staged bank's
    orig_centers = np.asarray(bank["gt_centers"])
    cur_centers = np.asarray(cur["gt_centers"])
    assert any(not np.array_equal(cur_centers[i], orig_centers[i])
               for i in changed_rows)
    # the original bank dict is still intact (no donation)
    np.testing.assert_array_equal(np.asarray(bank["data"]), orig)


def test_solver_trains_through_refreshing_iterator():
    """Solver.train driven by refreshing_bank_iter: the full production
    wiring (tools/train_net.py BANK_REFRESH branch) — generator as
    data_iter, device prefetch shipping the bank dict, splices landing
    between steps without invalidating the in-flight bank."""
    from posecnn_tpu.data.minibatch import MinibatchConfig
    from posecnn_tpu.engine.train import (
        Solver, TrainHParams, create_train_state, make_bank_train_step,
    )
    from posecnn_tpu.models.posecnn import PoseCNNConfig

    ds = _toy_imdb()
    C = ds.num_classes
    mcfg = MinibatchConfig(num_classes=C,
                           pixel_means=(102.9801, 115.9465, 122.7717))
    bank = jax.device_put(build_bank(ds, mcfg))
    g_max = bank["gt_centers"].shape[1]

    cfg = PoseCNNConfig(
        num_classes=C, num_units=8, trunk_scale=0.25, vertex_reg=True,
        pose_reg=True, is_train=True, keep_prob=1.0,
        compute_dtype=jnp.float32, hough_class_slots=2, hough_max_samples=32,
        hough_center_stride=4, hough_refine_window=8, label_threshold=5,
        fc_dim=64, hough_gt_mix=0.5,
    )
    hp = TrainHParams(stepsize=1000, learning_rate=0.001, margin=1e-4)
    rng = np.random.RandomState(0)
    points = jnp.asarray(rng.randn(C, 16, 3).astype(np.float32) * 0.05)
    extents = jnp.asarray(0.05 + 0.1 * rng.rand(C, 3).astype(np.float32))

    state = create_train_state(cfg, hp, jax.random.PRNGKey(0))
    step = make_bank_train_step(cfg, hp, points, jnp.zeros(C), extents,
                                batch_size=2, max_gt=g_max, donate=False)
    solver = Solver(cfg, hp, points=points, symmetry=jnp.zeros(C),
                    extents=extents, step_fn=step, display=2)
    r = BankRefresher(refresh_synthesizer(ds), g_max=g_max, chunk_size=2)
    r.start()
    try:
        logged = []
        state, metrics = solver.train(
            iter(refreshing_bank_iter(bank, r)), state, max_iters=8,
            log=logged.append, handle_signals=False,
        )
    finally:
        r.stop()
    assert metrics is not None and np.isfinite(float(metrics["loss"]))
    assert any("iter 8/8" in s for s in logged)
