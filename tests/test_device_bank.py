"""Device-resident data bank (data/device_bank.py + make_bank_train_step):
in-graph batch sampling/assembly/augmentation over an HBM-staged dataset,
the TPU-native replacement for the per-iteration host pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from posecnn_tpu.engine.train import (
    TrainHParams, _assemble_pose_rows, create_train_state,
    make_bank_train_step,
)
from posecnn_tpu.models.posecnn import PoseCNNConfig

C = 4
H = W = 32
N = 6
G = 3


def _cfg(**kw):
    return PoseCNNConfig(
        num_classes=C, num_units=8, trunk_scale=0.25, vertex_reg=True,
        pose_reg=True, is_train=True, keep_prob=1.0,
        compute_dtype=jnp.float32, hough_class_slots=2, hough_max_samples=32,
        hough_center_stride=4, hough_refine_window=8, label_threshold=5,
        fc_dim=64, **kw,
    )


def _bank(rng):
    meta = np.zeros((N, 48), np.float32)
    meta[:, 0] = meta[:, 4] = 60.0
    meta[:, 2], meta[:, 5] = W / 2.0, H / 2.0
    centers = np.zeros((N, G, 4), np.float32)
    prow = np.zeros((N, G, 13), np.float32)
    for i in range(N):
        for g in range(G - 1):  # leave one padding row per frame
            c = rng.randint(1, C)
            centers[i, g] = [c, rng.uniform(4, W - 4), rng.uniform(4, H - 4),
                             rng.uniform(0.5, 1.5)]
            q = rng.randn(4)
            q /= np.linalg.norm(q)
            prow[i, g, 0] = 0.0
            prow[i, g, 1] = c
            prow[i, g, 6:10] = q
            prow[i, g, 10:] = [0.0, 0.0, centers[i, g, 3]]
    return {
        "data": (rng.rand(N, H, W, 3) * 255).astype(np.uint8),
        "label": rng.randint(0, C, size=(N, H, W)).astype(np.uint8),
        "gt_centers": centers,
        "pose_rows": prow,
        "meta_data": meta,
    }


def test_assemble_pose_rows_packs_valid_first():
    rows = np.zeros((2, 3, 13), np.float32)
    rows[0, 0, 1] = 2.0  # frame 0: one valid row
    rows[1, 0, 1] = 1.0  # frame 1: two valid rows
    rows[1, 1, 1] = 3.0
    out = np.asarray(_assemble_pose_rows(jnp.asarray(rows), max_gt=5))
    assert out.shape == (5, 13)
    # valid rows first, batch index in col 0
    assert out[0, 1] == 2.0 and out[0, 0] == 0.0
    assert out[1, 1] == 1.0 and out[1, 0] == 1.0
    assert out[2, 1] == 3.0 and out[2, 0] == 1.0
    assert np.all(out[3:] == 0.0)


def test_bank_step_runs_and_loss_decreases():
    rng = np.random.RandomState(0)
    cfg = _cfg(hough_gt_mix=0.5)
    hp = TrainHParams(stepsize=1000, learning_rate=0.01, vertex_w=1.0,
                      margin=1e-4, quat_w=0.5)
    points = jnp.asarray(rng.randn(C, 32, 3).astype(np.float32) * 0.05)
    symmetry = jnp.zeros(C).at[3].set(1.0)
    extents = jnp.asarray(0.1 + 0.1 * rng.rand(C, 3).astype(np.float32))

    state = create_train_state(cfg, hp, jax.random.PRNGKey(0))
    step = make_bank_train_step(
        cfg, hp, points, symmetry, extents, batch_size=2, max_gt=5,
        chromatic=True, add_noise=True, donate=False,
    )
    bank = jax.device_put(_bank(rng))
    losses = []
    for i in range(6):
        state, metrics = step(state, bank, jax.random.PRNGKey(i))
        m = {k: float(v) for k, v in metrics.items()}
        assert np.isfinite(m["loss"]), m
        assert "loss_quat" in m
        losses.append(m["loss"])
    assert min(losses[2:]) < losses[0]


def test_build_bank_from_toy_dataset():
    from posecnn_tpu.data.device_bank import build_bank
    from posecnn_tpu.data.factory import get_imdb
    from posecnn_tpu.data.minibatch import MinibatchConfig

    imdb = get_imdb("toy_train")
    mcfg = MinibatchConfig(num_classes=imdb.num_classes)
    bank = build_bank(imdb, mcfg, limit=3)
    n = bank["data"].shape[0]
    assert n == 3
    assert bank["data"].dtype == np.uint8
    assert bank["label"].dtype == np.uint8
    assert bank["data"].shape[:3] == bank["label"].shape
    assert bank["data"].shape[1] % 16 == 0 and bank["data"].shape[2] % 16 == 0
    assert bank["gt_centers"].shape[0] == n and bank["pose_rows"].shape[2] == 13
    # every frame's first GT row is a real instance with a unit quaternion
    assert np.all(bank["pose_rows"][:, 0, 1] > 0)
    qn = np.linalg.norm(bank["pose_rows"][:, 0, 6:10], axis=1)
    assert np.allclose(qn, 1.0, atol=1e-4)
