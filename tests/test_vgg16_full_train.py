"""vgg16_full (dense all-scale FCN) is trainable and evaluable through the
same engine as the flagship model, via the forward_fn hook."""

import jax
import jax.numpy as jnp
import numpy as np

from posecnn_tpu.engine.test import make_inference_fn
from posecnn_tpu.engine.train import TrainHParams, make_optimizer, make_train_step
from posecnn_tpu.models.posecnn import PoseCNNConfig
from posecnn_tpu.models.posecnn_full import (
    init_posecnn_full_params,
    posecnn_full_forward,
)
from posecnn_tpu.parallel.mesh import MeshSpec, make_mesh

C = 4
H = W = 32
B = 2


def _cfg(train):
    return PoseCNNConfig(
        num_classes=C, num_units=8, trunk_scale=0.25, vertex_reg=True, pose_reg=True, is_train=train,
        keep_prob=1.0, compute_dtype=jnp.float32, hough_class_slots=2,
        hough_max_samples=32, hough_center_stride=4, hough_refine_window=8,
        label_threshold=5, fc_dim=64,
    )


def test_vgg16_full_train_step_decreases_loss():
    rng = np.random.RandomState(0)
    cfg = _cfg(True)
    hp = TrainHParams(stepsize=1000, learning_rate=0.01, vertex_w=1.0)
    mesh = make_mesh(MeshSpec(data=1, model=1))
    points = jnp.asarray(rng.randn(C, 32, 3).astype(np.float32) * 0.05)
    symmetry = jnp.zeros(C)
    extents = jnp.asarray(0.1 + 0.1 * rng.rand(C, 3).astype(np.float32))

    params = init_posecnn_full_params(jax.random.PRNGKey(0), cfg)
    state = (params, make_optimizer(hp).init(params), jnp.asarray(0, jnp.int32))
    step = make_train_step(
        cfg, hp, mesh, points, symmetry, extents, donate=False,
        forward_fn=posecnn_full_forward, ce_threshold=0.7,
    )
    meta = np.zeros((B, 48), np.float32)
    meta[:, 0] = meta[:, 4] = 60.0
    meta[:, 2], meta[:, 5] = W / 2.0, H / 2.0
    batch = {
        "data": jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)),
        "gt_label_2d": jnp.asarray(rng.randint(0, C, size=(B, H, W)).astype(np.int32)),
        "gt_centers": jnp.asarray(rng.rand(B, 4, 4).astype(np.float32) * 20),
        "meta_data": jnp.asarray(meta),
        "poses": jnp.zeros((4, 13), jnp.float32),
    }
    losses = []
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]


def test_vgg16_full_inference_fn():
    cfg = _cfg(False)
    params = init_posecnn_full_params(jax.random.PRNGKey(0), cfg)
    infer = make_inference_fn(cfg, (102.98, 115.95, 122.77), forward_fn=posecnn_full_forward)
    raw = jnp.zeros((1, H, W, 3), jnp.uint8)
    meta = jnp.zeros((1, 48), jnp.float32).at[0, 0].set(60.0).at[0, 4].set(60.0)
    extents = jnp.ones((C, 3), jnp.float32) * 0.1
    out = infer(params, raw, meta, extents)
    assert out["label_2d"].shape == (1, H, W)
    assert out["poses_tanh"].shape[1] == 4 * C
