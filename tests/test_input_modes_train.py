"""CPU-mesh train-step smoke tests for the non-COLOR input modes and the
VERTEX_REG_3D path: frames -> get_minibatch -> compute_losses end-to-end.

Covers VERDICT round-1 gaps: RGBD dual-tower training, DEPTH input, and 3D
object-coordinate targets through the compact device blobs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posecnn_tpu.data.minibatch import Frame, MinibatchConfig, get_minibatch
from posecnn_tpu.engine.train import TrainHParams, create_train_state, make_train_step
from posecnn_tpu.models.posecnn import PoseCNNConfig
from posecnn_tpu.parallel.mesh import MeshSpec, make_mesh

C = 3
H = W = 32
B = 2


def _frame(rng, with_vertmap=False):
    label = np.zeros((H, W), np.int32)
    label[8:20, 10:24] = 1
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
    poses = np.zeros((3, 4, 1), np.float32)
    poses[:3, :3, 0] = np.eye(3)
    poses[:, 3, 0] = [0.05, 0.02, 1.0]
    fr = Frame(
        color=rng.randint(0, 255, (H, W, 3)).astype(np.uint8),
        label=label,
        cls_indexes=np.array([1.0]),
        poses=poses,
        center=np.array([[17.0, 14.0]], np.float32),
        intrinsic_matrix=K,
        depth=(900 + 200 * rng.rand(H, W)).astype(np.uint16),
        factor_depth=1000.0,
    )
    if with_vertmap:
        fr.vertmap = (rng.rand(H, W, 3).astype(np.float32) - 0.5) * 0.1
    return fr


def _model_cfg(input_format="COLOR"):
    return PoseCNNConfig(
        num_classes=C, num_units=8, trunk_scale=0.25, input_format=input_format, vertex_reg=True,
        pose_reg=True, is_train=True, keep_prob=1.0, compute_dtype=jnp.float32,
        hough_class_slots=2, hough_max_samples=32, hough_center_stride=4,
        hough_refine_window=8, label_threshold=5, fc_dim=64,
    )


def _static(rng):
    points = jnp.asarray(rng.randn(C, 16, 3).astype(np.float32) * 0.05)
    return points, jnp.zeros(C), jnp.asarray(0.1 + 0.1 * rng.rand(C, 3).astype(np.float32))


def test_depth_and_normal_input_train_step():
    """lov_depth/_normal-style configs run a train step (VERDICT #6). DEPTH
    and NORMAL share the single-tower graph, so one compile serves both."""
    rng = np.random.RandomState(0)
    cfg = _model_cfg()
    points, symmetry, extents = _static(rng)
    hp = TrainHParams(stepsize=1000)
    mesh = make_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    state = create_train_state(cfg, hp, jax.random.PRNGKey(0))
    step = make_train_step(cfg, hp, mesh, points, symmetry, extents, donate=False)
    for fmt in ("DEPTH", "NORMAL"):
        mcfg = MinibatchConfig(
            num_classes=C, chromatic=False, add_noise=False, device_targets=True,
            input_format=fmt,
        )
        frames = [_frame(rng) for _ in range(B)]
        batch = get_minibatch(frames, mcfg, np.asarray(extents), np.zeros((C, 16, 3), np.float32), np.zeros(C, np.float32))
        assert batch["data"].dtype == np.uint8 and "data_p" not in batch
        state, m = step(state, {k: jnp.asarray(v) for k, v in batch.items()}, jax.random.PRNGKey(1))
        assert np.isfinite(float(m["loss"]))
        assert float(m["loss_vertex"]) > 0


def test_rgbd_dual_tower_train_step():
    """lov_rgbd-style config trains the dual-tower model (VERDICT #6)."""
    rng = np.random.RandomState(0)
    cfg = _model_cfg("RGBD")
    mcfg = MinibatchConfig(
        num_classes=C, chromatic=False, add_noise=False, device_targets=True,
        input_format="RGBD",
    )
    points, symmetry, extents = _static(rng)
    frames = [_frame(rng) for _ in range(B)]
    batch = get_minibatch(frames, mcfg, np.asarray(extents), np.zeros((C, 16, 3), np.float32), np.zeros(C, np.float32))
    assert batch["data_p"].dtype == np.uint8
    hp = TrainHParams(stepsize=1000)
    mesh = make_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    state = create_train_state(cfg, hp, jax.random.PRNGKey(0))
    step = make_train_step(cfg, hp, mesh, points, symmetry, extents, donate=False)
    state, m = step(state, {k: jnp.asarray(v) for k, v in batch.items()}, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss_vertex"]) > 0


def test_vertex_reg_3d_train_step():
    """LINEMOD *_3d-style configs train against scaled-vertmap targets
    (VERDICT #5): the compact blobs reach the fused 3D loss and the loss
    decreases on a repeated batch."""
    rng = np.random.RandomState(1)
    from dataclasses import replace

    # 3D mode: vertex head predicts object coordinates, no hough/pose branch
    cfg = replace(_model_cfg(), vertex_reg_3d=True, pose_reg=False)
    mcfg = MinibatchConfig(
        num_classes=C, chromatic=False, add_noise=False, device_targets=True,
        vertex_reg_3d=True,
    )
    points, symmetry, extents = _static(rng)
    frames = [_frame(rng, with_vertmap=True) for _ in range(B)]
    batch = get_minibatch(frames, mcfg, np.asarray(extents), np.zeros((C, 16, 3), np.float32), np.zeros(C, np.float32))
    assert "vertex_targets3" in batch and "gt_centers" not in batch
    # real pixel-scale inputs with He-init hidden layers need small-lr
    # from-scratch settings + grad clipping to avoid divergence
    hp = TrainHParams(stepsize=1000, learning_rate=0.0001, clip_grad_norm=10.0)
    mesh = make_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    state = create_train_state(cfg, hp, jax.random.PRNGKey(0))
    step = make_train_step(cfg, hp, mesh, points, symmetry, extents, donate=False)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    p0 = np.asarray(state[0]["vertex_pred"]["weights"])
    losses = []
    for i in range(3):
        state, m = step(state, jb, jax.random.PRNGKey(i))
        losses.append(float(m["loss_vertex"]))
        assert np.isfinite(float(m["loss"]))
    # the first SGD step reduces the 3D vertex loss, and the gradient
    # reaches the vertex head (momentum makes later tiny-net steps oscillate)
    assert losses[1] < losses[0]
    assert not np.allclose(p0, np.asarray(state[0]["vertex_pred"]["weights"]))
