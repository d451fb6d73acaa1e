"""Full-width tensor-parallel sharding evidence (round-2 verdict task 4).

The multichip dryrun runs a miniature trunk (trunk_scale=0.125) with a
lowered TP threshold; nothing exercised TP sharding of the REAL 512-channel
fc6/fc7 kernels. This test runs `make_train_step` at full model width
(trunk_scale=1.0, fc_dim=4096, default TP_MIN_SIZE) on a (4,2) DPxTP CPU
mesh at small spatial size: the fc6 kernel (7*7*512*4096 = 102.8M elems) and
fc7 (16.8M) cross the default 4M TP threshold and shard over the model axis;
conv kernels (<= 2.36M) stay replicated — exactly the flagship sharding
layout the TPU deployment uses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posecnn_tpu.engine.train import TrainHParams, create_train_state, make_train_step
from posecnn_tpu.models.posecnn import PoseCNNConfig
from posecnn_tpu.parallel.mesh import (
    MODEL_AXIS, MeshSpec, TP_MIN_SIZE, make_mesh, param_sharding,
)

C = 6
H = W = 32
B = 4


@pytest.mark.slow
def test_fullwidth_fc_tp_sharding_train_step():
    assert TP_MIN_SIZE == 1 << 22, "test assumes the production TP threshold"
    cfg = PoseCNNConfig(
        num_classes=C, num_units=64, trunk_scale=1.0, vertex_reg=True,
        pose_reg=True, is_train=True, keep_prob=1.0,
        compute_dtype=jnp.float32,
        # cheap hough variants (detection math is not under test here)
        hough_class_slots=2, hough_max_samples=32, hough_center_stride=4,
        hough_refine_window=8, label_threshold=5,
        # teacher-forced hough: detections match their GT rows so the
        # ADD-loss branch is numerically live under TP sharding
        # (round-3 verdict weak #3), not just finite-by-virtue-of-zero
        hough_gt_mix=1.0,
    )
    assert cfg.fc_dim == 4096, "full width means the real 4096-wide FCs"
    mesh = make_mesh(MeshSpec(data=4, model=2))

    hp = TrainHParams(stepsize=1000, learning_rate=0.001, vertex_w=1.0)
    rng = np.random.RandomState(0)
    points = jnp.asarray(rng.randn(C, 32, 3).astype(np.float32) * 0.05)
    symmetry = jnp.zeros(C)
    extents = jnp.asarray(0.1 + 0.1 * rng.rand(C, 3).astype(np.float32))

    state = create_train_state(cfg, hp, jax.random.PRNGKey(0))
    params = state[0]
    # the production sharding rule must shard fc6/fc7 kernels and nothing else
    sharded = {
        name
        for name, p in params.items()
        for k, leaf in p.items()
        if param_sharding(mesh, path=name, leaf=leaf).spec != jax.sharding.PartitionSpec()
    }
    assert sharded == {"fc6", "fc7"}, sharded

    from posecnn_tpu.utils.gate_batch import live_pose_batch

    batch = live_pose_batch(B, H, W, C, rng, with_aug=False)
    step = make_train_step(cfg, hp, mesh, points, symmetry, extents, donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    # the ADD branch must actually bite under the sharded step
    assert float(metrics["loss_pose"]) > 0.0, metrics
    # the updated fc6 kernel is genuinely laid out model-sharded on devices
    fc6 = state[0]["fc6"]["weights"]
    spec = fc6.sharding.spec
    assert spec[-1] == MODEL_AXIS, spec
