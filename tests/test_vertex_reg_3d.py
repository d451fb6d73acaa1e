"""VERTEX_REG_3D inference path: object-coordinate RANSAC decoding recovers
a known pose, and the model graph skips hough/pose branches in 3D mode."""

import jax
import jax.numpy as jnp
import numpy as np

from posecnn_tpu.engine.test import decode_poses_3d
from posecnn_tpu.utils.pose_error import add
from posecnn_tpu.utils.quaternion_np import quat2mat

C = 3
H, W = 96, 128
K = np.array([[400.0, 0, W / 2], [0, 400.0, H / 2], [0, 0, 1]])


def _scene(R_gt, t_gt, extent, cls=1, step=0.0015):
    """Render GT label/depth/scaled-object-coordinate maps for a box front
    face held at (R_gt, t_gt)."""
    g1 = np.arange(-extent[0] / 2, extent[0] / 2, step)
    g2 = np.arange(-extent[1] / 2, extent[1] / 2, step)
    xs, ys = np.meshgrid(g1, g2)
    model = np.stack([xs.ravel(), ys.ravel(), np.full(xs.size, -extent[2] / 2)], 1)
    cam = model @ R_gt.T + t_gt
    uv = cam @ K.T
    u = (uv[:, 0] / uv[:, 2]).astype(int)
    v = (uv[:, 1] / uv[:, 2]).astype(int)
    ok = (u >= 0) & (u < W) & (v >= 0) & (v < H)
    label = np.zeros((H, W), np.int32)
    depth = np.zeros((H, W), np.float32)
    vp = np.zeros((H, W, 3 * C), np.float32)
    scaled = model / extent + 0.5  # _scale_vertmap convention
    label[v[ok], u[ok]] = cls
    depth[v[ok], u[ok]] = cam[ok, 2]
    vp[v[ok], u[ok], 3 * cls : 3 * cls + 3] = scaled[ok]
    return label, depth, vp, model


def test_decode_poses_3d_recovers_known_pose():
    rng = np.random.RandomState(0)
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    R_gt = quat2mat(q)
    t_gt = np.array([0.03, -0.02, 0.8])
    extent = np.array([0.12, 0.09, 0.06])
    label, depth, vp, model = _scene(R_gt, t_gt, extent)
    assert (label == 1).sum() > 500

    extents = np.zeros((C, 3), np.float32)
    extents[1] = extent
    meta = np.zeros(48, np.float32)
    meta[0], meta[2], meta[4], meta[5] = K[0, 0], K[0, 2], K[1, 1], K[1, 2]
    out = {"label_2d": label[None], "vertex_pred": vp[None]}
    rois, poses = decode_poses_3d(out, depth, meta, extents, C, label_threshold=500)
    assert rois.shape[0] == 1 and int(rois[0, 1]) == 1
    err = add(quat2mat(poses[0, :4]), poses[0, 4:7], R_gt, t_gt, model)
    assert err < 0.005  # < 5 mm mean model-point error


def test_decode_ignores_small_segments():
    label = np.zeros((H, W), np.int32)
    label[:4, :4] = 1  # 16 px < threshold
    out = {"label_2d": label[None], "vertex_pred": np.zeros((1, H, W, 3 * C), np.float32)}
    meta = np.zeros(48, np.float32)
    meta[0] = meta[4] = 100.0
    rois, poses = decode_poses_3d(out, np.zeros((H, W), np.float32), meta, np.ones((C, 3), np.float32), C)
    assert rois.shape[0] == 0


def test_model_3d_mode_skips_hough():
    from posecnn_tpu.models.posecnn import (
        PoseCNNConfig, init_posecnn_params, posecnn_forward,
    )

    cfg = PoseCNNConfig(
        num_classes=C, num_units=8, trunk_scale=0.25, vertex_reg=True, vertex_reg_3d=True,
        pose_reg=False, is_train=False, keep_prob=1.0,
        compute_dtype=jnp.float32, fc_dim=64,
    )
    params = init_posecnn_params(jax.random.PRNGKey(0), cfg)
    data = jnp.zeros((1, 32, 32, 3), jnp.float32)
    meta = jnp.zeros((1, 48), jnp.float32).at[0, 0].set(60.0).at[0, 4].set(60.0)
    out = posecnn_forward(params, cfg, data, jnp.ones((C, 3)), meta)
    assert "vertex_pred" in out and out["vertex_pred"].shape[-1] == 3 * C
    assert "rois" not in out and "poses_tanh" not in out
