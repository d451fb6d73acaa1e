"""Model-level tests: deconv lowering parity, forward shapes of all variants."""

import jax
import jax.numpy as jnp
import numpy as np

from posecnn_tpu.models import layers as L


def test_depthwise_deconv_matches_dense_transpose():
    """The channel-diagonal depthwise lowering must equal the dense
    tf-style conv2d_transpose for the bilinear kernels."""
    rng = np.random.RandomState(0)
    for k, s, c, h, w in ((4, 2, 6, 5, 7), (16, 8, 4, 6, 5), (8, 8, 3, 4, 4)):
        params = L.init_deconv(k, c)
        x = jnp.asarray(rng.randn(2, h, w, c).astype(np.float32))
        fast = L.deconv(params, x, stride=s)
        dense = jax.lax.conv_transpose(
            x, params["weights"], strides=(s, s), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
        )
        assert fast.shape == (2, h * s, w * s, c)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(dense), atol=1e-5)


def test_conv1x1_upsample_commutes():
    """conv-at-low-res + upsample must equal the reference deconv-then-conv
    order exactly (including border handling and bias placement)."""
    rng = np.random.RandomState(1)
    for k, s, ci, co, h, w, relu in (
        (16, 8, 12, 5, 6, 7, True),
        (16, 8, 12, 5, 6, 7, False),
        (4, 2, 8, 3, 5, 5, True),
    ):
        conv_p = {
            "weights": jnp.asarray(rng.randn(1, 1, ci, co).astype(np.float32)),
            "biases": jnp.asarray(rng.randn(co).astype(np.float32)),
        }
        dec_p = L.init_deconv(k, ci)
        x = jnp.asarray(rng.randn(2, h, w, ci).astype(np.float32))
        ref = L.conv2d(conv_p, L.deconv(dec_p, x, stride=s), relu=relu)
        fused = L.conv1x1_upsample(conv_p, dec_p, x, stride=s, relu=relu)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5)


def test_deconv_constant_preserving():
    """Bilinear upsampling of a constant map stays constant in the interior."""
    params = L.init_deconv(4, 3)
    x = jnp.ones((1, 6, 6, 3))
    y = np.asarray(L.deconv(params, x, stride=2))
    np.testing.assert_allclose(y[0, 3:-3, 3:-3, :], 1.0, atol=1e-5)


def test_posecnn_forward_shapes():
    from posecnn_tpu.models.posecnn import PoseCNNConfig, init_posecnn_params, posecnn_forward

    C, H, W, B = 4, 32, 32, 2
    cfg = PoseCNNConfig(
        num_classes=C, num_units=8, trunk_scale=0.25, vertex_reg=True, pose_reg=True, is_train=False,
        compute_dtype=jnp.float32, hough_class_slots=2, hough_max_samples=32,
        hough_center_stride=4, hough_refine_window=8, label_threshold=5, fc_dim=64,
    )
    params = init_posecnn_params(jax.random.PRNGKey(0), cfg)
    data = jnp.zeros((B, H, W, 3))
    meta = jnp.zeros((B, 48)).at[:, 0].set(60.0).at[:, 4].set(60.0).at[:, 2].set(16.0).at[:, 5].set(16.0)
    extents = jnp.ones((C, 3)) * 0.1
    out = posecnn_forward(params, cfg, data, extents, meta)
    assert out["prob"].shape == (B, H, W, C)
    assert out["label_2d"].shape == (B, H, W)
    assert out["vertex_pred"].shape == (B, H, W, 3 * C)
    R = B * 2 * 1
    assert out["rois"].shape == (R, 7)
    assert out["poses_tanh"].shape == (R, 4 * C)


def test_posecnn_full_forward_shapes():
    from posecnn_tpu.models.posecnn import PoseCNNConfig
    from posecnn_tpu.models.posecnn_full import init_posecnn_full_params, posecnn_full_forward

    C, H, W, B = 4, 32, 32, 1
    cfg = PoseCNNConfig(
        num_classes=C, num_units=8, trunk_scale=0.25, vertex_reg=True, pose_reg=True, is_train=False,
        compute_dtype=jnp.float32, hough_class_slots=2, hough_max_samples=32,
        hough_center_stride=4, hough_refine_window=8, label_threshold=5, fc_dim=64,
    )
    params = init_posecnn_full_params(jax.random.PRNGKey(0), cfg)
    meta = jnp.zeros((B, 48)).at[:, 0].set(60.0).at[:, 4].set(60.0).at[:, 2].set(16.0).at[:, 5].set(16.0)
    out = posecnn_full_forward(params, cfg, jnp.zeros((B, H, W, 3)), jnp.ones((C, 3)) * 0.1, meta)
    assert out["prob"].shape == (B, H, W, C)
    assert out["vertex_pred"].shape == (B, H, W, 3 * C)
    assert out["poses_pred"].shape == (B * 2, 4 * C)


def test_video_forward_shapes():
    from posecnn_tpu.models.video import VideoConfig, init_video_params, video_forward

    cfg = VideoConfig(num_classes=3, num_units=4, compute_dtype=jnp.float32)
    params = init_video_params(jax.random.PRNGKey(0), cfg)
    T, B, H, W = 2, 1, 16, 16
    meta = np.zeros((T, B, 48), np.float32)
    K = np.array([[10.0, 0, 8], [0, 10.0, 8], [0, 0, 1]])
    meta[..., 0:9] = K.flatten()
    meta[..., 9:18] = np.linalg.inv(K).flatten()
    meta[..., 18:30] = np.hstack([np.eye(3), np.zeros((3, 1))]).flatten()
    meta[..., 30:42] = np.hstack([np.eye(3), np.zeros((3, 1))]).flatten()
    outs, state = video_forward(
        params, cfg,
        jnp.zeros((T, B, H, W, 3)),
        jnp.ones((T, B, H, W)),
        jnp.asarray(meta),
    )
    assert outs["prob"].shape == (T, B, H, W, 3)
    assert state[0].shape == (B, H, W, 4)


def test_resnet50_and_fcn8_shapes():
    from posecnn_tpu.models.fcn8 import fcn8_forward, init_fcn8_params
    from posecnn_tpu.models.resnet50 import init_resnet50_params, resnet50_forward

    x = jnp.zeros((1, 32, 32, 3))
    p = init_resnet50_params(jax.random.PRNGKey(0), 5)
    out = resnet50_forward(p, x, 5, compute_dtype=jnp.float32)
    assert out["prob"].shape == (1, 32, 32, 5)

    p8 = init_fcn8_params(jax.random.PRNGKey(1), 5)
    out8 = fcn8_forward(p8, x, 5, compute_dtype=jnp.float32)
    assert out8["prob"].shape == (1, 32, 32, 5)


def test_gan_shapes():
    from posecnn_tpu.models.gan import (
        dcgan_discriminator,
        dcgan_generator,
        init_dcgan_params,
    )

    p = init_dcgan_params(jax.random.PRNGKey(0), size=64)
    z = jnp.zeros((2, 100))
    img = jnp.zeros((2, 64, 64, 3))
    g = dcgan_generator(p, z, img, train=False)
    assert g.shape == (2, 64, 64, 3)
    d = dcgan_discriminator(p, jnp.concatenate([img, g], axis=3), train=False)
    assert d.shape == (2, 1)


def test_gru3d_flag_gating():
    from posecnn_tpu.models.gru import gru3d, init_gru3d

    U = 4
    p = init_gru3d(jax.random.PRNGKey(0), U, U)
    rng = np.random.RandomState(0)
    inputs = jnp.asarray(rng.rand(1, 2, 2, 2, U).astype(np.float32))
    state = jnp.asarray(rng.rand(1, 2, 2, 2, U).astype(np.float32))
    flag = jnp.zeros((1, 2, 2, 2, 1)).at[0, 0, 0, 0, 0].set(1.0)
    out, new_h = gru3d(p, inputs, flag, state)
    # zero-init gate -> u = 0.5 -> observed voxels move to the midpoint,
    # unobserved voxels keep their previous state (gru3d.py:59-61)
    np.testing.assert_allclose(
        np.asarray(out[0, 0, 0, 0]), 0.5 * np.asarray(inputs[0, 0, 0, 0] + state[0, 0, 0, 0]), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(out[0, 1, 1, 1]), np.asarray(state[0, 1, 1, 1]), rtol=1e-6)


def test_video3d_forward_shapes():
    from posecnn_tpu.models.video import Video3DConfig, init_video3d_params, video3d_forward

    cfg = Video3DConfig(
        num_classes=3, num_units=4, grid_size=4, compute_dtype=jnp.float32,
        backproject_threshold=10.0,
    )
    params = init_video3d_params(jax.random.PRNGKey(0), cfg)
    T, B, H, W = 2, 1, 16, 16
    meta = np.zeros((T, B, 48), np.float32)
    K = np.array([[10.0, 0, 8], [0, 10.0, 8], [0, 0, 1]])
    meta[..., 0:9] = K.flatten()
    meta[..., 9:18] = np.linalg.inv(K).flatten()
    meta[..., 18:30] = np.hstack([np.eye(3), np.zeros((3, 1))]).flatten()
    meta[..., 30:42] = np.hstack([np.eye(3), np.zeros((3, 1))]).flatten()
    meta[..., 42:45] = 0.5  # voxel step
    meta[..., 45:48] = -1.0  # voxel origin
    outs, state = video3d_forward(
        params, cfg,
        jnp.zeros((T, B, H, W, 3)),
        jnp.ones((T, B, H, W)),
        jnp.asarray(meta),
    )
    assert outs["label_2d"].shape == (T, B, H, W)
    assert state.shape == (B, 4, 4, 4, 3)


def test_vgg16_gan_shapes():
    from posecnn_tpu.models.gan import init_vgg16_gan_params, vgg16_gan_forward

    C = 3
    p = init_vgg16_gan_params(jax.random.PRNGKey(0), C, num_units=4)
    data = jnp.zeros((1, 32, 32, 3))
    vt = jnp.zeros((1, 32, 32, 3 * C))
    out = vgg16_gan_forward(p, data, C, vertex_targets=vt, compute_dtype=jnp.float32)
    assert out["prob"].shape == (1, 32, 32, C)
    assert out["vertex_pred"].shape == (1, 32, 32, 3 * C)
    # patch discriminator downsamples by 32; [fake, real] passes share params
    assert len(out["outputs_d"]) == 2
    assert out["outputs_d"][0].shape == (1, 1, 1, 2)


def test_dcgan_running_stats_update_and_eval():
    """BN running statistics must flow back into params (merge_bn_stats) or
    eval-mode normalizes with the untouched init stats."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from posecnn_tpu.models.gan import (
        dcgan_generator,
        init_dcgan_params,
        merge_bn_stats,
    )

    p = init_dcgan_params(jax.random.PRNGKey(0), size=32)
    z = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (1, 100)).astype(np.float32))
    img = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3).astype(np.float32))
    out, stats = dcgan_generator(p, z, img, train=True, return_stats=True)
    assert "bn1" in stats
    # stats moved off the init values
    assert float(jnp.abs(stats["bn1"]["mean"]).sum()) > 0
    p2 = merge_bn_stats(p, stats)
    assert float(jnp.abs(p2["bn1"]["mean"]).sum()) > 0
    # eval mode with merged stats runs and stays finite
    out_eval = dcgan_generator(p2, z, img, train=False)
    assert np.isfinite(np.asarray(out_eval)).all()
