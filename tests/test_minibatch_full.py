"""Tests for the completed minibatch builder: multi-instance vertex targets,
flip augmentation, VERTEX_REG_3D targets, and DEPTH/RGBD/NORMAL input blobs.

Reference semantics: lib/gt_synthesize_layer/minibatch.py:528-620 (targets,
_flip_poses, _scale_vertmap) and :155-239 (input blobs).
"""
import numpy as np
import pytest

from posecnn_tpu.data.minibatch import (
    Frame,
    MinibatchConfig,
    flip_frame,
    flip_poses,
    generate_vertex_targets,
    get_minibatch,
    scale_vertmap,
    unscale_vertmap,
)

C = 4  # classes incl background


def _frame(H=32, W=48, n=2, cls=(1, 2), rng=None, **kw):
    rng = rng or np.random.RandomState(0)
    label = np.zeros((H, W), np.int32)
    mask = np.zeros((H, W), np.int32)
    centers = np.zeros((n, 2), np.float32)
    poses = np.zeros((3, 4, n), np.float32)
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]])
    for j in range(n):
        cx, cy = 8 + 16 * j, 10 + 6 * j
        label[cy - 4 : cy + 4, cx - 4 : cx + 4] = cls[j]
        mask[cy - 4 : cy + 4, cx - 4 : cx + 4] = j + 1
        centers[j] = (cx, cy)
        poses[:3, :3, j] = np.eye(3)
        z = 1.0 + 0.3 * j
        poses[:, 3, j] = [(cx - K[0, 2]) / K[0, 0] * z, (cy - K[1, 2]) / K[1, 1] * z, z]
    return Frame(
        color=rng.randint(0, 255, (H, W, 3)).astype(np.uint8),
        label=label,
        cls_indexes=np.array(cls, np.float32),
        poses=poses,
        center=centers,
        intrinsic_matrix=K,
        depth=(1000 + 100 * rng.rand(H, W)).astype(np.uint16),
        factor_depth=1000.0,
        mask=mask,
        **kw,
    )


# --------------------------------------------------- multi-instance targets


def test_multi_instance_targets_route_by_mask():
    """Two instances of the SAME class: each pixel's direction target points
    to its own instance's center (reference mask branch, minibatch.py:549-574)."""
    fr = _frame(cls=(2, 2))
    t, w = generate_vertex_targets(
        fr.label, fr.cls_indexes, fr.center, fr.poses, C, 10.0, mask=fr.mask
    )
    for j in range(2):
        cx, cy = fr.center[j]
        y, x = int(cy) - 3, int(cx) - 3  # a pixel inside instance j
        d = np.array([cx - x, cy - y])
        d = d / np.linalg.norm(d)
        np.testing.assert_allclose(t[y, x, 3 * 2 : 3 * 2 + 2], d, atol=1e-5)
        np.testing.assert_allclose(
            t[y, x, 3 * 2 + 2], np.log(fr.poses[2, 3, j]), atol=1e-5
        )
        assert w[y, x, 3 * 2] == 10.0


def test_single_instance_unchanged_with_mask_present():
    """Distinct classes: mask path must reduce to the single-instance branch."""
    fr = _frame(cls=(1, 2))
    t0, w0 = generate_vertex_targets(fr.label, fr.cls_indexes, fr.center, fr.poses, C, 10.0)
    t1, w1 = generate_vertex_targets(
        fr.label, fr.cls_indexes, fr.center, fr.poses, C, 10.0, mask=fr.mask
    )
    np.testing.assert_allclose(t0, t1)
    np.testing.assert_allclose(w0, w1)


def test_device_nearest_routing_matches_mask_for_separated_instances():
    import jax.numpy as jnp

    from posecnn_tpu.ops.vertex_targets import vertex_targets_device

    fr = _frame(cls=(2, 2))
    t_host, w_host = generate_vertex_targets(
        fr.label, fr.cls_indexes, fr.center, fr.poses, C, 10.0, mask=fr.mask
    )
    gc = np.zeros((1, 6, 4), np.float32)
    gc[0, :2, 0] = fr.cls_indexes
    gc[0, :2, 1:3] = fr.center
    gc[0, :2, 3] = fr.poses[2, 3, :]
    t_dev, w_dev = vertex_targets_device(jnp.asarray(fr.label[None]), jnp.asarray(gc), C, 10.0)
    np.testing.assert_allclose(np.asarray(t_dev)[0], t_host, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_dev)[0], w_host, atol=1e-6)


# ------------------------------------------------------------------- flip


def test_flip_poses_mirror_projection():
    """Projecting a flipped pose with the SAME K gives the mirrored center
    (reference _flip_poses, minibatch.py:528-539)."""
    fr = _frame()
    W = fr.color.shape[1]
    flipped = flip_poses(fr.poses, fr.intrinsic_matrix, W)
    K = fr.intrinsic_matrix
    for j in range(fr.poses.shape[2]):
        t = flipped[:, 3, j]
        x = K[0, 0] * t[0] / t[2] + K[0, 2]
        y = K[1, 1] * t[1] / t[2] + K[1, 2]
        np.testing.assert_allclose(x, W - fr.center[j, 0], atol=1e-4)
        np.testing.assert_allclose(y, fr.center[j, 1], atol=1e-4)


def test_flip_frame_consistency():
    fr = _frame()
    W = fr.color.shape[1]
    ff = flip_frame(fr)
    np.testing.assert_array_equal(ff.color, fr.color[:, ::-1])
    np.testing.assert_array_equal(ff.label, fr.label[:, ::-1])
    np.testing.assert_array_equal(ff.depth, fr.depth[:, ::-1])
    np.testing.assert_allclose(ff.center[:, 0], W - fr.center[:, 0])
    assert not ff.flipped  # consumed
    # mirrored pixels keep their class; direction targets point at the
    # mirrored center (reference convention: center_x -> W - center_x,
    # pixel x -> W-1-x — a one-pixel offset quirk kept for parity)
    t, w = generate_vertex_targets(ff.label, ff.cls_indexes, ff.center, ff.poses, C, 10.0)
    cls = 1
    y, x = np.nonzero(ff.label == cls)
    j = 0  # instance of class 1
    d = np.stack([ff.center[j, 0] - x, ff.center[j, 1] - y])
    d = d / (np.linalg.norm(d, axis=0) + 1e-10)
    np.testing.assert_allclose(t[y, x, 3 * cls], d[0], atol=1e-4)
    np.testing.assert_allclose(t[y, x, 3 * cls + 1], d[1], atol=1e-4)


def test_get_minibatch_applies_flip():
    fr = _frame()
    fr.flipped = True
    mcfg = MinibatchConfig(num_classes=C, chromatic=False, add_noise=False, device_targets=False)
    ext = np.ones((C, 3), np.float32) * 0.1
    pts = np.zeros((C, 8, 3), np.float32)
    sym = np.zeros(C, np.float32)
    b = get_minibatch([fr], mcfg, ext, pts, sym)
    fr2 = _frame()
    b2 = get_minibatch([fr2], mcfg, ext, pts, sym)
    np.testing.assert_allclose(
        b["gt_label_2d"][0], b2["gt_label_2d"][0, :, ::-1]
    )


# ------------------------------------------------------------- VERTEX_REG_3D


def test_scale_unscale_vertmap_roundtrip():
    rng = np.random.RandomState(1)
    extents = np.array([0.2, 0.1, 0.3], np.float32)
    vm = (rng.rand(8, 9, 3).astype(np.float32) - 0.5) * extents
    ys, xs = np.mgrid[0:8, 0:9]
    scaled = scale_vertmap(vm, (ys.ravel(), xs.ravel()), extents)
    assert scaled.min() >= 0.0 and scaled.max() <= 1.0
    ext_all = np.stack([np.zeros(3, np.float32), extents])
    back = unscale_vertmap(scaled, 1, ext_all)
    np.testing.assert_allclose(back, vm[ys.ravel(), xs.ravel()], atol=1e-6)


def test_vertex_targets_3d():
    fr = _frame(cls=(1, 2))
    rng = np.random.RandomState(2)
    extents = np.ones((C, 3), np.float32) * 0.2
    vm = (rng.rand(*fr.label.shape, 3).astype(np.float32) - 0.5) * 0.2
    t, w = generate_vertex_targets(
        fr.label, fr.cls_indexes, fr.center, fr.poses, C, 10.0,
        vertmap=vm, extents=extents, vertex_reg_3d=True,
    )
    y, x = np.nonzero(fr.label == 1)
    np.testing.assert_allclose(
        t[y, x, 3 : 6], vm[y, x] / 0.2 + 0.5, atol=1e-5
    )
    assert np.all(w[y, x, 3:6] == 10.0)
    assert np.all(w[fr.label == 0] == 0.0)


def test_sparse3d_loss_matches_dense():
    import jax, jax.numpy as jnp

    from posecnn_tpu.ops.losses import smooth_l1_loss_vertex
    from posecnn_tpu.ops.vertex_targets import smooth_l1_loss_vertex_sparse3d

    fr = _frame(cls=(1, 2))
    rng = np.random.RandomState(3)
    extents = np.ones((C, 3), np.float32) * 0.2
    vm = (rng.rand(*fr.label.shape, 3).astype(np.float32) - 0.5) * 0.2
    t, w = generate_vertex_targets(
        fr.label, fr.cls_indexes, fr.center, fr.poses, C, 10.0,
        vertmap=vm, extents=extents, vertex_reg_3d=True,
    )
    H, W = fr.label.shape
    pred = rng.randn(1, H, W, 3 * C).astype(np.float32)
    dense = smooth_l1_loss_vertex(jnp.asarray(pred), jnp.asarray(t[None]), jnp.asarray(w[None]))
    lab_safe = np.clip(fr.label, 0, C - 1)
    idx = 3 * lab_safe[..., None] + np.arange(3)
    t3 = np.take_along_axis(t, idx, axis=2)
    w3 = np.take_along_axis(w, idx[..., :1], axis=2)[..., 0]
    sparse = smooth_l1_loss_vertex_sparse3d(
        jnp.asarray(pred), jnp.asarray(fr.label[None]), jnp.asarray(t3[None]),
        jnp.asarray(w3[None]), C,
    )
    np.testing.assert_allclose(float(sparse), float(dense), rtol=1e-5)


def test_get_minibatch_3d_compact_blobs():
    fr = _frame(cls=(1, 2))
    rng = np.random.RandomState(4)
    fr.vertmap = (rng.rand(*fr.label.shape, 3).astype(np.float32) - 0.5) * 0.2
    mcfg = MinibatchConfig(
        num_classes=C, chromatic=False, add_noise=False,
        device_targets=True, vertex_reg_3d=True,
    )
    ext = np.ones((C, 3), np.float32) * 0.2
    b = get_minibatch([fr], mcfg, ext, np.zeros((C, 8, 3), np.float32), np.zeros(C, np.float32))
    assert b["vertex_targets3"].shape == (1,) + fr.label.shape + (3,)
    assert b["vertex_weights3"].shape == (1,) + fr.label.shape
    assert b["data"].dtype == np.uint8
    y, x = np.nonzero(fr.label > 0)
    assert np.all(b["vertex_weights3"][0, y, x] == 10.0)


# ------------------------------------------------------- input format blobs


@pytest.mark.parametrize("fmt,key", [("RGBD", "data_p"), ("DEPTH", "data"), ("NORMAL", "data")])
def test_input_format_blobs(fmt, key):
    fr = _frame()
    mcfg = MinibatchConfig(
        num_classes=C, chromatic=False, add_noise=False,
        device_targets=False, input_format=fmt,
    )
    ext = np.ones((C, 3), np.float32) * 0.1
    b = get_minibatch([fr], mcfg, ext, np.zeros((C, 8, 3), np.float32), np.zeros(C, np.float32))
    assert b[key].shape[-1] == 3
    if fmt == "RGBD":
        assert "data_p" in b and b["data"].shape == b["data_p"].shape
        # depth tower input: normalized depth tiled to 3 channels - means
        d = fr.depth.astype(np.float32)
        expect = np.tile((d / d.max() * 255.0)[:, :, None], (1, 1, 3)) - mcfg.pixel_means
        np.testing.assert_allclose(b["data_p"][0], expect, atol=1e-4)
    if fmt == "DEPTH":
        # tiled depth: channels identical before per-channel mean subtraction
        pm = np.asarray(mcfg.pixel_means).reshape(3)
        np.testing.assert_allclose(
            b["data"][0][..., 0] + pm[0], b["data"][0][..., 1] + pm[1], atol=1e-4
        )


def test_input_format_rgbd_device_targets_uint8():
    fr = _frame()
    mcfg = MinibatchConfig(
        num_classes=C, chromatic=False, add_noise=False,
        device_targets=True, input_format="RGBD",
    )
    ext = np.ones((C, 3), np.float32) * 0.1
    b = get_minibatch([fr], mcfg, ext, np.zeros((C, 8, 3), np.float32), np.zeros(C, np.float32))
    assert b["data"].dtype == np.uint8 and b["data_p"].dtype == np.uint8


def test_gan_blob():
    """TRAIN.GAN ships the [-1,1]-normalized image for the GAN models
    (gt_single_data_layer/minibatch.py:102-106)."""
    fr = _frame()
    mcfg = MinibatchConfig(num_classes=C, chromatic=False, add_noise=False,
                           device_targets=True, gan=True)
    ext = np.ones((C, 3), np.float32) * 0.1
    b = get_minibatch([fr], mcfg, ext, np.zeros((C, 8, 3), np.float32), np.zeros(C, np.float32))
    assert b["data_gan"].dtype == np.float32
    assert b["data_gan"].min() >= -1.0 and b["data_gan"].max() <= 1.0
    np.testing.assert_allclose(
        b["data_gan"][0], b["data"][0].astype(np.float32) / 127.5 - 1.0, atol=1e-5
    )
    # generator noise blob (gt_single_data_layer/minibatch.py:320)
    assert b["gan_z"].shape == (1, 100)
    assert b["gan_z"].dtype == np.float32
    assert b["gan_z"].min() >= -1.0 and b["gan_z"].max() <= 1.0


def test_rescale_points_reference_semantics():
    """ADD-loss point rescaling (minibatch.py:49-63): weight = max(10,
    2/ext_max), x4 for symmetric classes. The quaternion head's gradient
    scale depends on this — training must feed rescaled clouds (the eval
    path uses raw meters)."""
    from posecnn_tpu.data.minibatch import rescale_points

    pts = np.ones((3, 5, 3), np.float32) * 0.01
    extents = np.array([[0, 0, 0], [0.4, 0.2, 0.1], [0.05, 0.05, 0.05]], np.float32)
    sym = np.array([0, 0, 1], np.float32)
    out = rescale_points(pts, extents, sym)
    # class 1: 2/0.4 = 5 -> clamped to 10
    np.testing.assert_allclose(out[1], pts[1] * 10.0)
    # class 2 symmetric: 4 * max(10, 2/0.05=40) = 160
    np.testing.assert_allclose(out[2], pts[2] * 160.0)
    # is_symmetric=False drops the x4
    out2 = rescale_points(pts, extents, sym, is_symmetric=False)
    np.testing.assert_allclose(out2[2], pts[2] * 40.0)


def test_scales_base_train_side():
    """TRAIN.SCALES_BASE input rescale (round-2 verdict task 8): a non-1.0
    scale resizes image/label, scales centers and K (reference
    _get_image_blob, minibatch.py:180-183), and the train step runs on the
    scaled batch."""
    import jax
    import jax.numpy as jnp

    from posecnn_tpu.data.factory import get_imdb
    from posecnn_tpu.data.layer import GtSynthesizeLayer
    from posecnn_tpu.data.minibatch import MinibatchConfig, get_minibatch
    from posecnn_tpu.engine.train import TrainHParams, create_train_state, make_train_step
    from posecnn_tpu.models.posecnn import PoseCNNConfig
    from posecnn_tpu.parallel.mesh import MeshSpec, make_mesh

    imdb = get_imdb("toy_train")
    C = imdb.num_classes
    frame = imdb.load_frame(0)
    mcfg1 = MinibatchConfig(num_classes=C, chromatic=False, add_noise=False,
                            device_targets=True, scale=1.0)
    mcfg_h = MinibatchConfig(num_classes=C, chromatic=False, add_noise=False,
                             device_targets=True, scale=0.5)
    ext = np.asarray(imdb._extents)
    pts = np.asarray(imdb._points_all, np.float32)
    sym = np.asarray(imdb._symmetry, np.float32)
    b1 = get_minibatch([frame], mcfg1, ext, pts, sym)
    bh = get_minibatch([frame], mcfg_h, ext, pts, sym)
    assert bh["data"].shape[1] == b1["data"].shape[1] // 2
    assert bh["gt_label_2d"].shape[1:] == bh["data"].shape[1:3]
    # projected centers and K scale together
    np.testing.assert_allclose(
        bh["gt_centers"][0, 0, 1:3], b1["gt_centers"][0, 0, 1:3] * 0.5, rtol=1e-6
    )
    np.testing.assert_allclose(bh["meta_data"][0, 0], b1["meta_data"][0, 0] * 0.5, rtol=1e-6)
    # depth z target is resolution-independent
    np.testing.assert_allclose(bh["gt_centers"][0, 0, 3], b1["gt_centers"][0, 0, 3])

    # one train step at the scaled resolution
    cfg = PoseCNNConfig(
        num_classes=C, num_units=8, trunk_scale=0.25, vertex_reg=True,
        pose_reg=True, is_train=True, keep_prob=1.0, compute_dtype=jnp.float32,
        hough_class_slots=2, hough_max_samples=32, hough_center_stride=4,
        hough_refine_window=8, label_threshold=5, fc_dim=64,
    )
    hp = TrainHParams(stepsize=1000)
    mesh = make_mesh(MeshSpec(data=1, model=1))
    state = create_train_state(cfg, hp, jax.random.PRNGKey(0))
    step = make_train_step(cfg, hp, mesh, jnp.asarray(pts), jnp.asarray(sym),
                           jnp.asarray(ext), donate=False)
    _, metrics = step(state, bh, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_device_noise_fast_path():
    """ADD_NOISE on the device-targets COLOR path ships a per-image sigma
    instead of adding host-side noise; the train step adds the field
    in-graph (engine/train.compute_losses)."""
    import jax
    import jax.numpy as jnp

    from posecnn_tpu.data.factory import get_imdb
    from posecnn_tpu.data.minibatch import MinibatchConfig, get_minibatch

    imdb = get_imdb("toy_train")
    frame = imdb.load_frame(0)
    ext = np.asarray(imdb._extents)
    pts = np.asarray(imdb._points_all, np.float32)
    sym = np.asarray(imdb._symmetry, np.float32)
    mcfg = MinibatchConfig(num_classes=imdb.num_classes, chromatic=False,
                           add_noise=True, device_targets=True)
    rng = np.random.RandomState(0)
    b = get_minibatch([frame, frame], mcfg, ext, pts, sym, rng=rng)
    assert "noise_sigma" in b and b["noise_sigma"].shape == (2,)
    # gaussian-gated frames ship sigma > 0 and an unmodified image;
    # blur-gated frames ship sigma == 0 (blur applied host-side)
    clean = np.clip(np.round(frame.color.astype(np.float64)), 0, 255).astype(np.uint8)
    for i in range(2):
        if b["noise_sigma"][i] > 0:
            np.testing.assert_array_equal(b["data"][i, : clean.shape[0], : clean.shape[1]], clean)
    # host path (device_targets=False) keeps in-image noise, no sigma key
    mcfg2 = MinibatchConfig(num_classes=imdb.num_classes, chromatic=False,
                            add_noise=True, device_targets=False)
    b2 = get_minibatch([frame], mcfg2, ext, pts, sym, rng=np.random.RandomState(0))
    assert "noise_sigma" not in b2
