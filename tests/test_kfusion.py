"""TSDF fusion pipeline tests: fuse a synthetic depth scene, check the
reconstructed surface, raycast consistency and ICP odometry recovery."""

import jax.numpy as jnp
import numpy as np

from posecnn_tpu.engine.kfusion import (
    bilateral_filter,
    create_volume,
    extract_surface,
    fuse_depth,
    raycast,
)

H, W = 48, 64
K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)
IDENT = np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32)


def _plane_depth(z=1.0):
    return np.full((H, W), z, np.float32)


def test_bilateral_filter_preserves_plane_and_edges():
    d = _plane_depth(1.0)
    d[:, W // 2 :] = 2.0
    noisy = d + np.random.RandomState(0).randn(H, W).astype(np.float32) * 0.005
    f = np.asarray(bilateral_filter(jnp.asarray(noisy)))
    # noise reduced
    assert np.abs(f[:, : W // 2 - 3] - 1.0).mean() < np.abs(noisy[:, : W // 2 - 3] - 1.0).mean()
    # the depth edge survives
    assert abs(f[H // 2, W // 2 + 3] - 2.0) < 0.05
    assert abs(f[H // 2, W // 2 - 4] - 1.0) < 0.05


def test_fuse_and_extract_plane():
    vol = create_volume(64, origin=(-1.0, -1.0, 0.0), voxel_size=0.05)
    depth = jnp.asarray(_plane_depth(1.0))
    for _ in range(3):
        vol = fuse_depth(vol, depth, jnp.asarray(K), jnp.asarray(IDENT))
    pts, valid, _ = extract_surface(vol, max_points=2048)
    pts = np.asarray(pts)[np.asarray(valid)]
    assert len(pts) > 50
    # surface voxels concentrate near z=1
    assert abs(np.median(pts[:, 2]) - 1.0) < 0.08


def test_raycast_recovers_fused_depth():
    vol = create_volume(64, origin=(-1.0, -1.0, 0.0), voxel_size=0.05)
    depth = jnp.asarray(_plane_depth(1.0))
    for _ in range(3):
        vol = fuse_depth(vol, depth, jnp.asarray(K), jnp.asarray(IDENT))
    d2, hit = raycast(vol, jnp.asarray(K), jnp.asarray(IDENT), H, W)
    d2, hit = np.asarray(d2), np.asarray(hit)
    center = d2[H // 4 : -H // 4, W // 4 : -W // 4]
    hit_c = hit[H // 4 : -H // 4, W // 4 : -W // 4]
    assert hit_c.mean() > 0.9
    assert abs(np.median(center[hit_c]) - 1.0) < 0.12


def test_class_probability_fusion():
    vol = create_volume(48, origin=(-1.0, -1.0, 0.0), voxel_size=0.06, num_classes=3)
    depth = jnp.asarray(_plane_depth(1.0))
    prob = np.zeros((H, W, 3), np.float32)
    prob[:, : W // 2, 1] = 1.0
    prob[:, W // 2 :, 2] = 1.0
    vol = fuse_depth(vol, depth, jnp.asarray(K), jnp.asarray(IDENT), label_prob=jnp.asarray(prob))
    pts, valid, labels = extract_surface(vol, max_points=2048)
    pts, labels = np.asarray(pts)[np.asarray(valid)], np.asarray(labels)[np.asarray(valid)]
    left = pts[:, 0] < -0.05
    right = pts[:, 0] > 0.05
    if left.sum() > 5:
        assert (labels[left] == 1).mean() > 0.8
    if right.sum() > 5:
        assert (labels[right] == 2).mean() > 0.8


def test_video_eval_with_kfusion():
    """test_net_video with the TSDF pipeline enabled: runs end-to-end on the
    toy dataset (treated as one video) and produces surfaces."""
    import jax
    import numpy as np

    from posecnn_tpu.data.factory import get_imdb
    from posecnn_tpu.data.imdb import PoseEvaluator
    from posecnn_tpu.engine.test import test_net_video
    from posecnn_tpu.models.video import VideoConfig, init_video_params

    imdb = get_imdb("toy_val")
    cfg = VideoConfig(
        num_classes=imdb.num_classes, num_units=8, compute_dtype=jnp.float32
    )
    params = init_video_params(jax.random.PRNGKey(0), cfg)

    class TwoFrames:
        num_images = 2
        image_index = ["vid/000001", "vid/000002"]

        def load_frame(self, i):
            return imdb.load_frame(i)

    ev = PoseEvaluator(imdb.classes, imdb._extents, imdb._points, [])
    test_net_video(
        params, cfg, TwoFrames(), [102.98, 115.95, 122.77],
        evaluator=ev, kfusion=True, kfusion_grid=32, log=None,
    )
    assert len(ev.surfaces) == 1
    pts, labels = ev.surfaces[0]
    assert pts.ndim == 2 and pts.shape[1] == 3
