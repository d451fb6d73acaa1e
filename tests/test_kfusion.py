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


def test_marching_tetrahedra_sphere():
    """Mesh extraction on an analytic sphere SDF: triangles on the surface,
    consistent with the radius, fixed output shapes."""
    from posecnn_tpu.engine.kfusion import marching_tetrahedra

    G, vs = 32, 0.05
    vol = create_volume(G, origin=(-0.8, -0.8, -0.8), voxel_size=vs)
    gi = np.stack(np.meshgrid(*[np.arange(G)] * 3, indexing="ij"), -1)
    pts = np.asarray(vol.origin) + gi * vs
    r = np.linalg.norm(pts, axis=-1)
    sdf = np.clip((r - 0.5) / vol.truncation, -1, 1).astype(np.float32)
    vol = vol.__class__(
        sdf=jnp.asarray(sdf), weight=jnp.ones((G, G, G), jnp.float32),
        origin=vol.origin, voxel_size=vs, truncation=vol.truncation,
        class_prob=None,
    )
    tris, valid, labels = marching_tetrahedra(vol, max_cells=8192)
    tris, valid = np.asarray(tris), np.asarray(valid)
    assert tris.shape == (8192 * 12, 3, 3) and valid.shape == (8192 * 12,)
    v = tris[valid]
    assert v.shape[0] > 500  # a 0.5m sphere in a 32^3 grid has ~2-5K tris
    # every vertex lies on the zero level set to within a voxel
    rr = np.linalg.norm(v.reshape(-1, 3), axis=-1)
    assert np.abs(rr - 0.5).max() < vs
    # triangles are non-degenerate (distinct vertices)
    e1 = np.linalg.norm(v[:, 1] - v[:, 0], axis=-1)
    e2 = np.linalg.norm(v[:, 2] - v[:, 0], axis=-1)
    assert (e1 > 1e-6).all() and (e2 > 1e-6).all()
    # total mesh area approximates the sphere area 4*pi*r^2 (within 20%)
    n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    area = 0.5 * np.linalg.norm(n, axis=-1).sum()
    assert abs(area - 4 * np.pi * 0.25) / (4 * np.pi * 0.25) < 0.2


def test_marching_tetrahedra_labels_from_class_grid():
    from posecnn_tpu.engine.kfusion import marching_tetrahedra

    G, vs, C = 16, 0.1, 3
    vol = create_volume(G, origin=(-0.8, -0.8, -0.8), voxel_size=vs, num_classes=C)
    gi = np.stack(np.meshgrid(*[np.arange(G)] * 3, indexing="ij"), -1)
    pts = np.asarray(vol.origin) + gi * vs
    sdf = np.clip((np.linalg.norm(pts, axis=-1) - 0.4) / vol.truncation, -1, 1)
    cp = np.zeros((G, G, G, C), np.float32)
    cp[..., 2] = 1.0  # every voxel votes class 2
    vol = vol.__class__(
        sdf=jnp.asarray(sdf.astype(np.float32)), weight=jnp.ones((G, G, G), jnp.float32),
        origin=vol.origin, voxel_size=vs, truncation=vol.truncation,
        class_prob=jnp.asarray(cp),
    )
    tris, valid, labels = marching_tetrahedra(vol, max_cells=2048)
    labels, valid = np.asarray(labels), np.asarray(valid)
    assert (labels[valid] == 2).all()
