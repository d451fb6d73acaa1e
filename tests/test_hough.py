"""Golden tests for hough_voting against a loop-level NumPy oracle."""

import jax.numpy as jnp
import numpy as np

from posecnn_tpu.ops.hough_voting import hough_voting
from tests.ref_ops import hough_argmax_ref

H, W = 24, 32
C = 4


def _scene(seed=0):
    """Two blobs of class pixels whose directions point at known centers."""
    rng = np.random.RandomState(seed)
    label = np.zeros((H, W), dtype=np.int32)
    vertex = rng.randn(H, W, 3 * C).astype(np.float32) * 0.1
    centers = {1: (10.0, 8.0), 2: (24.0, 15.0)}
    depths = {1: 0.8, 2: 1.2}
    for cls, (cx, cy) in centers.items():
        for y in range(H):
            for x in range(W):
                if (x - cx) ** 2 + (y - cy) ** 2 < 36:
                    label[y, x] = cls
                    dx, dy = cx - x, cy - y
                    n = np.sqrt(dx * dx + dy * dy) + 1e-10
                    vertex[y, x, 3 * cls + 0] = dx / n
                    vertex[y, x, 3 * cls + 1] = dy / n
                    vertex[y, x, 3 * cls + 2] = np.log(depths[cls])
    extents = np.zeros((C, 3), dtype=np.float32)
    extents[1] = [0.2, 0.25, 0.2]
    extents[2] = [0.3, 0.2, 0.25]
    extents[3] = [0.1, 0.1, 0.1]
    meta = np.zeros(48, dtype=np.float32)
    meta[0], meta[4] = 60.0, 60.0  # fx, fy
    meta[2], meta[5] = W / 2.0, H / 2.0  # px, py
    return label, vertex, extents, meta, centers, depths


def _run(label, vertex, extents, meta, is_train=False, gt=None, stride=1, skip=1):
    gt = np.zeros((3, 13), dtype=np.float32) if gt is None else gt
    return hough_voting(
        jnp.asarray(label[None]),
        jnp.asarray(vertex[None]),
        jnp.asarray(extents),
        jnp.asarray(meta[None]),
        jnp.asarray(gt),
        num_classes=C,
        is_train=is_train,
        skip_pixels=skip,
        label_threshold=10,
        class_slots=3,
        max_samples=128,
        center_stride=stride,
        refine_window=8,
        sample_chunk=32,
    )


def test_hough_matches_reference_exact_grid():
    label, vertex, extents, meta, centers, depths = _scene()
    out = _run(label, vertex, extents, meta, stride=1)
    ref = hough_argmax_ref(label, vertex, extents, meta, C, skip_pixels=1, label_threshold=10)

    rois = np.asarray(out.rois)
    poses = np.asarray(out.poses_init)
    valid = np.asarray(out.valid)
    assert int(out.num_rois) == len(ref)

    got = {int(rois[i, 1]): i for i in range(len(valid)) if valid[i]}
    assert set(got.keys()) == set(ref.keys())
    fx, px, fy, py = meta[0], meta[2], meta[4], meta[5]
    for cls, (cx, cy, votes, dist, bbw, bbh) in ref.items():
        i = got[cls]
        # box center and score
        np.testing.assert_allclose(rois[i, 6], votes, rtol=1e-5)
        np.testing.assert_allclose(rois[i, 2], cx - bbw * 0.55, atol=1e-3)
        np.testing.assert_allclose(rois[i, 3], cy - bbh * 0.55, atol=1e-3)
        np.testing.assert_allclose(rois[i, 4], cx + bbw * 0.55, atol=1e-3)
        np.testing.assert_allclose(rois[i, 5], cy + bbh * 0.55, atol=1e-3)
        # initial pose
        np.testing.assert_allclose(poses[i, :4], [1, 0, 0, 0])
        np.testing.assert_allclose(poses[i, 4], (cx - px) / fx * dist, rtol=1e-4)
        np.testing.assert_allclose(poses[i, 5], (cy - py) / fy * dist, rtol=1e-4)
        np.testing.assert_allclose(poses[i, 6], dist, rtol=1e-4)
        # recovered center should be near the true one
        assert abs(cx - centers[cls][0]) <= 1.5
        assert abs(cy - centers[cls][1]) <= 1.5
        assert abs(dist - depths[cls]) < 1e-3


def test_hough_coarse_to_fine_close_to_exact():
    label, vertex, extents, meta, _, _ = _scene()
    exact = _run(label, vertex, extents, meta, stride=1)
    coarse = _run(label, vertex, extents, meta, stride=2)
    re, ce = np.asarray(exact.rois), np.asarray(coarse.rois)
    ve = np.asarray(exact.valid)
    for i in range(len(ve)):
        if ve[i]:
            # centers within the refinement window of each other
            assert abs((re[i, 2] + re[i, 4]) / 2 - (ce[i, 2] + ce[i, 4]) / 2) <= 2.0
            assert abs((re[i, 3] + re[i, 5]) / 2 - (ce[i, 3] + ce[i, 5]) / 2) <= 2.0


def test_hough_training_targets_and_jitter():
    label, vertex, extents, meta, centers, depths = _scene()
    # GT pose rows: (batch, cls, x1,y1,x2,y2 unused..., quat, T)
    gt = np.zeros((3, 13), dtype=np.float32)
    fx, px, fy, py = meta[0], meta[2], meta[4], meta[5]
    for row, cls in enumerate([1, 2]):
        cx, cy = centers[cls]
        z = depths[cls]
        q = np.array([0.5, 0.5, 0.5, 0.5], dtype=np.float32)
        t = np.array([(cx - px) / fx * z, (cy - py) / fy * z, z], dtype=np.float32)
        gt[row, 0] = 0
        gt[row, 1] = cls
        gt[row, 6:10] = q
        gt[row, 10:13] = t
    out = _run(label, vertex, extents, meta, is_train=True, gt=gt)
    rois = np.asarray(out.rois)
    valid = np.asarray(out.valid)
    tgt = np.asarray(out.poses_target)
    wgt = np.asarray(out.poses_weight)

    assert int(out.num_rois) == 2 * 9  # two detections x 9 jittered rows
    vidx = np.where(valid)[0]
    assert len(vidx) == 18
    for i in vidx:
        cls = int(rois[i, 1])
        assert wgt[i, 4 * cls : 4 * cls + 4].tolist() == [1, 1, 1, 1]
        np.testing.assert_allclose(tgt[i, 4 * cls : 4 * cls + 4], [0.5, 0.5, 0.5, 0.5])
        # weights zero everywhere else
        w = wgt[i].copy()
        w[4 * cls : 4 * cls + 4] = 0
        assert w.sum() == 0
    # 9 jitter rows per class share width/height
    for cls in (1, 2):
        rows = [i for i in vidx if int(rois[i, 1]) == cls]
        assert len(rows) == 9
        ws = rois[rows, 4] - rois[rows, 2]
        hs = rois[rows, 5] - rois[rows, 3]
        np.testing.assert_allclose(ws, ws[0], rtol=1e-5)
        np.testing.assert_allclose(hs, hs[0], rtol=1e-5)
        # the 9 top-left corners are distinct jitters
        assert len({(round(float(rois[i, 2]), 3), round(float(rois[i, 3]), 3)) for i in rows}) >= 8


def test_hough_skip_pixels_subsamples():
    label, vertex, extents, meta, _, _ = _scene()
    out1 = _run(label, vertex, extents, meta, skip=1)
    out3 = _run(label, vertex, extents, meta, skip=3)
    ref3 = hough_argmax_ref(label, vertex, extents, meta, C, skip_pixels=3, label_threshold=10)
    rois3 = np.asarray(out3.rois)
    valid3 = np.asarray(out3.valid)
    got = {int(rois3[i, 1]): i for i in range(len(valid3)) if valid3[i]}
    for cls, (cx, cy, votes, dist, bbw, bbh) in ref3.items():
        i = got[cls]
        np.testing.assert_allclose(rois3[i, 6], votes, rtol=1e-5)
    # fewer samples -> fewer votes than skip=1
    assert np.asarray(out3.rois)[:, 6].max() < np.asarray(out1.rois)[:, 6].max()


def test_hough_grid_sampling_mode():
    """pixel_grid_stride>1 (TPU fast path) must find the same centers/depths
    as the exact mode, with proportionally fewer votes."""
    label, vertex, extents, meta, centers, depths = _scene()
    exact = _run(label, vertex, extents, meta, stride=1, skip=1)
    gt = np.zeros((3, 13), dtype=np.float32)
    grid = hough_voting(
        jnp.asarray(label[None]), jnp.asarray(vertex[None]), jnp.asarray(extents),
        jnp.asarray(meta[None]), jnp.asarray(gt),
        num_classes=C, is_train=False, skip_pixels=1, label_threshold=10,
        class_slots=3, max_samples=128, center_stride=1, refine_window=8,
        sample_chunk=32, pixel_grid_stride=2,
    )
    re_, rg = np.asarray(exact.rois), np.asarray(grid.rois)
    ve, vg = np.asarray(exact.valid), np.asarray(grid.valid)
    assert int(exact.num_rois) == int(grid.num_rois)
    for i in range(len(ve)):
        if ve[i]:
            assert vg[i]
            # same class, nearby center
            assert re_[i, 1] == rg[i, 1]
            assert abs((re_[i, 2] + re_[i, 4]) - (rg[i, 2] + rg[i, 4])) / 2 <= 2.0
            assert abs((re_[i, 3] + re_[i, 5]) - (rg[i, 3] + rg[i, 5])) / 2 <= 2.0
            # ~1/4 of the candidates -> fewer votes
            assert rg[i, 6] < re_[i, 6]
    pe, pg = np.asarray(exact.poses_init), np.asarray(grid.poses_init)
    np.testing.assert_allclose(pg[ve, 6], pe[ve, 6], rtol=0.02)  # depths match


def test_hough_multi_instance_mode():
    """Two instances of the same class: the local-max mode finds both."""
    from posecnn_tpu.ops.hough_voting import hough_voting_multi

    rng = np.random.RandomState(0)
    label = np.zeros((H, W), dtype=np.int32)
    vertex = rng.randn(H, W, 3 * C).astype(np.float32) * 0.1
    centers = [(8.0, 8.0), (24.0, 14.0)]
    for cx, cy in centers:
        for y in range(H):
            for x in range(W):
                if (x - cx) ** 2 + (y - cy) ** 2 < 25:
                    label[y, x] = 1
                    dx, dy = cx - x, cy - y
                    n = np.sqrt(dx * dx + dy * dy) + 1e-10
                    vertex[y, x, 3 + 0] = dx / n
                    vertex[y, x, 3 + 1] = dy / n
                    vertex[y, x, 3 + 2] = np.log(1.0)
    extents = np.zeros((C, 3), dtype=np.float32)
    extents[1] = [0.2, 0.2, 0.2]
    meta = np.zeros(48, dtype=np.float32)
    meta[0], meta[4] = 60.0, 60.0
    meta[2], meta[5] = W / 2.0, H / 2.0
    out = hough_voting_multi(
        jnp.asarray(label[None]), jnp.asarray(vertex[None]), jnp.asarray(extents),
        jnp.asarray(meta[None]), jnp.asarray(np.zeros((2, 13), np.float32)),
        num_classes=C, is_train=False, voting_threshold=3.0, per_threshold=0.0,
        skip_pixels=1, label_threshold=10, class_slots=2, max_samples=128,
        max_detections_per_image=8, sample_chunk=32,
    )
    rois = np.asarray(out.rois)
    valid = np.asarray(out.valid)
    dets = rois[valid]
    assert len(dets) >= 2
    found_centers = {( round((r[2]+r[4])/2), round((r[3]+r[5])/2) ) for r in dets[:2]}
    for cx, cy in centers:
        assert any(abs(fx-cx) <= 2 and abs(fy-cy) <= 2 for fx, fy in found_centers), (found_centers, (cx,cy))


def test_pallas_vote_kernel_matches_jax():
    """The Pallas vote-accumulation kernel (interpret mode) must match the
    XLA broadcast-reduce path bit-for-bit on the same f32 math."""
    from posecnn_tpu.ops.pallas.voting import accumulate_votes_slots

    rng = np.random.RandomState(3)
    S, P, NC = 3, 128, 300  # NC deliberately not a multiple of the block
    px = rng.uniform(0, W, (S, P)).astype(np.float32)
    py = rng.uniform(0, H, (S, P)).astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi, (S, P)).astype(np.float32)
    u, v = np.cos(ang), np.sin(ang)
    d = rng.uniform(0.5, 2.0, (S, P)).astype(np.float32)
    thr = rng.uniform(2.0, 12.0, (S, P)).astype(np.float32)
    tn1 = 0.9 * np.sqrt(u * u + v * v)
    val = (rng.rand(S, P) > 0.2).astype(np.float32)
    samples = jnp.asarray(
        np.stack([px, py, u, v, d, thr, tn1, val], axis=1).astype(np.float32)
    )
    cx = rng.uniform(0, W, NC).astype(np.float32)
    cy = rng.uniform(0, H, NC).astype(np.float32)
    centers = jnp.asarray(np.stack([cx, cy], axis=0))

    v_ref, d_ref = accumulate_votes_slots(samples, centers, use_pallas=False)
    v_pl, d_pl = accumulate_votes_slots(samples, centers, use_pallas=True, interpret=True, block=128)
    np.testing.assert_allclose(np.asarray(v_pl), np.asarray(v_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref), rtol=1e-6, atol=1e-5)


def test_hough_pallas_path_matches_default():
    """hough_voting with the packed pallas front-end (interpret kernel via
    monkeypatched backend selection) equals the lax.map path end-to-end."""
    import posecnn_tpu.ops.pallas.voting as V

    label, vertex, extents, meta, centers, depths = _scene()
    args = (
        jnp.asarray(label[None]), jnp.asarray(vertex[None]), jnp.asarray(extents),
        jnp.asarray(meta[None]), jnp.asarray(np.zeros((1, 13), np.float32)),
    )
    kw = dict(num_classes=C, is_train=False, skip_pixels=1, label_threshold=10,
              class_slots=2, max_samples=256, center_stride=4, refine_window=8,
              sample_chunk=64)
    ref = hough_voting(*args, use_pallas=False, **kw)

    orig = V._votes_pallas
    try:
        V._votes_pallas = lambda s, c, block, interpret: orig(s, c, block, True)
        out = hough_voting(*args, use_pallas=True, **kw)
    finally:
        V._votes_pallas = orig
    np.testing.assert_allclose(np.asarray(out.rois), np.asarray(ref.rois), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.poses_init), np.asarray(ref.poses_init), atol=1e-4)


def test_approx_sampler_detects_same_centers():
    """The approx_max_k sampler must find the same object centers as the
    exact compaction sampler (sample SET differs; vote argmax must not)."""
    label, vertex, extents, meta, centers, depths = _scene()
    args = (
        jnp.asarray(label[None]), jnp.asarray(vertex[None]), jnp.asarray(extents),
        jnp.asarray(meta[None]), jnp.asarray(np.zeros((1, 13), np.float32)),
    )
    kw = dict(num_classes=C, is_train=False, skip_pixels=1, label_threshold=10,
              class_slots=2, max_samples=256, center_stride=1, use_pallas=False)
    exact = hough_voting(*args, sampler="exact", **kw)
    approx = hough_voting(*args, sampler="approx", **kw)
    r_e = np.asarray(exact.rois)[np.asarray(exact.valid)]
    r_a = np.asarray(approx.rois)[np.asarray(approx.valid)]
    assert len(r_e) == len(r_a) == 2
    for re_, ra in zip(r_e, r_a):
        assert re_[1] == ra[1]  # same class
        # same voted center within a couple of pixels
        assert abs((re_[2] + re_[4]) / 2 - (ra[2] + ra[4]) / 2) <= 2
        assert abs((re_[3] + re_[5]) / 2 - (ra[3] + ra[5]) / 2) <= 2
    # initial translations agree to a few percent (depth from voted inliers)
    p_e = np.asarray(exact.poses_init)[np.asarray(exact.valid)]
    p_a = np.asarray(approx.poses_init)[np.asarray(approx.valid)]
    np.testing.assert_allclose(p_a[:, 6], p_e[:, 6], rtol=0.05)
