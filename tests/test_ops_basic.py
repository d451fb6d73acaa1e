"""Golden-value tests for the simple ops vs NumPy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posecnn_tpu.ops import (
    average_distance_loss,
    bbox_overlaps,
    gradient_reversal,
    hard_label,
    loss_cross_entropy_single_frame,
    nms_jax,
    nms_np,
    roi_pool,
    smooth_l1_loss_vertex,
)
from posecnn_tpu.utils.quaternion import mat2quat, quat2mat
from posecnn_tpu.utils import quaternion_np as qnp
from tests.ref_ops import add_loss_ref, hard_label_ref, roi_pool_ref

RNG = np.random.RandomState(3)


def test_hard_label_matches_reference():
    B, H, W, C = 2, 5, 6, 4
    prob = RNG.rand(B, H, W, C).astype(np.float32)
    gt = RNG.randint(-1, C, size=(B, H, W)).astype(np.int32)
    out = np.asarray(hard_label(jnp.asarray(prob), jnp.asarray(gt), threshold=0.5))
    ref = hard_label_ref(prob, gt, 0.5)
    np.testing.assert_array_equal(out, ref)


def test_hard_label_zero_gradient():
    prob = jnp.asarray(RNG.rand(1, 3, 3, 4).astype(np.float32))
    gt = jnp.asarray(RNG.randint(0, 4, size=(1, 3, 3)).astype(np.int32))
    g = jax.grad(lambda p: jnp.sum(hard_label(p, gt, 1.0) * p))(prob)
    # d(stop_grad(h)*p)/dp = h — no gradient through h itself
    np.testing.assert_allclose(np.asarray(g), np.asarray(hard_label(prob, gt, 1.0)))


def test_gradient_reversal():
    x = jnp.asarray(RNG.randn(4, 3).astype(np.float32))
    y, vjp = jax.vjp(lambda a: gradient_reversal(a, 0.25), x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    (gx,) = vjp(jnp.ones_like(x))
    np.testing.assert_allclose(np.asarray(gx), -0.25 * np.ones_like(x))


def test_quat2mat_matches_numpy():
    for _ in range(10):
        q = RNG.randn(4)
        q = q / np.linalg.norm(q)
        Rj = np.asarray(quat2mat(jnp.asarray(q, dtype=jnp.float32)))
        Rn = qnp.quat2mat(q)
        np.testing.assert_allclose(Rj, Rn, atol=1e-5)


def test_mat2quat_roundtrip():
    for _ in range(10):
        q = RNG.randn(4)
        q = q / np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = qnp.quat2mat(q)
        q2 = np.asarray(mat2quat(jnp.asarray(R, dtype=jnp.float32)))
        np.testing.assert_allclose(q2, q, atol=1e-4)


def test_bbox_overlaps_matches_loop():
    boxes = RNG.rand(7, 4).astype(np.float32) * 50
    boxes[:, 2:] += boxes[:, :2] + 1
    query = RNG.rand(5, 4).astype(np.float32) * 50
    query[:, 2:] += query[:, :2] + 1
    out = np.asarray(bbox_overlaps(jnp.asarray(boxes), jnp.asarray(query)))
    ref = np.zeros((7, 5))
    for n in range(7):
        for k in range(5):
            iw = min(boxes[n, 2], query[k, 2]) - max(boxes[n, 0], query[k, 0]) + 1
            ih = min(boxes[n, 3], query[k, 3]) - max(boxes[n, 1], query[k, 1]) + 1
            if iw > 0 and ih > 0:
                ua = (
                    (boxes[n, 2] - boxes[n, 0] + 1) * (boxes[n, 3] - boxes[n, 1] + 1)
                    + (query[k, 2] - query[k, 0] + 1) * (query[k, 3] - query[k, 1] + 1)
                    - iw * ih
                )
                ref[n, k] = iw * ih / ua
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_nms_jax_matches_numpy():
    n = 30
    boxes = RNG.rand(n, 4).astype(np.float32) * 40
    boxes[:, 2:] = boxes[:, :2] + RNG.rand(n, 2).astype(np.float32) * 30 + 1
    scores = RNG.rand(n).astype(np.float32)
    dets = np.concatenate([boxes, scores[:, None]], axis=1)
    keep_np = set(nms_np(dets, 0.4).tolist())
    keep_mask = np.asarray(nms_jax(jnp.asarray(boxes), jnp.asarray(scores), 0.4))
    keep_jax = set(np.where(keep_mask)[0].tolist())
    assert keep_np == keep_jax


def test_roi_pool_matches_reference():
    B, H, W, C = 2, 8, 10, 6
    feat = RNG.randn(B, H, W, C).astype(np.float32)
    rois = np.zeros((5, 7), dtype=np.float32)
    for r in range(5):
        rois[r, 0] = RNG.randint(0, B)
        rois[r, 1] = RNG.randint(0, C)
        x1, y1 = RNG.randint(0, 60), RNG.randint(0, 40)
        rois[r, 2:6] = [x1, y1, x1 + RNG.randint(8, 80), y1 + RNG.randint(8, 60)]
    out = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois), 4, 4, 1.0 / 8.0))
    ref = roi_pool_ref(feat, rois, 4, 1.0 / 8.0)
    np.testing.assert_allclose(out, ref, atol=1e-6)
    # pool_channel variant
    outc = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois), 4, 4, 1.0 / 8.0, pool_channel=True))
    refc = roi_pool_ref(feat, rois, 4, 1.0 / 8.0, pool_channel=True)
    np.testing.assert_allclose(outc, refc, atol=1e-6)


def test_roi_pool_backward_argmax_scatter():
    """Gradient of sum(out) puts exactly 1 at each non-empty bin's argmax
    (the CUDA op's saved-argmax backward, roi_pooling_op_gpu.cu.cc backward)."""
    B, H, W, C = 1, 12, 16, 3
    feat = RNG.randn(B, H, W, C).astype(np.float32)  # distinct values: no ties
    rois = np.array([[0, 1, 8, 8, 72, 56, 1.0], [0, 2, 0, 0, 120, 88, 1.0]], np.float32)

    def f(x):
        return jnp.sum(roi_pool(x, jnp.asarray(rois), 4, 4, 1.0 / 8.0))

    g = np.asarray(jax.grad(f)(jnp.asarray(feat)))
    out = roi_pool_ref(feat, rois, 4, 1.0 / 8.0)
    # every gradient entry is a non-negative integer (bin-count multiplicity)
    assert np.all(g >= 0) and np.allclose(g, np.round(g))
    # total mass == number of non-empty bins
    nonempty = sum(
        1
        for r in range(2)
        for i in range(4)
        for j in range(4)
        for c in range(C)
        if out[r, i, j, c] != 0.0
    )
    assert int(g.sum()) == nonempty


def test_roi_pool_batched_grads_match_autodiff():
    """roi_pool_batched's manual VJP (one-hot-matmul scatter + level chain)
    == autodiff through the generic roi_pool table path (no ties with
    random f32 features)."""
    from posecnn_tpu.ops.roi_pool import roi_pool_batched

    B, H, W, C, D = 2, 10, 16, 4, 3
    feat = RNG.randn(B, H, W, C).astype(np.float32)
    rois = np.zeros((B, D, 7), np.float32)
    rois[..., 2] = RNG.uniform(0, 60, (B, D))
    rois[..., 3] = RNG.uniform(0, 40, (B, D))
    rois[..., 4] = rois[..., 2] + RNG.uniform(16, 80, (B, D))
    rois[..., 5] = rois[..., 3] + RNG.uniform(16, 60, (B, D))
    flat = rois.reshape(B * D, 7).copy()
    flat[:, 0] = np.repeat(np.arange(B), D)
    cot = RNG.randn(B, D, 4, 4, C).astype(np.float32)

    def f_batched(x):
        return jnp.sum(roi_pool_batched(x, jnp.asarray(rois), 4, 1.0 / 8.0) * cot)

    def f_generic(x):
        out = roi_pool(x, jnp.asarray(flat), 4, 4, 1.0 / 8.0)
        return jnp.sum(out * cot.reshape(B * D, 4, 4, C))

    ob = np.asarray(roi_pool_batched(jnp.asarray(feat), jnp.asarray(rois), 4, 1.0 / 8.0))
    og = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(flat), 4, 4, 1.0 / 8.0))
    np.testing.assert_allclose(ob.reshape(B * D, 4, 4, C), og, atol=1e-6)
    gb = np.asarray(jax.grad(f_batched)(jnp.asarray(feat)))
    gg = np.asarray(jax.grad(f_generic)(jnp.asarray(feat)))
    np.testing.assert_allclose(gb, gg, atol=1e-4, rtol=1e-4)


def _random_add_inputs(n_rows=6, C=5, P=40, seed=0):
    rng = np.random.RandomState(seed)
    pred = rng.randn(n_rows, 4 * C).astype(np.float32)
    target = rng.randn(n_rows, 4 * C).astype(np.float32)
    # normalize the quaternion slots
    for n in range(n_rows):
        for c in range(C):
            for arr in (pred, target):
                q = arr[n, 4 * c : 4 * c + 4]
                arr[n, 4 * c : 4 * c + 4] = q / np.linalg.norm(q)
    weight = np.zeros((n_rows, 4 * C), dtype=np.float32)
    for n in range(n_rows - 1):  # leave last row inactive
        c = rng.randint(1, C)
        weight[n, 4 * c : 4 * c + 4] = 1.0
    points = rng.randn(C, P, 3).astype(np.float32) * 0.05
    symmetry = np.array([0, 0, 1, 0, 1], dtype=np.float32)[:C]
    return pred, target, weight, points, symmetry


def test_add_loss_matches_reference():
    pred, target, weight, points, symmetry = _random_add_inputs()
    # margin=0: no hinge boundary, so f32-vs-f64 rounding cannot flip a point
    # in or out of the loss; the comparison is tight. A margin>0 case is
    # checked loosely (boundary points may flip, like the CUDA kernel vs any
    # other-precision oracle would).
    for margin, rtol in ((0.0, 1e-3), (0.01, 5e-3)):
        loss = average_distance_loss(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(weight),
            jnp.asarray(points), jnp.asarray(symmetry), margin, 2,
        )
        ref_loss, ref_diff = add_loss_ref(pred, target, weight, points, symmetry, margin)
        np.testing.assert_allclose(float(loss), ref_loss, rtol=rtol, atol=1e-7)

        grad = jax.grad(
            lambda p: average_distance_loss(
                p, jnp.asarray(target), jnp.asarray(weight),
                jnp.asarray(points), jnp.asarray(symmetry), margin, 2,
            )
        )(jnp.asarray(pred))
        np.testing.assert_allclose(np.asarray(grad), ref_diff, rtol=rtol * 10, atol=1e-5)


def test_add_loss_adds_leq_add():
    # property: for a symmetric class, NN matching can only decrease distance
    rng = np.random.RandomState(1)
    C, P = 3, 64
    pred = rng.randn(2, 4 * C).astype(np.float32)
    target = rng.randn(2, 4 * C).astype(np.float32)
    for arr in (pred, target):
        for n in range(2):
            for c in range(C):
                q = arr[n, 4 * c : 4 * c + 4]
                arr[n, 4 * c : 4 * c + 4] = q / np.linalg.norm(q)
    weight = np.zeros((2, 4 * C), dtype=np.float32)
    weight[:, 4 * 1 : 4 * 1 + 4] = 1.0
    points = rng.randn(C, P, 3).astype(np.float32) * 0.1
    sym_on = np.array([0, 1, 0], dtype=np.float32)
    sym_off = np.zeros(3, dtype=np.float32)
    args = (jnp.asarray(pred), jnp.asarray(target), jnp.asarray(weight), jnp.asarray(points))
    loss_s = float(average_distance_loss(*args, jnp.asarray(sym_on), 0.0, 2))
    loss_a = float(average_distance_loss(*args, jnp.asarray(sym_off), 0.0, 2))
    assert loss_s <= loss_a + 1e-7


def test_smooth_l1_and_ce():
    pred = jnp.asarray(RNG.randn(2, 4, 4, 6).astype(np.float32))
    tgt = jnp.asarray(RNG.randn(2, 4, 4, 6).astype(np.float32))
    w = jnp.asarray((RNG.rand(2, 4, 4, 6) > 0.5).astype(np.float32))
    loss = float(smooth_l1_loss_vertex(pred, tgt, w))
    diff = np.asarray(w) * (np.asarray(pred) - np.asarray(tgt))
    ad = np.abs(diff)
    in_loss = np.where(ad < 1.0, 0.5 * diff ** 2, ad - 0.5)
    ref = in_loss.sum() / (np.asarray(w).sum() + 1e-10)
    np.testing.assert_allclose(loss, ref, rtol=1e-5)

    scores = jax.nn.log_softmax(pred, axis=-1)
    labels = jax.nn.one_hot(jnp.argmax(tgt, axis=-1), 6)
    ce = float(loss_cross_entropy_single_frame(scores, labels))
    ref_ce = float((-np.asarray(labels) * np.asarray(scores)).sum(-1).sum() / (np.asarray(labels).sum() + 1e-10))
    np.testing.assert_allclose(ce, ref_ce, rtol=1e-5)


def test_vertex_targets_device_matches_numpy():
    """In-graph target generation == the host generator (minibatch.py:577-602)."""
    import numpy as np

    from posecnn_tpu.data.minibatch import generate_vertex_targets
    from posecnn_tpu.ops.vertex_targets import vertex_targets_device

    rng = np.random.RandomState(0)
    B, H, W, C, G = 2, 24, 32, 5, 6
    labels, gcs, refs_t, refs_w = [], [], [], []
    for b in range(B):
        label = rng.randint(0, C, size=(H, W)).astype(np.int32)
        n_inst = 3
        cls_indexes = np.array([1, 3, 4], np.float32)
        centers = rng.uniform(0, 30, (n_inst, 2)).astype(np.float32)
        poses = np.zeros((3, 4, n_inst), np.float32)
        poses[2, 3, :] = rng.uniform(0.5, 2.0, n_inst)
        t, w = generate_vertex_targets(label, cls_indexes, centers, poses, C, 10.0)
        gc = np.zeros((G, 4), np.float32)
        gc[:n_inst, 0] = cls_indexes
        gc[:n_inst, 1:3] = centers
        gc[:n_inst, 3] = poses[2, 3, :]
        labels.append(label); gcs.append(gc); refs_t.append(t); refs_w.append(w)

    td, wd = vertex_targets_device(
        jnp.asarray(np.stack(labels)), jnp.asarray(np.stack(gcs)), C, 10.0
    )
    # class 2 appears in labels but not in GT -> numpy leaves zeros; device
    # masks via the found bit. Compare everything.
    np.testing.assert_allclose(np.asarray(td), np.stack(refs_t), atol=1e-5)
    np.testing.assert_allclose(np.asarray(wd), np.stack(refs_w), atol=1e-6)


def test_sparse_ce_matches_dense_hard_label_path():
    """Fused logits CE == hard_label + log_softmax + dense CE (values+grads)."""
    from posecnn_tpu.ops.hard_label import hard_label
    from posecnn_tpu.ops.losses import loss_cross_entropy_hard_label_sparse

    rng = np.random.RandomState(3)
    B, H, W, C = 2, 9, 11, 6
    score = rng.randn(B, H, W, C).astype(np.float32)
    gt = rng.randint(0, C, (B, H, W)).astype(np.int32)
    gt[0, :2, :] = -1  # adaptation pixels
    for thr in (1.0, 0.7):
        def dense(s):
            prob = jax.nn.softmax(s, axis=-1)
            labels = hard_label(prob, jnp.asarray(gt), thr)
            return loss_cross_entropy_single_frame(jax.nn.log_softmax(s, axis=-1), labels)

        def sparse(s):
            return loss_cross_entropy_hard_label_sparse(s, jnp.asarray(gt), thr)

        ld, gd = jax.value_and_grad(dense)(jnp.asarray(score))
        ls, gs = jax.value_and_grad(sparse)(jnp.asarray(score))
        np.testing.assert_allclose(float(ls), float(ld), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), atol=1e-6)


def test_sparse_vertex_loss_matches_dense_path():
    """Fused targets+smooth-L1 == vertex_targets_device + dense loss (values+grads)."""
    from posecnn_tpu.ops.vertex_targets import (
        smooth_l1_loss_vertex_sparse,
        vertex_targets_device,
    )

    rng = np.random.RandomState(4)
    B, H, W, C, G = 2, 12, 16, 5, 6
    label = rng.randint(-1, C, (B, H, W)).astype(np.int32)
    gc = np.zeros((B, G, 4), np.float32)
    gc[:, :3, 0] = [1, 3, 4]
    gc[:, :3, 1] = rng.uniform(0, W, (B, 3))
    gc[:, :3, 2] = rng.uniform(0, H, (B, 3))
    gc[:, :3, 3] = rng.uniform(0.5, 2.0, (B, 3))
    pred = rng.randn(B, H, W, 3 * C).astype(np.float32) * 0.1

    def dense(p):
        t, w = vertex_targets_device(jnp.asarray(label), jnp.asarray(gc), C, 10.0)
        return smooth_l1_loss_vertex(p, t, w)

    def sparse(p):
        return smooth_l1_loss_vertex_sparse(p, jnp.asarray(label), jnp.asarray(gc), C, 10.0)

    ld, gd = jax.value_and_grad(dense)(jnp.asarray(pred))
    ls, gs = jax.value_and_grad(sparse)(jnp.asarray(pred))
    np.testing.assert_allclose(float(ls), float(ld), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gd), atol=1e-6)


def test_sparse_vertex_loss_z_obj_norm():
    """TPU.VERTEX_Z_OBJ_NORM: equal-size instances reduce to the parity
    path exactly; unequal sizes shift z-channel gradient share toward the
    small (far) instance while leaving direction channels untouched."""
    from posecnn_tpu.ops.vertex_targets import smooth_l1_loss_vertex_sparse

    rng = np.random.RandomState(7)
    B, H, W, C = 1, 16, 16, 3

    # two instances of EQUAL pixel count -> factor == 1 everywhere
    label_eq = np.zeros((B, H, W), np.int32)
    label_eq[0, :4, :8] = 1
    label_eq[0, 8:12, 8:] = 2
    gc = np.zeros((B, 4, 4), np.float32)
    gc[0, 0] = [1, 4.0, 2.0, 0.6]
    gc[0, 1] = [2, 12.0, 10.0, 1.8]
    pred = jnp.asarray(rng.randn(B, H, W, 3 * C).astype(np.float32) * 0.1)

    base = smooth_l1_loss_vertex_sparse(pred, jnp.asarray(label_eq), jnp.asarray(gc), C, 10.0)
    norm = smooth_l1_loss_vertex_sparse(
        pred, jnp.asarray(label_eq), jnp.asarray(gc), C, 10.0, z_obj_norm=True)
    np.testing.assert_allclose(float(norm), float(base), rtol=1e-6)

    # unequal: class 1 has 16x the pixels of class 2
    label_uneq = np.zeros((B, H, W), np.int32)
    label_uneq[0, :8, :16] = 1   # 128 px (near, large)
    label_uneq[0, 12:14, 2:6] = 2  # 8 px (far, small)

    def loss_fn(p, z_obj_norm):
        return smooth_l1_loss_vertex_sparse(
            p, jnp.asarray(label_uneq), jnp.asarray(gc), C, 10.0,
            z_obj_norm=z_obj_norm)

    g_base = jax.grad(lambda p: loss_fn(p, False))(pred).reshape(B, H, W, C, 3)
    g_norm = jax.grad(lambda p: loss_fn(p, True))(pred).reshape(B, H, W, C, 3)

    # z-gradient mass on the small instance rises relative to the large one
    def z_mass(g, cls, mask):
        return float(jnp.abs(g[0, :, :, cls, 2])[jnp.asarray(mask)].sum())

    m1, m2 = label_uneq[0] == 1, label_uneq[0] == 2
    ratio_base = z_mass(g_base, 2, m2) / z_mass(g_base, 1, m1)
    ratio_norm = z_mass(g_norm, 2, m2) / z_mass(g_norm, 1, m1)
    assert ratio_norm > 2.0 * ratio_base, (ratio_base, ratio_norm)

    # direction channels: same gradient *direction* per pixel (only the
    # global normalization constant differs)
    gd_base, gd_norm = g_base[..., :2], g_norm[..., :2]
    scale = float(jnp.sum(gd_base * gd_norm) / (jnp.sum(gd_norm * gd_norm) + 1e-12))
    np.testing.assert_allclose(
        np.asarray(gd_base), scale * np.asarray(gd_norm), atol=1e-6)


def test_vertex_targets_device_adaptation_frame():
    import numpy as np

    from posecnn_tpu.ops.vertex_targets import vertex_targets_device

    label = -1 * np.ones((1, 8, 8), np.int32)
    gc = np.zeros((1, 4, 4), np.float32)
    t, w = vertex_targets_device(jnp.asarray(label), jnp.asarray(gc), 3, 10.0)
    assert float(jnp.abs(t).sum()) == 0.0 and float(w.sum()) == 0.0
