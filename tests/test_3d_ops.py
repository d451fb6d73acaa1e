"""Golden tests for the 3D voxel / flow ops vs loop oracles."""

import jax.numpy as jnp
import numpy as np

from posecnn_tpu.ops.backproject import backproject, compute_label, project
from posecnn_tpu.ops.compute_flow import compute_flow

G = 8
H, W, C = 6, 8, 3
NCLS = 4


def _meta():
    meta = np.zeros(48, dtype=np.float32)
    K = np.array([[10.0, 0, W / 2], [0, 10.0, H / 2], [0, 0, 1]])
    meta[0:9] = K.flatten()
    meta[9:18] = np.linalg.inv(K).flatten()
    meta[18:30] = np.hstack([np.eye(3), np.zeros((3, 1))]).flatten()  # world2live
    meta[30:42] = np.hstack([np.eye(3), np.zeros((3, 1))]).flatten()  # live2world
    meta[42:45] = [0.25, 0.25, 0.25]  # step
    meta[45:48] = [-1.0, -1.0, 0.0]  # origin
    return meta


def _project_ref(vox, depth, meta):
    K = meta[0:9].reshape(3, 3)
    Kinv = meta[9:18].reshape(3, 3)
    l2w = meta[30:42].reshape(3, 4)
    step, origin = meta[42:45], meta[45:48]
    out = np.zeros((H, W, vox.shape[-1]), np.float32)
    for h in range(H):
        for w in range(W):
            d = depth[h, w]
            r = Kinv @ np.array([w, h, 1.0])
            p = d * r
            p1 = l2w[:, :3] @ p + l2w[:, 3]
            v = np.round((p1 - origin) / step).astype(int)
            if all(0 <= v[i] < G for i in range(3)):
                out[h, w] = vox[v[0], v[1], v[2]]
    return out


def test_project_matches_loop():
    rng = np.random.RandomState(0)
    vox = rng.randn(G, G, G, C).astype(np.float32)
    depth = (0.5 + rng.rand(H, W)).astype(np.float32)
    meta = _meta()
    out = np.asarray(project(jnp.asarray(vox[None]), jnp.asarray(depth[None]), jnp.asarray(meta[None]), G))[0]
    ref = _project_ref(vox, depth, meta)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_compute_label_argmax():
    rng = np.random.RandomState(1)
    vox = rng.rand(G, G, G, NCLS).astype(np.float32)
    depth = (0.5 + rng.rand(H, W)).astype(np.float32)
    meta = _meta()
    lab = np.asarray(compute_label(jnp.asarray(vox[None]), jnp.asarray(depth[None]), jnp.asarray(meta[None]), G))[0]
    ref = _project_ref(vox, depth, meta)
    np.testing.assert_array_equal(lab, np.argmax(ref, axis=-1))


def test_backproject_surface_average():
    rng = np.random.RandomState(2)
    data = rng.randn(H, W, C).astype(np.float32)
    label = rng.rand(H, W, NCLS).astype(np.float32)
    depth = (0.5 + rng.rand(H, W)).astype(np.float32)
    label3d = rng.rand(G, G, G, NCLS).astype(np.float32)
    meta = _meta()
    td, tl, tf = backproject(
        jnp.asarray(data[None]), jnp.asarray(label[None]), jnp.asarray(depth[None]),
        jnp.asarray(meta[None]), jnp.asarray(label3d[None]), G, 1, 0.2,
    )
    td, tl, tf = np.asarray(td)[0], np.asarray(tl)[0], np.asarray(tf)[0]

    # loop oracle
    K = meta[0:9].reshape(3, 3)
    w2l = meta[18:30].reshape(3, 4)
    step, origin = meta[42:45], meta[45:48]
    for check in range(60):
        d, h, w = (np.random.RandomState(check).randint(0, G, 3)).tolist()
        P = np.array([d * step[0] + origin[0], h * step[1] + origin[1], w * step[2] + origin[2]])
        live = w2l[:, :3] @ P + w2l[:, 3]
        pix = K @ live
        vals, labs, cnt = np.zeros(C), np.zeros(NCLS), 0
        if abs(pix[2]) > 1e-9:  # degenerate z projects out of bounds either way
            px, py = int(round(pix[0] / pix[2])), int(round(pix[1] / pix[2]))
            for x in range(px - 1, px + 2):
                for y in range(py - 1, py + 2):
                    if 0 <= x < W and 0 <= y < H and abs(depth[y, x] - live[2]) < 0.2:
                        vals += data[y, x]
                        labs += label[y, x]
                        cnt += 1
        if cnt == 0:
            assert tf[d, h, w, 0] == 0
            np.testing.assert_allclose(tl[d, h, w], label3d[d, h, w], atol=1e-6)
        else:
            assert tf[d, h, w, 0] == 1
            np.testing.assert_allclose(td[d, h, w], vals / cnt, atol=1e-5)
            np.testing.assert_allclose(tl[d, h, w], labs, atol=1e-5)


def test_compute_flow_identity_motion():
    """With identity camera motion and matching stored points, the warp must
    return the previous state at (approximately) the same pixels."""
    rng = np.random.RandomState(3)
    state = rng.randn(H, W, C).astype(np.float32)
    weights = (1 + rng.rand(H, W, C)).astype(np.float32)
    depth = (0.5 + rng.rand(H, W)).astype(np.float32)
    meta = _meta()
    Kinv = meta[9:18].reshape(3, 3)
    # previous points = current backprojection (static camera)
    pts = np.zeros((H, W, 3), np.float32)
    for h in range(H):
        for w in range(W):
            pts[h, w] = depth[h, w] * (Kinv @ np.array([w, h, 1.0]))
    td, tw, tp = compute_flow(
        jnp.asarray(state[None]), jnp.asarray(weights[None]), jnp.asarray(pts[None]),
        jnp.asarray(depth[None]), jnp.asarray(meta[None]), kernel_size=0, threshold=1e-4,
        max_weight=100.0,
    )
    td, tw, tp = np.asarray(td)[0], np.asarray(tw)[0], np.asarray(tp)[0]
    np.testing.assert_allclose(td, state, atol=1e-5)
    np.testing.assert_allclose(tw, weights, atol=1e-5)
    np.testing.assert_allclose(tp, pts, atol=1e-5)
