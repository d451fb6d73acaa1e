"""Average-distance (ADD / ADD-S) pose loss with analytic backward.

TPU-native rewrite of the reference CUDA op
(`lib/average_distance_loss/average_distance_loss_op_gpu.cu.cc:34-252`):

For each ROI row n with an active class c (first class whose weight > 0):
  * rotate model points by the *predicted* quaternion -> x1
  * rotate model points by the *GT* quaternion        -> x2 candidates
  * symmetric classes (ADD-S): x2 = nearest GT-rotated point to x1
    (squared-distance NN, ties to the first index, like the CUDA loop)
  * per-point hinge on the **squared** distance:
        loss_p = (|x1-x2|^2 - margin) / (2·N·P)   if |x1-x2|^2 >= margin
  * gradient flows only to `prediction`, via the dR/dq derivative matrices —
    identical to the saved `bottom_diff` trick (`.cu.cc:177-204,346-377`).

The ADD-S nearest-neighbor search is a dense (P,P) squared-distance matrix
(|a|^2 + |b|^2 - 2ab^T) whose 2ab^T term is an MXU matmul; rows are processed
in fixed-size chunks with `lax.map` to bound memory at (chunk·P·P).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from posecnn_tpu.utils.quaternion import quat2mat

POSE_CHANNELS = 4


def _drot_dq(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz -> (..., 4, 3, 3) dR/dq, layout matching the CUDA kernel."""
    s, u, v, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two = 2.0

    def m(rows):
        return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)

    d_s = two * m([[s, -w, v], [w, s, -u], [-v, u, s]])
    d_u = two * m([[u, v, w], [v, -u, -s], [w, s, -u]])
    d_v = two * m([[-v, u, s], [u, v, w], [-s, w, -v]])
    d_w = two * m([[-w, -s, u], [s, -w, v], [u, v, w]])
    return jnp.stack([d_s, d_u, d_v, d_w], axis=-3)


def _gather_active(weight: jnp.ndarray, num_classes: int):
    """First class per row with weight > 0 (CUDA loop order), plus validity."""
    w4 = weight.reshape(weight.shape[0], num_classes, POSE_CHANNELS)
    active = w4[:, :, 0] > 0  # (N, C); the kernel tests weight[4c] only
    has_cls = jnp.any(active, axis=1)
    cls_index = jnp.argmax(active, axis=1)  # first True
    return cls_index, has_cls


def _forward_impl(prediction, target, weight, points, symmetry, margin, nn_chunk):
    n_rows = prediction.shape[0]
    num_classes, num_points = points.shape[0], points.shape[1]

    cls_index, has_cls = _gather_active(weight, num_classes)
    idx4 = cls_index[:, None] * POSE_CHANNELS + jnp.arange(POSE_CHANNELS)[None, :]
    q_gt = jnp.take_along_axis(target, idx4, axis=1)  # (N,4)
    q_pr = jnp.take_along_axis(prediction, idx4, axis=1)
    pts = points[cls_index]  # (N,P,3)
    sym = symmetry[cls_index] > 0  # (N,)

    R_gt = quat2mat(q_gt)  # (N,3,3)
    R_pr = quat2mat(q_pr)
    x1 = jnp.einsum("nij,npj->npi", R_pr, pts)  # predicted-rotated
    x2_all = jnp.einsum("nij,npj->npi", R_gt, pts)  # gt-rotated candidates

    # ADD-S nearest neighbor: for each p, argmin_i |x1_p - x2_i|^2.
    # Streamed over candidate blocks: the (N,P,block) distance tile is a
    # rank-3 matmul (MXU) + running (min, argmin) carry. Blocks run over the
    # replicated point axis, so rows (N) can stay sharded over the data mesh
    # axis with zero cross-device traffic (row-chunked lax.map would slice
    # the sharded axis and lower to collective-permutes).
    block = min(nn_chunk, num_points)
    n_blocks = -(-num_points // block)
    pad_q = n_blocks * block - num_points
    x2pad = jnp.pad(x2_all, ((0, 0), (0, pad_q), (0, 0)))
    cand_valid = jnp.arange(n_blocks * block) < num_points
    x1_sq = jnp.sum(x1 * x1, axis=-1)  # (N,P)

    def nn_body(carry, xs):
        best_d, best_i = carry
        x2b, validb, base = xs  # (N,block,3), (block,), ()
        d2 = (
            x1_sq[:, :, None]
            + jnp.sum(x2b * x2b, axis=-1)[:, None, :]
            - 2.0 * jnp.einsum("npi,nqi->npq", x1, x2b)
        )
        d2 = jnp.where(validb[None, None, :], d2, jnp.inf)
        bmin = jnp.min(d2, axis=-1)  # (N,P)
        barg = jnp.argmin(d2, axis=-1).astype(jnp.int32) + base
        take = bmin < best_d  # strict: earliest index wins ties, like CUDA
        return (jnp.where(take, bmin, best_d), jnp.where(take, barg, best_i)), None

    init = (
        jnp.full((n_rows, num_points), jnp.inf, x1.dtype),
        jnp.zeros((n_rows, num_points), jnp.int32),
    )
    xs = (
        jnp.moveaxis(x2pad.reshape(n_rows, n_blocks, block, 3), 1, 0),
        cand_valid.reshape(n_blocks, block),
        jnp.arange(n_blocks, dtype=jnp.int32) * block,
    )
    (_, nn_idx), _ = jax.lax.scan(nn_body, init, xs)

    same_idx = jnp.broadcast_to(jnp.arange(num_points)[None, :], nn_idx.shape)
    match_idx = jnp.where(sym[:, None], nn_idx, same_idx)
    x2 = jnp.take_along_axis(x2_all, match_idx[:, :, None], axis=1)  # (N,P,3)

    diff = x1 - x2  # (N,P,3)
    d2 = jnp.sum(diff * diff, axis=-1)  # (N,P)
    active = (d2 >= margin) & has_cls[:, None]
    denom = float(n_rows * num_points)
    losses = jnp.where(active, (d2 - margin) / (2.0 * denom), 0.0)
    loss = jnp.sum(losses)

    # analytic bottom_diff (grad of loss wrt prediction), CUDA .cu.cc:177-204
    D = _drot_dq(q_pr)  # (N,4,3,3)
    diff_m = jnp.where(active[:, :, None], diff, 0.0)
    bd = jnp.einsum("npj,nkjm,npm->nk", diff_m, D, pts) / denom  # (N,4)
    onehot = jax.nn.one_hot(cls_index, num_classes, dtype=prediction.dtype)
    bottom_diff = (onehot[:, :, None] * bd[:, None, :]).reshape(n_rows, num_classes * POSE_CHANNELS)
    bottom_diff = jnp.where(has_cls[:, None], bottom_diff, 0.0)
    return loss, bottom_diff


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def average_distance_loss(
    prediction: jnp.ndarray,
    target: jnp.ndarray,
    weight: jnp.ndarray,
    points: jnp.ndarray,
    symmetry: jnp.ndarray,
    margin: float = 0.01,
    nn_chunk: int = 256,
) -> jnp.ndarray:
    """prediction/target/weight: (N, 4C); points: (C,P,3); symmetry: (C,).

    Returns the scalar ADD/ADD-S hinge loss. Gradient flows to `prediction`
    only (all other inputs get zeros), matching the reference op registration.
    """
    loss, _ = _forward_impl(prediction, target, weight, points, symmetry, margin, nn_chunk)
    return loss


def _fwd(prediction, target, weight, points, symmetry, margin, nn_chunk):
    loss, bottom_diff = _forward_impl(prediction, target, weight, points, symmetry, margin, nn_chunk)
    return loss, bottom_diff


def _bwd(margin, nn_chunk, bottom_diff, g):
    return (g * bottom_diff, None, None, None, None)


average_distance_loss.defvjp(_fwd, _bwd)
