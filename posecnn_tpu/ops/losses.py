"""Training losses.

Matches the reference loss definitions:
* `loss_cross_entropy_single_frame` — lib/fcn/train.py:455-465
* `smooth_l1_loss_vertex`           — lib/fcn/train.py:564-573
* `loss_quaternion`                 — lib/fcn/train.py:468-474
* `smooth_l1_loss` (RPN/bbox)       — lib/fcn/train.py:576-589
* triplet / lifted-structured pixel-embedding losses — lib/triplet_loss,
  lib/lifted_structured_loss (pure-JAX rewrites with hard mining)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def loss_cross_entropy_single_frame(scores: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """scores: log-softmax (B,H,W,C); labels: soft/hard one-hot weights."""
    cross_entropy = -jnp.sum(labels * scores, axis=-1)
    return jnp.sum(cross_entropy) / (jnp.sum(labels) + 1e-10)


def loss_cross_entropy_hard_label_sparse(
    score: jnp.ndarray, gt: jnp.ndarray, threshold: float
) -> jnp.ndarray:
    """Fused `hard_label` + cross-entropy on raw (post-ReLU) logits.

    Equals loss_cross_entropy_single_frame(log_softmax(score),
    hard_label(softmax(score), gt, threshold)) without materializing the
    (B,H,W,C) one-hot / log-softmax / softmax tensors: the hard-label output
    is one-hot at `gt` gated by (gt != -1) & (gt > 0 | prob[gt] < threshold)
    (lib/hard_label_layer/hard_label_op_gpu.cu.cc:17-29), so the dense
    contraction reduces to picking the gt channel's log-probability. The
    gate is stop-gradiented exactly like the CUDA op's zero gradient.
    """
    C = score.shape[-1]
    gt_safe = jnp.clip(gt, 0, C - 1)
    onehot = (gt_safe[..., None] == jnp.arange(C, dtype=gt_safe.dtype)).astype(score.dtype)
    score_gt = jnp.sum(score * onehot, axis=-1)  # (B,H,W)
    m = jnp.max(score, axis=-1)
    lse = m + jnp.log(jnp.sum(jnp.exp(score - m[..., None]), axis=-1))
    logp_gt = score_gt - lse
    prob_gt = jnp.exp(logp_gt)
    select = (gt != -1) & ((gt > 0) | (prob_gt < threshold))
    gate = jax.lax.stop_gradient(select.astype(score.dtype))
    return -jnp.sum(gate * logp_gt) / (jnp.sum(gate) + 1e-10)


def loss_cross_entropy_steps(scores_list, labels_list) -> jnp.ndarray:
    """Multi-frame variant (lib/fcn/train.py:438-453)."""
    loss = 0.0
    for score, label in zip(scores_list, labels_list):
        ce = -jnp.sum(label * score, axis=-1)
        # epsilon like the single-frame variant: a step with no labeled
        # pixels (fully-gated adaptation frame) must contribute 0, not NaN
        loss += jnp.sum(ce) / (jnp.sum(label) + 1e-10)
    return loss / len(scores_list)


def smooth_l1_loss_vertex(
    vertex_pred: jnp.ndarray,
    vertex_targets: jnp.ndarray,
    vertex_weights: jnp.ndarray,
    sigma: float = 1.0,
) -> jnp.ndarray:
    sigma_2 = sigma ** 2
    diff = vertex_weights * (vertex_pred - vertex_targets)
    abs_diff = jnp.abs(diff)
    sign = jax.lax.stop_gradient((abs_diff < 1.0 / sigma_2).astype(diff.dtype))
    in_loss = jnp.square(diff) * (sigma_2 / 2.0) * sign + (abs_diff - 0.5 / sigma_2) * (1.0 - sign)
    return jnp.sum(in_loss) / (jnp.sum(vertex_weights) + 1e-10)


def smooth_l1_loss(
    bbox_pred: jnp.ndarray,
    bbox_targets: jnp.ndarray,
    bbox_inside_weights: jnp.ndarray,
    bbox_outside_weights: jnp.ndarray,
    sigma: float = 1.0,
    dim=(1,),
) -> jnp.ndarray:
    sigma_2 = sigma ** 2
    diff = bbox_inside_weights * (bbox_pred - bbox_targets)
    abs_diff = jnp.abs(diff)
    sign = jax.lax.stop_gradient((abs_diff < 1.0 / sigma_2).astype(diff.dtype))
    in_loss = jnp.square(diff) * (sigma_2 / 2.0) * sign + (abs_diff - 0.5 / sigma_2) * (1.0 - sign)
    out_loss = bbox_outside_weights * in_loss
    return jnp.mean(jnp.sum(out_loss, axis=dim))


def loss_quaternion(pose_pred, pose_targets, pose_weights) -> jnp.ndarray:
    distances = 1.0 - jnp.square(jnp.sum(pose_pred * pose_targets, axis=1))
    weights = jnp.mean(pose_weights, axis=1)
    return jnp.sum(weights * distances) / (jnp.sum(weights) + 1e-10)


def sparse_softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean sparse softmax CE (used by the domain classifier, train.py:513)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return -jnp.mean(picked)


# ---------------------------------------------------------------------------
# Pixel-embedding metric losses (reference: lib/triplet_loss/,
# lib/lifted_structured_loss/ — CUDA with host-side sampling). The TPU
# versions operate on a fixed-size random pixel subsample for static shapes.
# ---------------------------------------------------------------------------

def triplet_loss_embedding(
    embeddings: jnp.ndarray,
    labels: jnp.ndarray,
    margin: float = 1.0,
) -> jnp.ndarray:
    """Batch-hard triplet loss over pixel embeddings.

    embeddings: (N, D) sampled pixel embeddings; labels: (N,) int32.
    Mirrors lib/triplet_loss semantics (margin hinge on anchor-positive vs
    anchor-negative squared distances with hard mining).
    """
    d2 = (
        jnp.sum(embeddings ** 2, axis=1)[:, None]
        + jnp.sum(embeddings ** 2, axis=1)[None, :]
        - 2.0 * embeddings @ embeddings.T
    )
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(labels.shape[0], dtype=bool)
    pos_mask = same & ~eye
    neg_mask = ~same
    inf = jnp.asarray(jnp.inf, d2.dtype)
    hardest_pos = jnp.max(jnp.where(pos_mask, d2, -inf), axis=1)
    hardest_neg = jnp.min(jnp.where(neg_mask, d2, inf), axis=1)
    valid = jnp.any(pos_mask, axis=1) & jnp.any(neg_mask, axis=1)
    loss = jnp.maximum(hardest_pos - hardest_neg + margin, 0.0)
    loss = jnp.where(valid, loss, 0.0)
    return jnp.sum(loss) / (jnp.sum(valid) + 1e-10)


def lifted_structured_loss(
    embeddings: jnp.ndarray,
    labels: jnp.ndarray,
    margin: float = 1.0,
) -> jnp.ndarray:
    """Lifted structured embedding loss (Oh Song et al. CVPR16).

    Reference: lib/lifted_structured_loss/lifted_structured_loss_op.cc:34-49.
    """
    d = jnp.sqrt(
        jnp.maximum(
            jnp.sum(embeddings ** 2, axis=1)[:, None]
            + jnp.sum(embeddings ** 2, axis=1)[None, :]
            - 2.0 * embeddings @ embeddings.T,
            1e-12,
        )
    )
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(labels.shape[0], dtype=bool)
    pos_mask = same & ~eye
    neg_mask = ~same
    neg_exp = jnp.where(neg_mask, jnp.exp(margin - d), 0.0)
    neg_term_i = jnp.sum(neg_exp, axis=1)
    # J_ij = log(sum_k exp(m - d_ik) + sum_l exp(m - d_jl)) + d_ij for positive (i,j)
    J = jnp.log(neg_term_i[:, None] + neg_term_i[None, :] + 1e-12) + d
    J = jnp.where(pos_mask, jnp.maximum(J, 0.0) ** 2, 0.0)
    num_pos = jnp.sum(pos_mask)
    return jnp.sum(J) / (2.0 * jnp.maximum(num_pos, 1))
