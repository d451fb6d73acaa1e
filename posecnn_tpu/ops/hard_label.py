"""Hard-label op: one-hot GT gating with hard-example background mining.

TPU-native equivalent of the reference CUDA op
(`lib/hard_label_layer/hard_label_op_gpu.cu.cc:17-29`):

    out[b,h,w,:] = 0
    g = gt[b,h,w]
    if g != -1 and (g > 0 or prob[b,h,w,g] < threshold):
        out[b,h,w,g] = 1

i.e. foreground pixels always contribute; background pixels contribute only
when the network is *not* already confident (prob < threshold); `-1` marks
adaptation frames with no labels. Gradient is zero for both inputs
(`hard_label_op_gpu.cu.cc:55-63`), expressed here via `stop_gradient`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hard_label(prob: jnp.ndarray, gt: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """prob: (B,H,W,C) float; gt: (B,H,W) int32 -> (B,H,W,C) float one-hot."""
    num_classes = prob.shape[-1]
    gt_safe = jnp.clip(gt, 0, num_classes - 1)
    prob_at_gt = jnp.take_along_axis(prob, gt_safe[..., None], axis=-1)[..., 0]
    select = (gt != -1) & ((gt > 0) | (prob_at_gt < threshold))
    onehot = jax.nn.one_hot(gt_safe, num_classes, dtype=prob.dtype)
    out = jnp.where(select[..., None], onehot, 0.0)
    return jax.lax.stop_gradient(out)
