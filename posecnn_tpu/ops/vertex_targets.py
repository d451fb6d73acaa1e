"""In-graph vertex-target generation.

The reference builds the per-pixel center-direction + log-depth regression
targets on the host (lib/gt_synthesize_layer/minibatch.py:543-602) and ships
a (B,H,W,3C) float blob to the device every iteration. On TPU that blob is
the single largest host artifact of the training loop (162 MB/batch at
640x480/22 classes — more than everything else combined), so here the host
ships only a (B,G,4) table of GT rows [cls, cx, cy, z] and the targets are
materialized on device inside the train step's jit graph.

Numerics match `posecnn_tpu.data.minibatch.generate_vertex_targets` exactly
(golden test in tests/test_ops_basic.py): unit direction from pixel to the
instance's projected center, log(z) depth, `weight_value` on the 3 channels
of the pixel's class; first instance of a class wins; adaptation frames
(label == -1) produce all-zero targets and weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _center_table(gt_centers: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """(B,G,4) rows [cls, cx, cy, z] -> per-image (B,C,4) table of
    [cx, cy, z, found]; first instance of a class wins (numpy ind[0]
    semantics, minibatch.py:543-602)."""
    C = num_classes
    cls = gt_centers[..., 0].astype(jnp.int32)
    valid = cls > 0
    entry = jnp.concatenate(
        [gt_centers[..., 1:4], jnp.ones_like(gt_centers[..., :1])], axis=-1
    )
    cls_safe = jnp.where(valid, cls, C)

    def build_table(cls_row, entry_row):
        t = jnp.zeros((C + 1, 4), jnp.float32)
        return t.at[cls_row[::-1]].set(entry_row[::-1], mode="drop")

    return jax.vmap(build_table)(cls_safe, entry)[:, :C]


def smooth_l1_loss_vertex_sparse(
    vertex_pred: jnp.ndarray,
    label: jnp.ndarray,
    gt_centers: jnp.ndarray,
    num_classes: int,
    weight_value: float = 10.0,
    sigma: float = 1.0,
) -> jnp.ndarray:
    """Fused vertex-target generation + smooth-L1, never materializing the
    (B,H,W,3C) target/weight blobs.

    Equals smooth_l1_loss_vertex(vertex_pred, *vertex_targets_device(...)):
    the dense targets/weights are one-hot over classes, so only the 3
    channels of each pixel's class contribute — those are extracted with an
    einsum against the label one-hot (MXU/VPU-fused, no gathers) and
    compared against the per-pixel [dx/n, dy/n, log z] target computed
    in-place. Golden test: tests/test_ops_basic.py.
    """
    B, H, W = label.shape
    C = num_classes
    sigma_2 = sigma ** 2
    table = _center_table(gt_centers, C)  # (B,C,4)

    lab_safe = jnp.clip(label, 0, C - 1)
    onehot = (lab_safe[..., None] == jnp.arange(C, dtype=lab_safe.dtype)).astype(
        jnp.float32
    )  # (B,H,W,C)
    # per-pixel [cx, cy, z, found] of the pixel's class: batched matmul
    e = jnp.einsum("bhwc,bck->bhwk", onehot, table)  # (B,H,W,4)
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    dx = e[..., 0] - xs
    dy = e[..., 1] - ys
    n = jnp.sqrt(dx * dx + dy * dy) + 1e-10
    logz = jnp.log(jnp.maximum(e[..., 2], 1e-10))
    t3 = jnp.stack([dx / n, dy / n, logz], axis=-1)  # (B,H,W,3)

    fg = (label > 0) & (e[..., 3] > 0)
    w = jnp.where(fg, jnp.float32(weight_value), 0.0)  # (B,H,W)

    # the pixel's class 3-channel slice of the prediction
    pred5 = vertex_pred.reshape(B, H, W, C, 3)
    pred3 = jnp.einsum("bhwc,bhwck->bhwk", onehot, pred5)  # (B,H,W,3)

    diff = w[..., None] * (pred3 - t3)
    abs_diff = jnp.abs(diff)
    sign = jax.lax.stop_gradient((abs_diff < 1.0 / sigma_2).astype(diff.dtype))
    in_loss = jnp.square(diff) * (sigma_2 / 2.0) * sign + (abs_diff - 0.5 / sigma_2) * (
        1.0 - sign
    )
    # dense-weight sum = 3 channels * w per foreground pixel
    return jnp.sum(in_loss) / (3.0 * jnp.sum(w) + 1e-10)


def vertex_targets_device(
    label: jnp.ndarray,
    gt_centers: jnp.ndarray,
    num_classes: int,
    weight_value: float = 10.0,
):
    """label: (B,H,W) int32; gt_centers: (B,G,4) rows [cls, cx, cy, z]
    zero-padded (cls <= 0 rows ignored). Returns (targets, weights), each
    (B,H,W,3*num_classes) float32."""
    B, H, W = label.shape
    C = num_classes
    table = _center_table(gt_centers, C)  # (B,C,4)

    lab_safe = jnp.clip(label, 0, C - 1)
    e = jax.vmap(lambda t, l: t[l])(table, lab_safe)  # (B,H,W,4)
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    dx = e[..., 0] - xs
    dy = e[..., 1] - ys
    n = jnp.sqrt(dx * dx + dy * dy) + 1e-10
    logz = jnp.log(jnp.maximum(e[..., 2], 1e-10))
    t3 = jnp.stack([dx / n, dy / n, logz], axis=-1)  # (B,H,W,3)

    fg = (label > 0) & (e[..., 3] > 0)  # class present in GT table
    onehot = jax.nn.one_hot(jnp.where(fg, label, -1), C, dtype=jnp.float32)  # (B,H,W,C)
    targets = (onehot[..., None] * t3[..., None, :]).reshape(B, H, W, 3 * C)
    weights = (
        jnp.repeat(onehot, 3, axis=-1) * weight_value
    )  # (B,H,W,3C), weight_value on the class's 3 channels
    return targets, weights
