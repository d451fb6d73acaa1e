"""RoI max pooling (Fast R-CNN style) and RoIAlign-style crop_pool.

`roi_pool` reproduces the reference CUDA op exactly
(`lib/roi_pooling_layer/roi_pooling_op_gpu.cu.cc:31-100`):
  * 7-column rois (batch, cls, x1, y1, x2, y2, score)
  * bin edges: floor/ceil of fractional bins over `round(coord*scale)` with
    the +1 width convention, clipped to the feature map; empty bins -> 0
  * `pool_channel=True` pools only the ROI's own class channel
  * backward scatters to the arg-max element — expressed here by autodiff
    through the masked max (identical except for measure-zero ties).

The max over a bin rectangle is separable: a masked max over W per output
column, then over H per output row — two VPU reductions instead of a
per-bin gather, with everything static-shaped. To avoid materializing a
(R, H, W, C) gather of per-ROI feature maps, pooling runs against each batch
image and rows select their image by mask (batch size is small and static).

`crop_pool` is the TPU-friendly alternative the reference keeps as
`crop_pool_new` (`lib/networks/network.py:790-831`): bilinear crop to
(2·pool,2·pool) then 2x2 max pool.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG = -1e30


def _pool_one_image(feat: jnp.ndarray, rois: jnp.ndarray, pooled: int, spatial_scale: float):
    """feat: (H,W,C); rois: (R,7) -> (R,pooled,pooled,C) masked max + empty mask."""
    H, W, C = feat.shape
    R = rois.shape[0]
    x1 = jnp.round(rois[:, 2] * spatial_scale).astype(jnp.int32)
    y1 = jnp.round(rois[:, 3] * spatial_scale).astype(jnp.int32)
    x2 = jnp.round(rois[:, 4] * spatial_scale).astype(jnp.int32)
    y2 = jnp.round(rois[:, 5] * spatial_scale).astype(jnp.int32)
    # bin geometry always in f32 (feat may be bf16 for bandwidth; fractional
    # bin edges must not be)
    roi_w = jnp.maximum(x2 - x1 + 1, 1).astype(jnp.float32)
    roi_h = jnp.maximum(y2 - y1 + 1, 1).astype(jnp.float32)
    bin_w = roi_w / pooled
    bin_h = roi_h / pooled

    pidx = jnp.arange(pooled, dtype=jnp.float32)
    # (R, pooled) start/end in feature coords, clipped
    wstart = jnp.clip(jnp.floor(pidx[None, :] * bin_w[:, None]).astype(jnp.int32) + x1[:, None], 0, W)
    wend = jnp.clip(jnp.ceil((pidx[None, :] + 1) * bin_w[:, None]).astype(jnp.int32) + x1[:, None], 0, W)
    hstart = jnp.clip(jnp.floor(pidx[None, :] * bin_h[:, None]).astype(jnp.int32) + y1[:, None], 0, H)
    hend = jnp.clip(jnp.ceil((pidx[None, :] + 1) * bin_h[:, None]).astype(jnp.int32) + y1[:, None], 0, H)

    wcoords = jnp.arange(W)
    hcoords = jnp.arange(H)
    # (R, pooled, W) / (R, pooled, H) bin membership masks
    wmask = (wcoords[None, None, :] >= wstart[:, :, None]) & (wcoords[None, None, :] < wend[:, :, None])
    hmask = (hcoords[None, None, :] >= hstart[:, :, None]) & (hcoords[None, None, :] < hend[:, :, None])

    # max over W: (R, H, pooled, C)
    colmax = jnp.max(
        jnp.where(wmask[:, None, :, :, None], feat[None, :, None, :, :], NEG),
        axis=3,
    )
    # max over H: (R, pooled, pooled, C)
    out = jnp.max(
        jnp.where(hmask[:, :, None, :, None], jnp.swapaxes(colmax, 1, 2)[:, None], NEG),
        axis=3,
    )
    empty = (hend <= hstart)[:, :, None] | (wend <= wstart)[:, None, :]  # (R,pooled,pooled)
    return out, empty


def roi_pool(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    pooled_height: int = 7,
    pooled_width: int = 7,
    spatial_scale: float = 1.0 / 16.0,
    pool_channel: bool = False,
) -> jnp.ndarray:
    """feat: (B,H,W,C); rois: (R,7) -> (R,ph,pw,C) or (R,ph,pw,1)."""
    assert pooled_height == pooled_width, "square pooling only"
    B = feat.shape[0]
    R = rois.shape[0]
    roi_batch = rois[:, 0].astype(jnp.int32)

    out = None
    empty = None
    for b in range(B):  # static small loop; avoids a (R,H,W,C) gather
        ob, eb = _pool_one_image(feat[b], rois, pooled_height, spatial_scale)
        sel = (roi_batch == b)[:, None, None, None]
        out = jnp.where(sel, ob, out) if out is not None else ob
        empty = jnp.where(sel[..., 0], eb, empty) if empty is not None else eb

    out = jnp.where(empty[..., None], 0.0, out)
    if pool_channel:
        cls = rois[:, 1].astype(jnp.int32)
        out = jnp.take_along_axis(out, cls[:, None, None, None], axis=-1)
    return out


def roi_pool_batched(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    pooled: int = 7,
    spatial_scale: float = 1.0 / 16.0,
) -> jnp.ndarray:
    """Batch-aligned RoI pooling: feat (B,H,W,C), rois (B,D,7) where row
    (b, d) pools image b (its own batch column is ignored).

    This is the SPMD-friendly path used inside the model: with the batch
    axis sharded over the data mesh axis, every device pools only its own
    image — no cross-device slicing (the generic `roi_pool` gathers across
    the batch dim, which lowers to collective-permutes when sharded).
    """

    def one(feat_b, rois_b):
        out, empty = _pool_one_image(feat_b, rois_b, pooled, spatial_scale)
        return jnp.where(empty[..., None], 0.0, out)

    return jax.vmap(one)(feat, rois)


def crop_pool(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float = 1.0 / 16.0,
    pool_size: int = 7,
) -> jnp.ndarray:
    """Bilinear crop to (2·pool)^2 then 2x2 max pool (network.py:790-831).

    Gather-light and differentiable everywhere — the preferred TPU fast path.
    """
    B, H, W, C = feat.shape
    R = rois.shape[0]
    n = 2 * pool_size
    x1 = (rois[:, 2] * spatial_scale).astype(jnp.float32)
    y1 = (rois[:, 3] * spatial_scale).astype(jnp.float32)
    x2 = (rois[:, 4] * spatial_scale).astype(jnp.float32)
    y2 = (rois[:, 5] * spatial_scale).astype(jnp.float32)
    # sample n points per axis at bin centers (align with crop_and_resize);
    # coordinates stay f32 even when feat is bf16
    t = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    sx = x1[:, None] + t[None, :] * (x2 - x1)[:, None]  # (R,n)
    sy = y1[:, None] + t[None, :] * (y2 - y1)[:, None]

    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0 + 1, 0, W - 1)
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0 + 1, 0, H - 1)
    ax = jnp.clip(sx - x0, 0.0, 1.0)
    ay = jnp.clip(sy - y0, 0.0, 1.0)

    roi_batch = rois[:, 0].astype(jnp.int32)
    # gather rows straight out of the (B*H, W, C) view so no per-ROI copy of
    # the full feature map is ever materialized
    flat = feat.reshape(B * H, W, C)

    def crop_one(rowbase, yy0, yy1, xx0, xx1, wy, wx):
        rows0 = jnp.take(flat, rowbase + yy0, axis=0)  # (n, W, C)
        rows1 = jnp.take(flat, rowbase + yy1, axis=0)
        f00 = jnp.take(rows0, xx0, axis=1)  # (n, n, C)
        f01 = jnp.take(rows0, xx1, axis=1)
        f10 = jnp.take(rows1, xx0, axis=1)
        f11 = jnp.take(rows1, xx1, axis=1)
        wxc = wx.astype(f00.dtype)
        wyc = wy.astype(f00.dtype)
        top = f00 * (1 - wxc)[None, :, None] + f01 * wxc[None, :, None]
        bot = f10 * (1 - wxc)[None, :, None] + f11 * wxc[None, :, None]
        return top * (1 - wyc)[:, None, None] + bot * wyc[:, None, None]

    crops = jax.vmap(crop_one)(roi_batch * H, y0, y1i, x0, x1i, ay, ax)  # (R,n,n,C)
    pooled = jax.lax.reduce_window(
        crops,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )
    return pooled


def crop_pool_batched(
    feat: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float = 1.0 / 16.0,
    pool_size: int = 7,
) -> jnp.ndarray:
    """Batch-aligned crop_pool: feat (B,H,W,C), rois (B,D,7) -> (B,D,p,p,C).

    Like `roi_pool_batched`, row (b,d) crops image b only — SPMD-friendly
    under a batch-sharded mesh (no cross-batch gathers).
    """
    B, H, W, C = feat.shape

    def one(feat_b, rois_b):
        n = 2 * pool_size
        x1 = (rois_b[:, 2] * spatial_scale).astype(jnp.float32)
        y1 = (rois_b[:, 3] * spatial_scale).astype(jnp.float32)
        x2 = (rois_b[:, 4] * spatial_scale).astype(jnp.float32)
        y2 = (rois_b[:, 5] * spatial_scale).astype(jnp.float32)
        t = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
        sx = x1[:, None] + t[None, :] * (x2 - x1)[:, None]
        sy = y1[:, None] + t[None, :] * (y2 - y1)[:, None]
        x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, W - 1)
        x1i = jnp.clip(x0 + 1, 0, W - 1)
        y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, H - 1)
        y1i = jnp.clip(y0 + 1, 0, H - 1)
        ax = jnp.clip(sx - x0, 0.0, 1.0)
        ay = jnp.clip(sy - y0, 0.0, 1.0)

        def crop_one(yy0, yy1, xx0, xx1, wy, wx):
            rows0 = jnp.take(feat_b, yy0, axis=0)
            rows1 = jnp.take(feat_b, yy1, axis=0)
            f00 = jnp.take(rows0, xx0, axis=1)
            f01 = jnp.take(rows0, xx1, axis=1)
            f10 = jnp.take(rows1, xx0, axis=1)
            f11 = jnp.take(rows1, xx1, axis=1)
            top = f00 * (1 - wx)[None, :, None] + f01 * wx[None, :, None]
            bot = f10 * (1 - wx)[None, :, None] + f11 * wx[None, :, None]
            return top * (1 - wy)[:, None, None] + bot * wy[:, None, None]

        crops = jax.vmap(crop_one)(y0, y1i, x0, x1i, ay, ax)
        return jax.lax.reduce_window(
            crops, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 2, 2, 1),
            window_strides=(1, 2, 2, 1),
            padding="VALID",
        )

    return jax.vmap(one)(feat, rois)
