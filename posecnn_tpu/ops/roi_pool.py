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


def _bin_edges(rois: jnp.ndarray, pooled: int, spatial_scale: float, H: int, W: int):
    """(R,7) rois -> integer bin edges (wstart, wend, hstart, hend), each
    (R, pooled), clipped to the map; reproduces the CUDA op's floor/ceil
    fractional-bin geometry (roi_pooling_op_gpu.cu.cc:44-66)."""
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
    wstart = jnp.clip(jnp.floor(pidx[None, :] * bin_w[:, None]).astype(jnp.int32) + x1[:, None], 0, W)
    wend = jnp.clip(jnp.ceil((pidx[None, :] + 1) * bin_w[:, None]).astype(jnp.int32) + x1[:, None], 0, W)
    hstart = jnp.clip(jnp.floor(pidx[None, :] * bin_h[:, None]).astype(jnp.int32) + y1[:, None], 0, H)
    hend = jnp.clip(jnp.ceil((pidx[None, :] + 1) * bin_h[:, None]).astype(jnp.int32) + y1[:, None], 0, H)
    return wstart, wend, hstart, hend


def _doubling_table(x: jnp.ndarray) -> jnp.ndarray:
    """Sparse-table (doubling) running max along axis 0.

    x: (N, M) -> (L, N, M) where table[k, i] = max(x[i : i+2^k]) (positions
    past N contribute NEG). L = 1 + floor(log2(N)) levels, so any interval
    [s, e) with 1 <= e-s <= N is max(table[k, s], table[k, e-2^k]) for
    k = floor(log2(e-s)).
    """
    N = x.shape[0]
    levels = [x]
    k = 1
    while 2 * k <= N:
        prev = levels[-1]
        pad = jnp.full((min(k, N), ) + x.shape[1:], NEG, x.dtype)
        shifted = jnp.concatenate([prev[k:], pad], axis=0)
        levels.append(jnp.maximum(prev, shifted))
        k *= 2
    return jnp.stack(levels)  # (L, N, M)


def _range_max(table: jnp.ndarray, s: jnp.ndarray, e: jnp.ndarray) -> jnp.ndarray:
    """Range-max queries against a doubling table.

    table: (L, N, M); s, e: (Q,) int32 with the convention that empty
    intervals (e <= s) return garbage (mask downstream). -> (Q, M)
    """
    L, N = table.shape[0], table.shape[1]
    length = jnp.maximum(e - s, 1)
    k = jnp.zeros_like(length)
    for j in range(1, L):
        k = k + (length >= (1 << j)).astype(k.dtype)
    p2 = jnp.left_shift(jnp.ones_like(k), k)
    flat = table.reshape((L * N,) + table.shape[2:])
    t1 = jnp.take(flat, k * N + s, axis=0)
    t2 = jnp.take(flat, k * N + jnp.maximum(e - p2, 0), axis=0)
    return jnp.maximum(t1, t2)


def _pool_one_image(feat: jnp.ndarray, rois: jnp.ndarray, pooled: int, spatial_scale: float):
    """feat: (H,W,C); rois: (R,7) -> (R,pooled,pooled,C) exact bin max + empty mask.

    The per-bin max over a rectangle is separable (W then H). The W stage
    runs as range-max queries against a doubling table — two gathers per
    (roi, column) instead of a W-wide masked reduce, cutting the arithmetic
    ~W/2-fold (the masked-max version costs R*pooled*H*W*C VPU ops, ~25 G
    for conv4 with the 9x jittered training ROI set). The H stage stays a
    masked reduce over the (R,pooled,H,C) column maxes (H-fold smaller).
    Backward routes through max/gather to the arg-max element, identical to
    the CUDA op's saved-argmax scatter except for measure-zero ties.
    """
    H, W, C = feat.shape
    R = rois.shape[0]
    wstart, wend, hstart, hend = _bin_edges(rois, pooled, spatial_scale, H, W)

    # W stage: range-max per (roi, out-column) -> (R*pooled, H*C)
    table = _doubling_table(feat.swapaxes(0, 1).reshape(W, H * C))
    colmax = _range_max(table, wstart.reshape(-1), wend.reshape(-1))
    colmax = colmax.reshape(R, pooled, H, C)

    # H stage: masked max over H -> (R, pooled_h, pooled_w, C)
    hcoords = jnp.arange(H)
    hmask = (hcoords[None, None, :] >= hstart[:, :, None]) & (hcoords[None, None, :] < hend[:, :, None])
    out = jnp.max(
        jnp.where(hmask[:, :, None, :, None], colmax[:, None, :, :, :], NEG),
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


def _build_levels(x: jnp.ndarray):
    """Doubling-max levels along axis 1 of (B, W, M); see _doubling_table."""
    W = x.shape[1]
    levels = [x]
    k = 1
    while 2 * k <= W:
        prev = levels[-1]
        pad = jnp.full((x.shape[0], min(k, W)) + x.shape[2:], NEG, x.dtype)
        levels.append(jnp.maximum(prev, jnp.concatenate([prev[:, k:], pad], axis=1)))
        k *= 2
    return levels


def _query_indices(wstart, wend, L: int, W: int, B: int):
    """(B, Q) start/end -> per-tap flat indices into the (B, L, W) table."""
    s = wstart
    e = wend
    length = jnp.maximum(e - s, 1)
    kq = jnp.zeros_like(length)
    for j in range(1, L):
        kq = kq + (length >= (1 << j)).astype(kq.dtype)
    p2 = jnp.left_shift(jnp.ones_like(kq), kq)
    idx1 = kq * W + s
    idx2 = kq * W + jnp.maximum(e - p2, 0)
    return idx1, idx2


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _range_colmax(feat_t, wstart, wend, pooled: int):
    """feat_t: (B, W, M) (M = H*C); wstart/wend: (B, Q) int32 ->
    (B, Q, M) per-bin W-range maxima via the doubling table.

    custom_vjp: XLA's autodiff of the table path (scatter-add of tap
    cotangents + concat/pad chains through the level maxima) costs ~6 ms
    of an 8.7 ms conv4 fwd+bwd; the manual backward routes tap cotangents
    with a one-hot matmul (bf16 operands, f32 accumulation on the MXU) and
    walks the level chain with shifted selects.
    """
    out, _ = _range_colmax_fwd(feat_t, wstart, wend, pooled)
    return out


def _range_colmax_fwd(feat_t, wstart, wend, pooled):
    B, W, M = feat_t.shape
    levels = _build_levels(feat_t)
    L = len(levels)
    table = jnp.stack(levels, axis=1)  # (B, L, W, M)
    flat = table.reshape(B * L * W, M)
    idx1, idx2 = _query_indices(wstart, wend, L, W, B)
    base = (jnp.arange(B, dtype=jnp.int32) * (L * W))[:, None]
    t1 = jnp.take(flat, (base + idx1).reshape(-1), axis=0)
    t2 = jnp.take(flat, (base + idx2).reshape(-1), axis=0)
    out = jnp.maximum(t1, t2).reshape(B, -1, M)
    return out, (feat_t, wstart, wend)


def _range_colmax_bwd(pooled, res, g):
    feat_t, wstart, wend = res
    B, W, M = feat_t.shape
    Q = wstart.shape[1]
    levels = _build_levels(feat_t)
    L = len(levels)
    idx1, idx2 = _query_indices(wstart, wend, L, W, B)
    base = (jnp.arange(B, dtype=jnp.int32) * (L * W))[:, None]
    flat = jnp.stack(levels, axis=1).reshape(B * L * W, M)
    t1 = jnp.take(flat, (base + idx1).reshape(-1), axis=0)
    t2 = jnp.take(flat, (base + idx2).reshape(-1), axis=0)
    g2 = g.reshape(B * Q, M)
    # jnp.maximum tie semantics: >, <, == splits evenly
    eq = (t1 == t2).astype(g2.dtype)
    d1 = g2 * ((t1 > t2).astype(g2.dtype) + 0.5 * eq)
    d2 = g2 * ((t1 < t2).astype(g2.dtype) + 0.5 * eq)

    # scatter-free routing: one-hot (2Q, L*W) matmul per image with f32
    # accumulation (a 1008-row XLA scatter-add here measures ~6 ms; this is
    # one MXU contraction). Operand dtype follows the features: bf16 on the
    # TPU path (cotangents there are bf16 anyway), f32 elsewhere.
    lw = L * W
    mm_dtype = feat_t.dtype
    iota = jnp.arange(lw, dtype=jnp.int32)
    oh = jnp.concatenate(
        [
            (idx1[:, :, None] == iota[None, None, :]),
            (idx2[:, :, None] == iota[None, None, :]),
        ],
        axis=1,
    ).astype(mm_dtype)  # (B, 2Q, LW)
    dq = jnp.concatenate([d1.reshape(B, Q, M), d2.reshape(B, Q, M)], axis=1).astype(
        mm_dtype
    )
    dtable = jax.lax.dot_general(
        oh,
        dq,
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(B, L, W, M)

    # level-chain backward: level j = max(prev, shift_k(prev))
    dcur = dtable[:, L - 1]
    for j in range(L - 1, 0, -1):
        k = 1 << (j - 1)
        prev = levels[j - 1]
        pad = jnp.full((B, min(k, W)) + prev.shape[2:], NEG, prev.dtype)
        shifted = jnp.concatenate([prev[:, k:], pad], axis=1)
        eqj = (prev == shifted).astype(dcur.dtype)
        da = dcur * ((prev > shifted).astype(dcur.dtype) + 0.5 * eqj)
        db = dcur * ((prev < shifted).astype(dcur.dtype) + 0.5 * eqj)
        # un-shift: db[i] belongs to prev[i+k]
        db_up = jnp.concatenate([jnp.zeros_like(db[:, :k]), db[:, : W - k]], axis=1)
        dcur = da + db_up + dtable[:, j - 1]
    dfeat = dcur.astype(feat_t.dtype)
    return dfeat, None, None


_range_colmax.defvjp(_range_colmax_fwd, _range_colmax_bwd)


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

    The batch dim is folded INTO the range-max table (queries offset by
    b·L·W) rather than vmapping `_pool_one_image`: a vmapped `take` becomes
    a batched gather, which XLA lowers catastrophically on TPU (the same
    pathology as batched-gather deconvs, see models/layers.py:deconv).
    """
    B, H, W, C = feat.shape
    D = rois.shape[1]
    wstart, wend, hstart, hend = _bin_edges(
        rois.reshape(B * D, 7), pooled, spatial_scale, H, W
    )  # (B*D, pooled)

    feat_t = feat.transpose(0, 2, 1, 3).reshape(B, W, H * C)
    colmax = _range_colmax(
        feat_t,
        wstart.reshape(B, D * pooled),
        wend.reshape(B, D * pooled),
        pooled,
    ).reshape(B * D, pooled, H, C)

    hcoords = jnp.arange(H)
    hmask = (hcoords[None, None, :] >= hstart[:, :, None]) & (
        hcoords[None, None, :] < hend[:, :, None]
    )
    out = jnp.max(
        jnp.where(hmask[:, :, None, :, None], colmax[:, None, :, :, :], NEG), axis=3
    )
    empty = (hend <= hstart)[:, :, None] | (wend <= wstart)[:, None, :]
    out = jnp.where(empty[..., None], 0.0, out)
    return out.reshape(B, D, pooled, pooled, C)


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
