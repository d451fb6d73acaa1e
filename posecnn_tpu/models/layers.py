"""Functional NN layer primitives over plain pytree params.

Parameters live in a nested dict keyed by the reference's variable-scope
names (`conv1_1/weights`, `fc6/biases`, ... — lib/networks/network.py:163-420)
so the TF1-checkpoint / vgg16.npy converters are direct name maps. Layouts
match TF: conv kernels HWIO, activations NHWC, deconv kernels (k,k,c_o,c_i),
FC weights (in,out) with NHWC flatten order.

Compute dtype policy: `conv2d`/`fc` optionally cast inputs+kernels to
bfloat16 and accumulate in float32 on the MXU (`preferred_element_type`);
parameters always stay float32.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

DN = ("NHWC", "HWIO", "NHWC")


def trunc_normal(key, shape, stddev=0.001, dtype=jnp.float32):
    """tf.truncated_normal_initializer: resample outside 2 sigma (approximated
    by jax.random.truncated_normal over [-2, 2])."""
    return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def init_conv(key, k_h, k_w, c_i, c_o, stddev=None):
    """stddev=None -> He/MSRA scaling sqrt(2/fan_in). The reference's fixed
    0.001 init (network.py:224-240) only works because its trunks are always
    overwritten by pretrained weights — 13 layers of stddev-0.001 kernels
    attenuate activations to ~1e-14 and from-scratch training collapses to
    the background prior. Heads that must match reference magnitudes pass
    stddev explicitly."""
    if stddev is None:
        stddev = math.sqrt(2.0 / (k_h * k_w * c_i))
    return {
        "weights": trunc_normal(key, (k_h, k_w, c_i, c_o), stddev),
        "biases": jnp.zeros((c_o,), jnp.float32),
    }


def init_fc(key, c_i, c_o, stddev=None):
    if stddev is None:
        stddev = math.sqrt(2.0 / c_i)
    return {
        "weights": trunc_normal(key, (c_i, c_o), stddev),
        "biases": jnp.zeros((c_o,), jnp.float32),
    }


def make_deconv_filter(k: int, channels: int) -> jnp.ndarray:
    """Bilinear upsampling filter, layout (k, k, c_o, c_i), diagonal in
    channels — bit-exact port of lib/networks/network.py:141-157."""
    f = math.ceil(k / 2.0)
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    bilinear = np.zeros((k, k))
    for x in range(k):
        for y in range(k):
            bilinear[x, y] = (1 - abs(x / f - c)) * (1 - abs(y / f - c))
    weights = np.zeros((k, k, channels, channels), dtype=np.float32)
    for i in range(channels):
        weights[:, :, i, i] = bilinear
    return jnp.asarray(weights)


def init_deconv(k: int, channels: int):
    # reference deconvs are created with trainable=False (vgg16_convs.py:131)
    return {"weights": make_deconv_filter(k, channels)}


@jax.custom_vjp
def _conv3x3_mb(x, w, b):
    y, _ = _conv3x3_mb_fwd(x, w, b)
    return y


def _conv3x3_mb_fwd(x, w, b):
    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    y = jax.lax.conv_general_dilated(xb, wb, (1, 1), "SAME", dimension_numbers=DN)
    y = jax.nn.relu(y + b.astype(jnp.bfloat16))
    return y, (xb, wb, y)


def _conv3x3_mb_bwd(res, g):
    xb, wb, y = res
    g = jnp.where(y > 0, g.astype(jnp.bfloat16), jnp.bfloat16(0))
    # dgrad: stride-1 SAME conv with spatially flipped, transposed weights
    wflip = jnp.flip(wb, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = jax.lax.conv_general_dilated(g, wflip, (1, 1), "SAME", dimension_numbers=DN)
    # wgrad: 9 shifted pixel contractions (tall-K matmuls)
    B, H, W, _ = xb.shape
    xp = jnp.pad(xb, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dw = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.einsum(
                        "bhwc,bhwd->cd",
                        xp[:, dy:dy + H, dx_:dx_ + W, :],
                        g,
                        preferred_element_type=jnp.float32,
                    )
                    for dx_ in range(3)
                ]
            )
            for dy in range(3)
        ]
    )
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
    return dx.astype(xb.dtype), dw, db


_conv3x3_mb.defvjp(_conv3x3_mb_fwd, _conv3x3_mb_bwd)


def conv3x3_manual_bwd(params, x: jnp.ndarray) -> jnp.ndarray:
    """bf16 3x3 SAME conv + bias + ReLU with a hand-written XLA backward.

    XLA's autodiff-generated fused backward for the full-resolution
    64-channel trunk layer (conv1_2: 640x480x64) is pathological — the
    trunk backward measures ~4.4x its forward instead of ~2x. Expressing
    dgrad as an explicit flipped-weight forward conv and wgrad as 9
    shifted einsum contractions cuts B=2 trunk fwd+bwd from 25.7 ms to
    19.9 ms. Forward numerics are the plain bf16 conv (bias+relu fused in
    bf16); backward matches autodiff up to bf16 rounding. A Pallas
    alternative exists (ops/pallas/conv3x3.py) and is faster standalone,
    but its custom-call boundary costs more than it saves inside the full
    jit graph (measured 8.4 vs 4.8 ms trunk forward).
    """
    # cast OUTSIDE the custom_vjp so the primal/cotangent dtypes agree
    # inside it (the astype's own vjp converts the bf16 dx back to the
    # caller's activation dtype)
    return _conv3x3_mb(x.astype(jnp.bfloat16), params["weights"], params["biases"])


def conv2d(
    params,
    x: jnp.ndarray,
    stride: int = 1,
    relu: bool = True,
    padding: str = "SAME",
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    w = params["weights"]
    if compute_dtype is not None:
        # run the conv in the compute dtype (MXU accumulates f32 internally
        # for bf16 on TPU) and upcast the result; keeping both operands and
        # the output in one dtype keeps the autodiff transpose rules
        # well-typed (preferred_element_type=f32 over bf16 operands breaks
        # the gradient convs with mixed dtypes)
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=DN,
    )
    y = y.astype(jnp.float32)
    if "biases" in params:
        y = y + params["biases"]
    if relu:
        y = jax.nn.relu(y)
    return y


import functools


@functools.lru_cache(maxsize=64)
def _bilinear_1d_map(n_in: int, k: int, stride: int):
    """Per-output (2-tap index, weight) arrays for a 1-D bilinear transposed
    conv with TF SAME semantics: out[o] = sum_j x[j] * k1[o - j*s + lo].

    The 2-D bilinear kernel from make_deconv_filter is the outer product of
    this 1-D kernel, so applying the map along H then W reproduces the dense
    conv2d_transpose exactly (covered by test_models.py parity tests).
    """
    f = math.ceil(k / 2.0)
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    k1 = np.array([1 - abs(t / f - c) for t in range(k)])
    lo = max(k - stride, 0) // 2
    n_out = n_in * stride
    idx = np.zeros((n_out, 2), np.int32)
    wgt = np.zeros((n_out, 2), np.float32)
    counts = np.zeros(n_out, np.int32)
    for j in range(n_in):
        for t in range(k):
            o = j * stride - lo + t
            if 0 <= o < n_out and k1[t] != 0.0:
                slot = counts[o]
                assert slot < 2, "kernel wider than 2 taps per output"
                idx[o, slot] = j
                wgt[o, slot] = k1[t]
                counts[o] += 1
    # rows with one tap: duplicate index with zero weight
    single = counts == 1
    idx[single, 1] = idx[single, 0]
    # return host numpy (NOT jnp): the result is lru-cached and jnp constants
    # created inside one jit trace must not leak into another
    return idx, wgt


@functools.lru_cache(maxsize=64)
def _bilinear_matrix(n_in: int, k: int, stride: int) -> np.ndarray:
    """Dense (n_in*stride, n_in) 1-D interpolation matrix (2 taps per row)."""
    idx, wgt = _bilinear_1d_map(n_in, k, stride)
    n_out = n_in * stride
    m = np.zeros((n_out, n_in), np.float32)
    rows = np.arange(n_out)
    # duplicated single-tap rows carry zero weight in slot 1: += is safe
    np.add.at(m, (rows, idx[:, 0]), wgt[:, 0])
    np.add.at(m, (rows, idx[:, 1]), wgt[:, 1])
    return m


def deconv(params, x: jnp.ndarray, stride: int, padding: str = "SAME") -> jnp.ndarray:
    """tf.nn.conv2d_transpose equivalent; kernel layout (k,k,c_o,c_i).

    PoseCNN's deconvs are fixed bilinear filters with c_i == c_o and
    channel-diagonal symmetric kernels (make_deconv_filter). A dense
    transpose conv would cost k^2*C^2 MACs/pixel (the 16x16/s8 upscore over
    64-128 channels is ~0.6-2.6 TFLOP/frame at 640x480 — more than the whole
    VGG trunk). The 2-D bilinear kernel is the outer product of a 1-D kernel
    with <=2 taps per output, so the transposed conv factorizes exactly into
    two small dense matmuls against per-axis interpolation matrices — MXU
    work with no gathers (XLA lowers batched axis-gathers pathologically,
    and dilated depthwise convs worse). Numerical parity with
    tf.nn.conv2d_transpose(SAME) is covered by tests/test_models.py.
    """
    w = params["weights"]  # (k, k, c_o, c_i)
    k = int(w.shape[0])
    if w.shape[2] == w.shape[3] and k <= 2 * stride:
        h_in, w_in = x.shape[1], x.shape[2]
        prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
        mh = jnp.asarray(_bilinear_matrix(h_in, k, stride)).astype(x.dtype)
        mw = jnp.asarray(_bilinear_matrix(w_in, k, stride)).astype(x.dtype)
        y = jnp.einsum("oh,bhwc->bowc", mh, x, precision=prec)
        y = jnp.einsum("ow,bhwc->bhoc", mw, y, precision=prec)
        return y
    return jax.lax.conv_transpose(
        x, w,
        strides=(stride, stride),
        padding=padding,
        dimension_numbers=DN,
        transpose_kernel=True,
    )


def conv1x1_upsample(
    conv_params,
    deconv_params,
    x: jnp.ndarray,
    stride: int,
    relu: bool = True,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """`conv1x1(deconv(x))` computed as `deconv(conv1x1(x)) + bias`.

    A 1x1 conv is a per-pixel channel-mixing linear map; the bilinear
    transposed conv is a per-channel spatial linear map — the two commute
    exactly, so the channel reduction can run at low resolution and the
    full-resolution upsample touches C_out channels instead of C_in (3-6x
    less HBM traffic for the score/vertex heads, the bandwidth hot spot of
    the 640x480 graph). The bias is added after the upsample because the
    bilinear kernel is not constant-preserving at image borders; ReLU (if
    any) is applied last, as in the reference order (vgg16_convs.py:92-95).
    """
    w = conv_params["weights"]
    xx = x
    if compute_dtype is not None:
        xx = xx.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        xx, w, (1, 1), "SAME", dimension_numbers=DN
    ).astype(jnp.float32)
    y = deconv(deconv_params, y, stride)
    if "biases" in conv_params:
        y = y + conv_params["biases"]
    if relu:
        y = jax.nn.relu(y)
    return y


def max_pool(x: jnp.ndarray, k: int = 2, stride: int = 2, padding: str = "SAME") -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding=padding,
    )


def avg_pool(x: jnp.ndarray, k: int, stride: int, padding: str = "SAME") -> jnp.ndarray:
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding=padding,
    )
    ones = jnp.ones_like(x)
    n = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, stride, stride, 1),
        padding=padding,
    )
    return s / n


def fc(
    params,
    x: jnp.ndarray,
    relu: bool = True,
    compute_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Dense layer; 4D inputs are flattened NHWC-order like TF reshape."""
    if x.ndim == 4:
        x = x.reshape(x.shape[0], -1)
    w = params["weights"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(x, w).astype(jnp.float32) + params["biases"]
    if relu:
        y = jax.nn.relu(y)
    return y


def dropout(key, x: jnp.ndarray, keep_prob: float) -> jnp.ndarray:
    """tf.nn.dropout: scale kept units by 1/keep_prob."""
    if keep_prob >= 1.0:
        return x
    mask = jax.random.bernoulli(key, keep_prob, x.shape)
    return jnp.where(mask, x / keep_prob, 0.0)


def softmax_hd(x: jnp.ndarray) -> jnp.ndarray:
    """softmax over last axis (network.py:474-488)."""
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def log_softmax_hd(x: jnp.ndarray) -> jnp.ndarray:
    m = jnp.max(x, axis=-1, keepdims=True)
    d = x - m
    return d - jnp.log(jnp.sum(jnp.exp(d), axis=-1, keepdims=True))


def argmax_2d(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(x, axis=3).astype(jnp.int32)


def l2_normalize(x: jnp.ndarray, axis: int = 1, eps: float = 1e-12) -> jnp.ndarray:
    """tf.nn.l2_normalize: x * rsqrt(max(sum(x^2), eps))."""
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, eps))
