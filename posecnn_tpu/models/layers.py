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


def init_conv(key, k_h, k_w, c_i, c_o, stddev=0.001):
    return {
        "weights": trunc_normal(key, (k_h, k_w, c_i, c_o), stddev),
        "biases": jnp.zeros((c_o,), jnp.float32),
    }


def init_fc(key, c_i, c_o, stddev=0.001):
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


def deconv(params, x: jnp.ndarray, stride: int, padding: str = "SAME") -> jnp.ndarray:
    """tf.nn.conv2d_transpose equivalent; kernel layout (k,k,c_o,c_i).

    PoseCNN's deconvs are fixed bilinear filters with c_i == c_o and
    channel-diagonal symmetric kernels, for which the transposed and direct
    kernel layouts coincide.
    """
    w = params["weights"]
    return jax.lax.conv_transpose(
        x, w,
        strides=(stride, stride),
        padding=padding,
        dimension_numbers=DN,
        transpose_kernel=True,
    )


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
