"""Golden tests for the Pallas 3x3 conv kernel (interpret mode on CPU).

The kernel must be exactly as accurate as XLA's own bf16 conv: both are
bf16 multiplies with f32 accumulation in different orders, so each is
compared against an f32 ground truth and the kernel's error may not exceed
the XLA bf16 path's error by more than rounding slack.
"""

import jax
import jax.numpy as jnp
import numpy as np

from posecnn_tpu.ops.pallas.conv3x3 import (
    _pick_hb,
    conv3x3_bias_relu,
)

DN = ("NHWC", "HWIO", "NHWC")
RNG = np.random.RandomState(7)


def _ref(x, w, b, dt, relu=True):
    y = jax.lax.conv_general_dilated(
        x.astype(dt), w.astype(dt), (1, 1), "SAME", dimension_numbers=DN
    )
    y = y + b.astype(dt)
    return jax.nn.relu(y) if relu else y


def _setup(B=1, H=8, W=16, C=64):
    x = jnp.asarray(RNG.randn(B, H, W, C).astype(np.float32) * 0.1)
    w = jnp.asarray(RNG.randn(3, 3, C, C).astype(np.float32) * 0.05)
    b = jnp.asarray(RNG.randn(C).astype(np.float32) * 0.1)
    return x, w, b


def test_pallas_conv_forward_matches_bf16_conv():
    x, w, b = _setup()
    y_true = _ref(x, w, b, jnp.float32)
    y_bf = _ref(x, w, b, jnp.bfloat16).astype(jnp.float32)
    y_pl = conv3x3_bias_relu(x, w, b, True, True).astype(jnp.float32)
    err_bf = float(jnp.abs(y_bf - y_true).max())
    err_pl = float(jnp.abs(y_pl - y_true).max())
    assert err_pl <= 2.0 * err_bf + 1e-5, (err_pl, err_bf)


def test_pallas_conv_grads_match_bf16_conv():
    x, w, b = _setup()

    def loss_pl(x, w, b):
        return conv3x3_bias_relu(x, w, b, True, True).astype(jnp.float32).sum()

    def loss_bf(x, w, b):
        return _ref(x, w, b, jnp.bfloat16).astype(jnp.float32).sum()

    def loss_f32(x, w, b):
        return _ref(x, w, b, jnp.float32).sum()

    g_true = jax.grad(loss_f32, argnums=(0, 1, 2))(x, w, b)
    g_bf = jax.grad(loss_bf, argnums=(0, 1, 2))(x, w, b)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(x, w, b)
    for t, bb, p in zip(g_true, g_bf, g_pl):
        t = np.asarray(t, np.float32)
        err_bf = np.abs(np.asarray(bb, np.float32) - t).max()
        err_pl = np.abs(np.asarray(p, np.float32) - t).max()
        assert err_pl <= 2.0 * err_bf + 1e-4, (err_pl, err_bf)


def test_pallas_conv_rectangular_and_no_relu():
    x = jnp.asarray(RNG.randn(2, 12, 24, 64).astype(np.float32) * 0.1)
    w = jnp.asarray(RNG.randn(3, 3, 64, 128).astype(np.float32) * 0.05)
    b = jnp.asarray(RNG.randn(128).astype(np.float32) * 0.1)
    y_bf = _ref(x, w, b, jnp.bfloat16, relu=False).astype(jnp.float32)
    y_pl = conv3x3_bias_relu(x, w, b, False, True).astype(jnp.float32)
    # negative values survive without relu
    assert float(y_pl.min()) < 0
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_bf), atol=0.05)


def test_manual_bwd_conv_matches_autodiff():
    """layers.conv3x3_manual_bwd == bf16 conv+bias+relu with autodiff grads
    (up to bf16 rounding), on the production trunk path."""
    from posecnn_tpu.models.layers import conv3x3_manual_bwd

    x = jnp.asarray(RNG.randn(2, 8, 16, 64).astype(np.float32) * 0.1)
    w = jnp.asarray(RNG.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    b = jnp.asarray(RNG.randn(64).astype(np.float32) * 0.1)
    p = {"weights": w, "biases": b}

    y_mb = conv3x3_manual_bwd(p, x).astype(jnp.float32)
    y_bf = _ref(x, w, b, jnp.bfloat16).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(y_mb), np.asarray(y_bf), atol=0.03)

    g_true = jax.grad(lambda x, w, b: _ref(x, w, b, jnp.float32).sum(), argnums=(0, 1, 2))(x, w, b)
    g_bf = jax.grad(
        lambda x, w, b: _ref(x, w, b, jnp.bfloat16).astype(jnp.float32).sum(), argnums=(0, 1, 2)
    )(x, w, b)
    g_mb = jax.grad(
        lambda x, w, b: conv3x3_manual_bwd({"weights": w, "biases": b}, x)
        .astype(jnp.float32)
        .sum(),
        argnums=(0, 1, 2),
    )(x, w, b)
    for t, bb, m in zip(g_true, g_bf, g_mb):
        t = np.asarray(t, np.float32)
        err_bf = np.abs(np.asarray(bb, np.float32) - t).max()
        err_mb = np.abs(np.asarray(m, np.float32) - t).max()
        assert err_mb <= 2.0 * err_bf + 1e-4, (err_mb, err_bf)


def test_pick_hb_divides():
    for H in (480, 240, 120, 60, 30, 8):
        hb = _pick_hb(H, 640, 64, 64)
        assert H % hb == 0
