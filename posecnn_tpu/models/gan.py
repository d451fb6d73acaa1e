"""GAN variants: DCGAN image synthesis and adversarial feature alignment.

Rewrites of lib/networks/dcgan.py (encoder-decoder generator conditioned on
a 100-d z + image encoder, PatchGAN-style discriminator with leaky ReLU) and
the adversarial piece of lib/networks/vgg16_gan.py (a domain discriminator
over backbone features trained against the feature extractor). Training-mode
batch norm here carries running statistics explicitly (pure functional).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from posecnn_tpu.models import layers as L


def _init_bn_train(c):
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "offset": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "variance": jnp.ones((c,), jnp.float32),
    }


def _bn(params, x, train: bool, relu=False, momentum=0.9, eps=1e-5):
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.var(x, axis=(0, 1, 2))
        new_stats = {
            "mean": momentum * params["mean"] + (1 - momentum) * mean,
            "variance": momentum * params["variance"] + (1 - momentum) * var,
        }
    else:
        mean, var = params["mean"], params["variance"]
        new_stats = {"mean": params["mean"], "variance": params["variance"]}
    y = (x - mean) * jax.lax.rsqrt(var + eps) * params["scale"] + params["offset"]
    if relu:
        y = jax.nn.relu(y)
    return y, new_stats


def lrelu(x, leak=0.2):
    return jnp.maximum(x, leak * x)


_G_ENC = [("conv1", 3, 64), ("conv2", 64, 128), ("conv3", 128, 256), ("conv4", 256, 512), ("conv5", 512, 512)]
_G_DEC = [("deconv_1", 1024, 512), ("deconv_2", 512, 512), ("deconv_3", 512, 256), ("deconv_4", 256, 128), ("deconv_5", 128, 64)]
_D_ENC = [("conv1_d", 6, 64), ("conv2_d", 64, 128), ("conv3_d", 128, 256), ("conv4_d", 256, 512), ("conv5_d", 512, 512)]


def init_dcgan_params(key: jax.Array, size: int = 128) -> Dict:
    ks = iter(jax.random.split(key, 40))
    p: Dict[str, Any] = {"size": size}
    p["fc_z"] = L.init_fc(next(ks), 100, (size // 32) * (size // 32) * 512)
    for name, ci, co in _G_ENC:
        p[name] = L.init_conv(next(ks), 4, 4, ci, co)
        p["bn" + name[-1]] = _init_bn_train(co)
    for name, ci, co in _G_DEC:
        p[name] = {"weights": L.trunc_normal(next(ks), (4, 4, co, ci), 0.02)}
        p[f"bn{name[-1]}_deconv"] = _init_bn_train(co)
    p["conv_output"] = L.init_conv(next(ks), 1, 1, 64, 3)
    for name, ci, co in _D_ENC:
        p[name] = L.init_conv(next(ks), 4, 4, ci, co)
        if name != "conv1_d":
            p[f"bn{name[4]}_d"] = _init_bn_train(co)
    p["fc_d"] = L.init_fc(next(ks), 512 * (size // 32) * (size // 32), 1)
    return p


def dcgan_generator(params: Dict, z: jnp.ndarray, image: jnp.ndarray, train: bool = True):
    size = params["size"]
    h_z = L.fc(params["fc_z"], z, relu=False).reshape(-1, size // 32, size // 32, 512)
    h = image
    for name, _, _ in _G_ENC:
        h = L.conv2d(params[name], h, stride=2, relu=False)
        h, _ = _bn(params["bn" + name[-1]], h, train, relu=True)
    h = jnp.concatenate([h, h_z], axis=3)
    for name, _, _ in _G_DEC:
        h = L.deconv(params[name], h, stride=2)
        h, _ = _bn(params[f"bn{name[-1]}_deconv"], h, train, relu=True)
    out = L.conv2d(params["conv_output"], h, relu=False)
    return jnp.tanh(out)


def dcgan_discriminator(params: Dict, image_pair: jnp.ndarray, train: bool = True):
    """image_pair: (B,H,W,6) concatenated condition+candidate."""
    h = image_pair
    for name, _, _ in _D_ENC:
        h = L.conv2d(params[name], h, stride=2, relu=False)
        if name != "conv1_d":
            h, _ = _bn(params[f"bn{name[4]}_d"], h, train)
        h = lrelu(h)
    logit = L.fc(params["fc_d"], h.reshape(h.shape[0], -1), relu=False)
    return logit


def gan_losses(d_real_logit, d_fake_logit):
    """Non-saturating sigmoid GAN losses."""
    d_loss = jnp.mean(jax.nn.softplus(-d_real_logit)) + jnp.mean(jax.nn.softplus(d_fake_logit))
    g_loss = jnp.mean(jax.nn.softplus(-d_fake_logit))
    return d_loss, g_loss


def init_feature_discriminator(key: jax.Array, channels: int = 512) -> Dict:
    """vgg16_gan-style domain discriminator over backbone features."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1_g": L.init_conv(k1, 3, 3, channels, 256),
        "conv2_g": L.init_conv(k2, 3, 3, 256, 128),
        "fc_g": L.init_fc(k3, 128, 2),
    }


def feature_discriminator(params: Dict, feat: jnp.ndarray):
    h = lrelu(L.conv2d(params["conv1_g"], feat, stride=2, relu=False))
    h = lrelu(L.conv2d(params["conv2_g"], h, stride=2, relu=False))
    h = jnp.mean(h, axis=(1, 2))
    return L.fc(params["fc_g"], h, relu=False)
