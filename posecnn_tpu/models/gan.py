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


def dcgan_generator(params: Dict, z: jnp.ndarray, image: jnp.ndarray, train: bool = True,
                    return_stats: bool = False):
    """With return_stats, also returns {bn_name: new_stats} — a training
    step must merge these back into params or eval-mode BN normalizes with
    the untouched init statistics (garbage at inference)."""
    size = params["size"]
    stats: Dict[str, Dict] = {}
    h_z = L.fc(params["fc_z"], z, relu=False).reshape(-1, size // 32, size // 32, 512)
    h = image
    for name, _, _ in _G_ENC:
        h = L.conv2d(params[name], h, stride=2, relu=False)
        h, stats["bn" + name[-1]] = _bn(params["bn" + name[-1]], h, train, relu=True)
    h = jnp.concatenate([h, h_z], axis=3)
    for name, _, _ in _G_DEC:
        h = L.deconv(params[name], h, stride=2)
        h, stats[f"bn{name[-1]}_deconv"] = _bn(params[f"bn{name[-1]}_deconv"], h, train, relu=True)
    out = L.conv2d(params["conv_output"], h, relu=False)
    out = jnp.tanh(out)
    return (out, stats) if return_stats else out


def dcgan_discriminator(params: Dict, image_pair: jnp.ndarray, train: bool = True,
                        return_stats: bool = False):
    """image_pair: (B,H,W,6) concatenated condition+candidate. See
    dcgan_generator for the return_stats contract."""
    h = image_pair
    stats: Dict[str, Dict] = {}
    for name, _, _ in _D_ENC:
        h = L.conv2d(params[name], h, stride=2, relu=False)
        if name != "conv1_d":
            h, stats[f"bn{name[4]}_d"] = _bn(params[f"bn{name[4]}_d"], h, train)
        h = lrelu(h)
    logit = L.fc(params["fc_d"], h.reshape(h.shape[0], -1), relu=False)
    return (logit, stats) if return_stats else logit


def merge_bn_stats(params: Dict, stats: Dict[str, Dict]) -> Dict:
    """Fold _bn running-statistic updates back into the param tree."""
    out = dict(params)
    for name, s in stats.items():
        out[name] = {**params[name], **s}
    return out


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


# ---------------------------------------------------------------------------
# vgg16_gan: FCN generator (label + vertex heads) + VGG patch discriminator
# over concat(255 * vertex_map, image) — lib/networks/vgg16_gan.py:66-189.
# The two discriminator passes (predicted vs target vertex map) share one
# parameter set; outputs are per-patch 2-class log-softmax maps (stride 32).
# ---------------------------------------------------------------------------

_VGG_GAN_D_DEFS = [
    # (name, c_o, pool_after, dropout_after)
    ("conv1_1_d", 64, False, False),
    ("conv1_2_d", 64, True, False),
    ("conv2_1_d", 128, False, False),
    ("conv2_2_d", 128, True, False),
    ("conv3_1_d", 256, False, False),
    ("conv3_2_d", 256, False, False),
    ("conv3_3_d", 256, True, False),
    ("conv4_1_d", 512, False, False),
    ("conv4_2_d", 512, False, False),
    ("conv4_3_d", 512, True, False),
    ("conv5_1_d", 512, False, True),
    ("conv5_2_d", 512, False, True),
    ("conv5_3_d", 512, True, True),
]


def init_vgg16_gan_params(key: jax.Array, num_classes: int, num_units: int = 64) -> Dict:
    from posecnn_tpu.models.backbone import init_vgg_trunk

    C, U = num_classes, num_units
    ks = iter(jax.random.split(key, 32))
    p: Dict[str, Any] = {}
    # generator: shared trunk + label head + vertex head (vgg16_gan.py:66-143)
    p.update(init_vgg_trunk(next(ks)))
    p["score_conv5"] = L.init_conv(next(ks), 1, 1, 512, U)
    p["upscore_conv5"] = L.init_deconv(4, U)
    p["score_conv4"] = L.init_conv(next(ks), 1, 1, 512, U)
    p["upscore"] = L.init_deconv(16, U)
    p["score"] = L.init_conv(next(ks), 1, 1, U, C, stddev=0.01)
    p["score_conv5_vertex"] = L.init_conv(next(ks), 1, 1, 512, 128)
    p["upscore_conv5_vertex"] = L.init_deconv(4, 128)
    p["score_conv4_vertex"] = L.init_conv(next(ks), 1, 1, 512, 128)
    p["upscore_vertex"] = L.init_deconv(16, 128)
    p["vertex_pred"] = L.init_conv(next(ks), 1, 1, 128, 3 * C, stddev=0.001)
    # discriminator tower (vgg16_gan.py:156-183)
    c_i = 3 * C + 3
    for name, c_o, _, _ in _VGG_GAN_D_DEFS:
        p[name] = L.init_conv(next(ks), 3, 3, c_i, c_o)
        c_i = c_o
    p["embed_d"] = L.init_conv(next(ks), 3, 3, 512, U)
    p["score_d"] = L.init_conv(next(ks), 1, 1, U, 2, stddev=0.01)
    return p


def vgg16_gan_generator(params: Dict, data: jnp.ndarray, num_classes: int,
                        keep_prob: float = 1.0, rng=None, compute_dtype=jnp.bfloat16) -> Dict:
    """FCN generator: returns score/prob/label_2d + vertex_pred."""
    from posecnn_tpu.models.backbone import vgg_trunk

    if rng is None:
        rng = jax.random.PRNGKey(0)
    r1, r2 = jax.random.split(rng)
    dt = compute_dtype
    net = vgg_trunk(params, data, compute_dtype=dt)
    sc5 = L.conv2d(params["score_conv5"], net["conv5_3"], relu=True, compute_dtype=dt)
    up5 = L.deconv(params["upscore_conv5"], sc5, stride=2)
    sc4 = L.conv2d(params["score_conv4"], net["conv4_3"], relu=True, compute_dtype=dt)
    add_score = L.dropout(r1, sc4 + up5, keep_prob)
    score = L.conv1x1_upsample(params["score"], params["upscore"], add_score,
                               stride=8, relu=True, compute_dtype=dt)
    sc5v = L.conv2d(params["score_conv5_vertex"], net["conv5_3"], relu=False, compute_dtype=dt)
    up5v = L.deconv(params["upscore_conv5_vertex"], sc5v, stride=2)
    sc4v = L.conv2d(params["score_conv4_vertex"], net["conv4_3"], relu=False, compute_dtype=dt)
    addv = L.dropout(r2, sc4v + up5v, keep_prob)
    vertex_pred = L.conv1x1_upsample(params["vertex_pred"], params["upscore_vertex"], addv,
                                     stride=8, relu=False, compute_dtype=dt)
    return {
        "score": score,
        "prob": L.log_softmax_hd(score),
        "prob_normalized": L.softmax_hd(score),
        "label_2d": L.argmax_2d(score),
        "vertex_pred": vertex_pred,
    }


def vgg16_gan_discriminator(params: Dict, vertex_map: jnp.ndarray, data: jnp.ndarray,
                            keep_prob: float = 1.0, rng=None,
                            compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Per-patch real/fake log-probs (B, H/32, W/32, 2) over
    concat(255 * vertex_map, image) (vgg16_gan.py:150-183)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rs = iter(jax.random.split(rng, 4))
    dt = compute_dtype
    h = jnp.concatenate([255.0 * vertex_map, data], axis=-1)
    for name, _, pool_after, dropout_after in _VGG_GAN_D_DEFS:
        h = L.conv2d(params[name], h, relu=True, compute_dtype=dt)
        if dropout_after:
            h = L.dropout(next(rs), h, keep_prob)
        if pool_after:
            h = L.max_pool(h, 2, 2)
    h = L.conv2d(params["embed_d"], h, relu=True, compute_dtype=dt)
    score_d = L.conv2d(params["score_d"], h, relu=True, compute_dtype=dt)
    return L.log_softmax_hd(score_d)


def vgg16_gan_forward(params: Dict, data: jnp.ndarray, num_classes: int,
                      vertex_targets=None, keep_prob: float = 1.0, rng=None,
                      compute_dtype=jnp.bfloat16) -> Dict:
    """Generator + both discriminator passes; outputs_d = [fake, real]."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    rg, rd1, rd2 = jax.random.split(rng, 3)
    out = vgg16_gan_generator(params, data, num_classes, keep_prob, rg, compute_dtype)
    outputs_d = [
        vgg16_gan_discriminator(params, out["vertex_pred"], data, keep_prob, rd1, compute_dtype)
    ]
    if vertex_targets is not None:
        outputs_d.append(
            vgg16_gan_discriminator(params, vertex_targets, data, keep_prob, rd2, compute_dtype)
        )
    out["outputs_d"] = outputs_d
    return out
