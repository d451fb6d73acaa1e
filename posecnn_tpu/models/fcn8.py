"""FCN-8s semantic segmentation baseline (lib/networks/fcn8_vgg.py).

Classic Long et al. FCN-8s over VGG16: fc6/fc7 as convolutions, score +
2x/2x/8x bilinear upsampling with pool4/pool3 skip fusions. The reference
version is a standalone npy-loading graph; here it shares the functional
layer substrate and the vgg16.npy converter (fc6/fc7 reshaped to conv).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from posecnn_tpu.models import layers as L
from posecnn_tpu.models.backbone import init_vgg_trunk, vgg_trunk


def init_fcn8_params(key: jax.Array, num_classes: int) -> Dict:
    ks = iter(jax.random.split(key, 8))
    p: Dict[str, Any] = {}
    p.update(init_vgg_trunk(next(ks)))
    p["fc6"] = L.init_conv(next(ks), 7, 7, 512, 4096)
    p["fc7"] = L.init_conv(next(ks), 1, 1, 4096, 4096)
    p["score_fr"] = L.init_conv(next(ks), 1, 1, 4096, num_classes, stddev=0.001)
    p["score_pool4"] = L.init_conv(next(ks), 1, 1, 512, num_classes, stddev=0.001)
    p["score_pool3"] = L.init_conv(next(ks), 1, 1, 256, num_classes, stddev=0.001)
    p["upscore2"] = L.init_deconv(4, num_classes)
    p["upscore4"] = L.init_deconv(4, num_classes)
    p["upscore32"] = L.init_deconv(16, num_classes)
    return p


def fcn8_forward(params: Dict, data: jnp.ndarray, num_classes: int, compute_dtype=jnp.bfloat16, keep_prob: float = 1.0, rng=None) -> Dict:
    dt = compute_dtype
    if rng is None:
        rng = jax.random.PRNGKey(0)
    r6, r7 = jax.random.split(rng)
    net = vgg_trunk(params, data, compute_dtype=dt)
    # fc6/fc7 as convolutions over pool5
    pool5 = L.max_pool(net["conv5_3"], 2, 2)
    fc6 = L.conv2d(params["fc6"], pool5, relu=True, compute_dtype=dt)
    fc6 = L.dropout(r6, fc6, keep_prob)
    fc7 = L.conv2d(params["fc7"], fc6, relu=True, compute_dtype=dt)
    fc7 = L.dropout(r7, fc7, keep_prob)
    score_fr = L.conv2d(params["score_fr"], fc7, relu=False, compute_dtype=dt)
    up2 = L.deconv(params["upscore2"], score_fr, stride=2)
    sp4 = L.conv2d(params["score_pool4"], net["pool4"], relu=False, compute_dtype=dt)
    fuse4 = up2 + sp4
    up4 = L.deconv(params["upscore4"], fuse4, stride=2)
    sp3 = L.conv2d(params["score_pool3"], net["pool3"], relu=False, compute_dtype=dt)
    fuse3 = up4 + sp3
    upscore = L.deconv(params["upscore32"], fuse3, stride=8)
    return {
        "score": upscore,
        "prob": L.log_softmax_hd(upscore),
        "prob_normalized": L.softmax_hd(upscore),
        "label_2d": L.argmax_2d(upscore),
    }
