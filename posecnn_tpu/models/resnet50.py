"""ResNet50-FCN segmentation variant (lib/networks/resnet50.py:33-232).

Stride-16 ResNet50 trunk (7x7/2 conv, no max-pool, stages res2..res5 with
strides 1,2,2,2) -> 1x1 score conv -> x16 bilinear deconv -> log-softmax.
BatchNorm is inference-style (stored mean/variance, no scale/offset),
matching the reference's `batch_normalization` layer (network.py:530-556).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from posecnn_tpu.models import layers as L

# (stage, blocks, mid_channels, out_channels, stride)
_STAGES = [
    ("2", "abc", 64, 256, 1),
    ("3", "abcd", 128, 512, 2),
    ("4", "abcdef", 256, 1024, 2),
    ("5", "abc", 512, 2048, 2),
]


def _init_bn(c):
    return {"mean": jnp.zeros((c,), jnp.float32), "variance": jnp.ones((c,), jnp.float32)}


def _bn(params, x, relu=False):
    y = (x - params["mean"]) * jax.lax.rsqrt(params["variance"] + 1e-5)
    return jax.nn.relu(y) if relu else y


def init_resnet50_params(key: jax.Array, num_classes: int, input_dim: int = 3) -> Dict:
    ks = iter(jax.random.split(key, 64))
    p: Dict[str, Any] = {}
    p["conv1"] = L.init_conv(next(ks), 7, 7, input_dim, 64)
    p["bn_conv1"] = _init_bn(64)
    c_in = 64
    for stage, blocks, mid, out, _stride in _STAGES:
        # projection shortcut for the first block
        p[f"res{stage}a_branch1"] = {"weights": L.trunc_normal(next(ks), (1, 1, c_in, out))}
        p[f"bn{stage}a_branch1"] = _init_bn(out)
        for b in blocks:
            cin_b = c_in if b == "a" else out
            p[f"res{stage}{b}_branch2a"] = {"weights": L.trunc_normal(next(ks), (1, 1, cin_b, mid))}
            p[f"bn{stage}{b}_branch2a"] = _init_bn(mid)
            p[f"res{stage}{b}_branch2b"] = {"weights": L.trunc_normal(next(ks), (3, 3, mid, mid))}
            p[f"bn{stage}{b}_branch2b"] = _init_bn(mid)
            p[f"res{stage}{b}_branch2c"] = {"weights": L.trunc_normal(next(ks), (1, 1, mid, out))}
            p[f"bn{stage}{b}_branch2c"] = _init_bn(out)
        c_in = out
    p["score"] = L.init_conv(next(ks), 1, 1, 2048, num_classes, stddev=0.01)
    p["upscore"] = L.init_deconv(32, num_classes)
    return p


def resnet50_forward(params: Dict, data: jnp.ndarray, num_classes: int, compute_dtype=jnp.bfloat16) -> Dict:
    dt = compute_dtype
    h = L.conv2d(params["conv1"], data, stride=2, relu=False, compute_dtype=dt)
    h = _bn(params["bn_conv1"], h, relu=True)
    for stage, blocks, mid, out, stride in _STAGES:
        shortcut = L.conv2d(params[f"res{stage}a_branch1"], h, stride=stride, relu=False, compute_dtype=dt)
        shortcut = _bn(params[f"bn{stage}a_branch1"], shortcut)
        for b in blocks:
            s = stride if b == "a" else 1
            x = L.conv2d(params[f"res{stage}{b}_branch2a"], h if b == "a" else h, stride=s, relu=False, compute_dtype=dt)
            x = _bn(params[f"bn{stage}{b}_branch2a"], x, relu=True)
            x = L.conv2d(params[f"res{stage}{b}_branch2b"], x, relu=False, compute_dtype=dt)
            x = _bn(params[f"bn{stage}{b}_branch2b"], x, relu=True)
            x = L.conv2d(params[f"res{stage}{b}_branch2c"], x, relu=False, compute_dtype=dt)
            x = _bn(params[f"bn{stage}{b}_branch2c"], x)
            h = jax.nn.relu((shortcut if b == "a" else h) + x)
            shortcut = None
    score = L.conv2d(params["score"], h, relu=True, compute_dtype=dt)
    upscore = L.deconv(params["upscore"], score, stride=16)
    return {
        "score": upscore,
        "prob": L.log_softmax_hd(upscore),
        "prob_normalized": L.softmax_hd(upscore),
        "label_2d": L.argmax_2d(upscore),
    }
