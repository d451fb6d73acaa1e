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


def _he(key, shape):
    # He/MSRA fan-in scaling: the reference's fixed 0.001 initializer
    # (network.py make_var) only works because its ResNet50 is always
    # overwritten by pretrained Caffe weights — 50 layers of stddev-0.001
    # kernels attenuate activations to ~0 and from-scratch training freezes
    # at the uniform prior (loss pinned at ln(C)).
    import math

    return L.trunc_normal(key, shape, stddev=math.sqrt(2.0 / (shape[0] * shape[1] * shape[2])))


def init_resnet50_params(key: jax.Array, num_classes: int, input_dim: int = 3) -> Dict:
    ks = iter(jax.random.split(key, 64))
    p: Dict[str, Any] = {}
    p["conv1"] = L.init_conv(next(ks), 7, 7, input_dim, 64)
    p["bn_conv1"] = _init_bn(64)
    c_in = 64
    for stage, blocks, mid, out, _stride in _STAGES:
        # projection shortcut for the first block
        p[f"res{stage}a_branch1"] = {"weights": _he(next(ks), (1, 1, c_in, out))}
        p[f"bn{stage}a_branch1"] = _init_bn(out)
        for b in blocks:
            cin_b = c_in if b == "a" else out
            p[f"res{stage}{b}_branch2a"] = {"weights": _he(next(ks), (1, 1, cin_b, mid))}
            p[f"bn{stage}{b}_branch2a"] = _init_bn(mid)
            p[f"res{stage}{b}_branch2b"] = {"weights": _he(next(ks), (3, 3, mid, mid))}
            p[f"bn{stage}{b}_branch2b"] = _init_bn(mid)
            # last conv of each residual branch starts small (fixup-style):
            # the inference-BN (stored mean/var, no batch stats) is a no-op at
            # init, so He-scaled branches double activation variance per block
            # and the 16-block stack diverges from scratch
            p[f"res{stage}{b}_branch2c"] = {
                "weights": L.trunc_normal(next(ks), (1, 1, mid, out), stddev=0.01)
            }
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
    # relu=False: the reference DSL conv default puts a ReLU on these logits
    # (network.py conv relu=True) — a latent head bug fixed across all
    # variants in round 2; half-rectified logits halve the usable gradient
    score = L.conv2d(params["score"], h, relu=False, compute_dtype=dt)
    upscore = L.deconv(params["upscore"], score, stride=16)
    return {
        "score": upscore,
        "prob": L.log_softmax_hd(upscore),
        "prob_normalized": L.softmax_hd(upscore),
        "label_2d": L.argmax_2d(upscore),
    }
