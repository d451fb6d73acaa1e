"""VGG16 convolutional trunk (conv1_1 ... conv5_3), functional.

Mirrors the layer graph of the reference `vgg16_convs.setup`
(lib/networks/vgg16_convs.py:80-97) and its dual `_p` tower for RGBD input
(:99-117). Runs in bfloat16 on the MXU with f32 accumulation by default.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from posecnn_tpu.models.layers import conv2d, conv3x3_manual_bwd, init_conv, max_pool

VGG_CONV_DEFS = [
    # (name, c_i, c_o, pool_after)
    ("conv1_1", 3, 64, False),
    ("conv1_2", 64, 64, True),
    ("conv2_1", 64, 128, False),
    ("conv2_2", 128, 128, True),
    ("conv3_1", 128, 256, False),
    ("conv3_2", 256, 256, False),
    ("conv3_3", 256, 256, True),
    ("conv4_1", 256, 512, False),
    ("conv4_2", 512, 512, False),
    ("conv4_3", 512, 512, True),
    ("conv5_1", 512, 512, False),
    ("conv5_2", 512, 512, False),
    ("conv5_3", 512, 512, False),
]


def scaled_width(c: int, scale: float) -> int:
    """Channel width under a trunk width multiplier (min 8, /8-aligned)."""
    if scale >= 1.0:
        return c
    return max(8, int(round(c * scale / 8)) * 8)


def init_vgg_trunk(key, suffix: str = "", width_scale: float = 1.0) -> Dict:
    params = {}
    keys = jax.random.split(key, len(VGG_CONV_DEFS))
    for k, (name, c_i, c_o, _) in zip(keys, VGG_CONV_DEFS):
        ci = c_i if c_i == 3 else scaled_width(c_i, width_scale)
        co = scaled_width(c_o, width_scale)
        params[name + suffix] = init_conv(k, 3, 3, ci, co)
    return params


def vgg_trunk(
    params: Dict,
    x: jnp.ndarray,
    suffix: str = "",
    compute_dtype: Optional[jnp.dtype] = jnp.bfloat16,
) -> Dict[str, jnp.ndarray]:
    """Returns dict with conv4_3 / conv5_3 (plus all intermediate endpoints).

    The full-resolution 64-channel layer (conv1_2) uses a hand-written XLA
    backward (layers.conv3x3_manual_bwd): XLA's autodiff-generated backward
    for that shape costs ~17 of the 25.7 ms B=2 trunk fwd+bwd. conv2..conv5
    stay on plain XLA autodiff (they run near the matmul roofline).
    """
    out = {}
    h = x
    for name, _, c_out, pool_after in VGG_CONV_DEFS:
        p = params[name + suffix]
        if (
            compute_dtype == jnp.bfloat16
            and p["weights"].shape[-1] == 64
            and name != "conv1_1"
            and h.ndim == 4
            and h.shape[1] >= 128
        ):
            h = conv3x3_manual_bwd(p, h)
        else:
            h = conv2d(p, h, stride=1, relu=True, compute_dtype=compute_dtype)
        out[name + suffix] = h
        if pool_after:
            h = max_pool(h, 2, 2)
            out["pool" + name[4] + suffix] = h
    return out
