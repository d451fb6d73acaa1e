"""VGG16 convolutional trunk (conv1_1 ... conv5_3), functional.

Mirrors the layer graph of the reference `vgg16_convs.setup`
(lib/networks/vgg16_convs.py:80-97) and its dual `_p` tower for RGBD input
(:99-117). Runs in bfloat16 on the MXU with f32 accumulation by default.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from posecnn_tpu.models.layers import conv2d, init_conv, max_pool

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


def init_vgg_trunk(key, suffix: str = "") -> Dict:
    params = {}
    keys = jax.random.split(key, len(VGG_CONV_DEFS))
    for k, (name, c_i, c_o, _) in zip(keys, VGG_CONV_DEFS):
        params[name + suffix] = init_conv(k, 3, 3, c_i, c_o)
    return params


def vgg_trunk(
    params: Dict,
    x: jnp.ndarray,
    suffix: str = "",
    compute_dtype: Optional[jnp.dtype] = jnp.bfloat16,
) -> Dict[str, jnp.ndarray]:
    """Returns dict with conv4_3 / conv5_3 (plus all intermediate endpoints)."""
    out = {}
    h = x
    for name, _, _, pool_after in VGG_CONV_DEFS:
        h = conv2d(params[name + suffix], h, stride=1, relu=True, compute_dtype=compute_dtype)
        out[name + suffix] = h
        if pool_after:
            h = max_pool(h, 2, 2)
            out["pool" + name[4] + suffix] = h
    return out
