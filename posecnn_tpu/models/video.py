"""Multi-frame video model: per-frame VGG-FCN + flow-warped GRU2D fusion.

Rewrite of lib/networks/vgg16.py:41-186 as a `lax.scan` over frames:
every step runs the shared trunk + two-scale fusion to a full-resolution
`upscore` map, warps the recurrent (state, weights, points) with
`compute_flow` (depth + camera motion from meta_data), fuses with GRU2D,
and emits per-step class scores. Scan-over-time composes with the
data-parallel mesh (SURVEY §5 long-context note).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from posecnn_tpu.models import layers as L
from posecnn_tpu.models.backbone import init_vgg_trunk, vgg_trunk
from posecnn_tpu.models.gru import gru2d, gru3d, init_gru2d, init_gru3d
from posecnn_tpu.ops.backproject import backproject, compute_label
from posecnn_tpu.ops.compute_flow import compute_flow


@dataclass(frozen=True)
class VideoConfig:
    num_classes: int = 22
    num_units: int = 64
    num_steps: int = 5
    flow_kernel: int = 3
    flow_threshold: float = 0.02
    flow_max_weight: float = 50.0
    compute_dtype: Any = jnp.bfloat16


def init_video_params(key: jax.Array, cfg: VideoConfig) -> Dict:
    C, U = cfg.num_classes, cfg.num_units
    ks = iter(jax.random.split(key, 8))
    params: Dict[str, Any] = {}
    params.update(init_vgg_trunk(next(ks)))
    params["score_conv5"] = L.init_conv(next(ks), 1, 1, 512, U)
    params["upscore_conv5"] = L.init_deconv(4, U)
    params["score_conv4"] = L.init_conv(next(ks), 1, 1, 512, U)
    params["upscore"] = L.init_deconv(16, U)
    params["gru2d"] = init_gru2d(next(ks), U, U)
    params["score"] = L.init_conv(next(ks), 1, 1, U, C, stddev=0.01)
    return params


def init_video_state(batch: int, height: int, width: int, num_units: int):
    """Fresh per-video recurrent state (test.py:425-446 reset semantics)."""
    state = jnp.zeros((batch, height, width, num_units), jnp.float32)
    weights = jnp.ones((batch, height, width, num_units), jnp.float32)
    points = jnp.full((batch, height, width, 3), jnp.nan, jnp.float32)
    return state, weights, points


def video_step(
    params: Dict,
    cfg: VideoConfig,
    data: jnp.ndarray,
    depth: jnp.ndarray,
    meta_data: jnp.ndarray,
    state: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
):
    """One frame through trunk + flow warp + GRU. Returns (outputs, new_state)."""
    dt = cfg.compute_dtype
    h_state, h_weights, h_points = state
    net = vgg_trunk(params, data, compute_dtype=dt)
    sc5 = L.conv2d(params["score_conv5"], net["conv5_3"], relu=True, compute_dtype=dt)
    up5 = L.deconv(params["upscore_conv5"], sc5, stride=2)
    sc4 = L.conv2d(params["score_conv4"], net["conv4_3"], relu=True, compute_dtype=dt)
    upscore = L.deconv(params["upscore"], sc4 + up5, stride=8)

    warped_state, warped_weights, points = compute_flow(
        h_state, h_weights, h_points, depth, meta_data,
        kernel_size=cfg.flow_kernel, threshold=cfg.flow_threshold,
        max_weight=cfg.flow_max_weight,
    )
    fused, new_state, new_weights = gru2d(params["gru2d"], upscore, warped_state, warped_weights)
    score = L.conv2d(params["score"], fused, relu=True, compute_dtype=dt)
    out = {
        "score": score,
        "prob": L.log_softmax_hd(score),
        "prob_normalized": L.softmax_hd(score),
        "label_2d": L.argmax_2d(score),
    }
    return out, (new_state, new_weights, points)


def video_forward(
    params: Dict,
    cfg: VideoConfig,
    data_seq: jnp.ndarray,
    depth_seq: jnp.ndarray,
    meta_seq: jnp.ndarray,
    state: Optional[Tuple] = None,
):
    """data_seq: (T,B,H,W,3); depth_seq: (T,B,H,W); meta_seq: (T,B,48).
    Returns per-step outputs stacked over T plus the final state."""
    T, B, H, W, _ = data_seq.shape
    if state is None:
        state = init_video_state(B, H, W, cfg.num_units)

    def step(carry, xs):
        d, z, m = xs
        out, carry = video_step(params, cfg, d, z, m, carry)
        return carry, out

    state, outs = jax.lax.scan(step, state, (data_seq, depth_seq, meta_seq))
    return outs, state


# ---------------------------------------------------------------------------
# 3D voxel-fusion variant: backproject -> GRU3D -> compute_label
# (reference DSL path: network.py:225-276 backproject/rnn_gru3d/compute_label
# over the voxel grid; the per-frame trunk is the same VGG-FCN)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Video3DConfig:
    num_classes: int = 22
    num_units: int = 64
    num_steps: int = 5
    grid_size: int = 32
    backproject_kernel: int = 1
    backproject_threshold: float = 0.02
    compute_dtype: Any = jnp.bfloat16


def init_video3d_params(key: jax.Array, cfg: Video3DConfig) -> Dict:
    C, U = cfg.num_classes, cfg.num_units
    ks = iter(jax.random.split(key, 8))
    params: Dict[str, Any] = {}
    params.update(init_vgg_trunk(next(ks)))
    params["score_conv5"] = L.init_conv(next(ks), 1, 1, 512, U)
    params["upscore_conv5"] = L.init_deconv(4, U)
    params["score_conv4"] = L.init_conv(next(ks), 1, 1, 512, U)
    params["upscore"] = L.init_deconv(16, U)
    params["score"] = L.init_conv(next(ks), 1, 1, U, C, stddev=0.01)
    params["gru3d"] = init_gru3d(next(ks), C, C)
    return params


def init_video3d_state(batch: int, grid_size: int, num_classes: int):
    """Fresh per-video voxel class-distribution state."""
    return jnp.zeros((batch, grid_size, grid_size, grid_size, num_classes), jnp.float32)


def video3d_step(
    params: Dict,
    cfg: Video3DConfig,
    data: jnp.ndarray,
    depth: jnp.ndarray,
    meta_data: jnp.ndarray,
    state_3d: jnp.ndarray,
):
    """One frame: trunk -> 2D class scores -> lift to voxels -> GRU3D fuse ->
    project fused distribution back to a 2D label. Returns (outputs, state)."""
    dt = cfg.compute_dtype
    net = vgg_trunk(params, data, compute_dtype=dt)
    sc5 = L.conv2d(params["score_conv5"], net["conv5_3"], relu=True, compute_dtype=dt)
    up5 = L.deconv(params["upscore_conv5"], sc5, stride=2)
    sc4 = L.conv2d(params["score_conv4"], net["conv4_3"], relu=True, compute_dtype=dt)
    upscore = L.deconv(params["upscore"], sc4 + up5, stride=8)
    score = L.conv2d(params["score"], upscore, relu=True, compute_dtype=dt)
    prob2d = L.softmax_hd(score).astype(jnp.float32)

    vox_prob, vox_label, flag = backproject(
        prob2d, prob2d, depth, meta_data, state_3d,
        grid_size=cfg.grid_size, kernel_size=cfg.backproject_kernel,
        threshold=cfg.backproject_threshold,
    )
    fused, new_state = gru3d(params["gru3d"], vox_label, flag, state_3d)
    label_2d = compute_label(fused, depth, meta_data, cfg.grid_size)
    out = {
        "score": score,
        "prob_normalized": prob2d,
        "label_2d": label_2d,
        "flag_3d": flag,
    }
    return out, new_state


def video3d_forward(
    params: Dict,
    cfg: Video3DConfig,
    data_seq: jnp.ndarray,
    depth_seq: jnp.ndarray,
    meta_seq: jnp.ndarray,
    state_3d: Optional[jnp.ndarray] = None,
):
    """Scan the voxel-fusion step over T frames; returns (outputs, final state).

    data_seq: (T,B,H,W,3); depth_seq: (T,B,H,W); meta_seq: (T,B,48)."""
    T, B = data_seq.shape[0], data_seq.shape[1]
    if state_3d is None:
        state_3d = init_video3d_state(B, cfg.grid_size, cfg.num_classes)

    def step(carry, xs):
        d, z, m = xs
        out, carry = video3d_step(params, cfg, d, z, m, carry)
        return carry, out

    state_3d, outs = jax.lax.scan(step, state_3d, (data_seq, depth_seq, meta_seq))
    return outs, state_3d
