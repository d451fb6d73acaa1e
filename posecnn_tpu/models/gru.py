"""Recurrent 2D fusion cells for the multi-frame video path.

Functional rewrites of the reference cells:
* GRU2DCell      — lib/networks/gru2d.py: one sigmoid update gate from a 1x1
  conv over [inputs, state]; running weighted average
  new_h = relu((w*state + u*inputs)/(w+u)), new_w = w + u.
* GRUCell (orig) — lib/networks/gru2d_original.py: standard convolutional GRU
  with reset/update gates.
* Vanilla2DCell  — lib/networks/vanilla2d.py: tanh(conv([inputs, state])).
* Add2DCell      — lib/networks/add2d.py: running average by step count.
* GRU3DCell      — lib/networks/gru3d.py: flag-gated voxel-grid update; a
  1x1x1 conv3d update gate u over [inputs, state], then
  new_h = flag * relu(u*state + (1-u)*inputs) + (1-flag) * state
  (voxels unobserved this frame keep their previous state).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from posecnn_tpu.models.layers import conv2d, init_conv


def init_gru2d(key, num_units: int, channels: int) -> Dict:
    # reference initializes the gate kernel and biases to zero (gru2d.py:33-36)
    return {
        "Gates": {
            "weights": jnp.zeros((1, 1, num_units + channels, num_units), jnp.float32),
            "biases": jnp.zeros((num_units,), jnp.float32),
        }
    }


def gru2d(params: Dict, inputs: jnp.ndarray, state: jnp.ndarray, weights: jnp.ndarray):
    """inputs (B,H,W,C), state/weights (B,H,W,U) -> (out, new_state, new_weights)."""
    xs = jnp.concatenate([inputs, state], axis=3)
    u = jax.nn.sigmoid(conv2d(params["Gates"], xs, relu=False))
    new_w = weights + u
    new_h = jax.nn.relu((weights * state + u * inputs) / new_w)
    return new_h, new_h, new_w


def init_gru2d_original(key, num_units: int, channels: int) -> Dict:
    k1, k2 = jax.random.split(key)
    return {
        "Gates": init_conv(k1, 1, 1, num_units + channels, 2 * num_units),
        "Candidate": init_conv(k2, 3, 3, num_units + channels, num_units),
    }


def gru2d_original(params: Dict, inputs: jnp.ndarray, state: jnp.ndarray):
    ru = jax.nn.sigmoid(conv2d(params["Gates"], jnp.concatenate([inputs, state], 3), relu=False))
    r, u = jnp.split(ru, 2, axis=3)
    c = jnp.tanh(conv2d(params["Candidate"], jnp.concatenate([inputs, r * state], 3), relu=False))
    new_h = u * state + (1 - u) * c
    return new_h, new_h


def init_vanilla2d(key, num_units: int, channels: int) -> Dict:
    return {"W": init_conv(key, 1, 1, num_units + channels, num_units)}


def vanilla2d(params: Dict, inputs: jnp.ndarray, state: jnp.ndarray):
    h = jnp.tanh(conv2d(params["W"], jnp.concatenate([inputs, state], 3), relu=False))
    return h, h


def add2d(inputs: jnp.ndarray, state: jnp.ndarray, step: int):
    """Running average over steps (lib/networks/add2d.py)."""
    new_h = (state * step + inputs) / (step + 1)
    return new_h, new_h


def init_gru3d(key, num_units: int, channels: int) -> Dict:
    # reference zero-initializes kernel and biases (gru3d.py:34-37)
    return {
        "Gates": {
            "weights": jnp.zeros((num_units + channels, num_units), jnp.float32),
            "biases": jnp.zeros((num_units,), jnp.float32),
        }
    }


def gru3d(params: Dict, inputs: jnp.ndarray, flag: jnp.ndarray, state: jnp.ndarray):
    """Voxel-grid GRU (lib/networks/gru3d.py:24-62).

    inputs (B,G,G,G,C), flag (B,G,G,G,1) 1 where the voxel was observed this
    frame, state (B,G,G,G,U). The reference's 1x1x1 conv3d is exactly a
    per-voxel matmul over the channel axis — lowered here as an einsum so the
    MXU sees one big (B*G^3, C+U) x (C+U, U) contraction instead of a conv3d.
    """
    xs = jnp.concatenate([inputs, state], axis=-1)
    g = params["Gates"]
    u = jax.nn.sigmoid(xs @ g["weights"] + g["biases"])
    fused = jax.nn.relu(u * state + (1.0 - u) * inputs)
    new_h = flag * fused + (1.0 - flag) * state
    return new_h, new_h
