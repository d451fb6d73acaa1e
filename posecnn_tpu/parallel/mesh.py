"""Device mesh and sharding rules.

The reference has no multi-device story at all (single GPU via
CUDA_VISIBLE_DEVICES, SURVEY.md §2.3). Here parallelism is a first-class
subsystem:

  * axis "data":  data parallelism — per-device batch shards, gradients
    reduced with `psum` over ICI (jit inserts the collective from shardings);
  * axis "model": reserved for tensor parallelism (conv channel sharding) —
    PoseCNN's ~134M params fit one chip, so the default mesh is (N, 1), but
    all parameter shardings route through `param_sharding` so a model axis
    can be enabled without touching the train loop.

Multi-host: call `jax.distributed.initialize()` before `make_mesh` — the mesh
is then built over the global device set and batch sharding spans hosts (DCN
for host data fan-out, ICI for gradient collectives).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# minimum element count for a kernel to be channel-sharded over MODEL_AXIS;
# overridable (set_tp_min_size) so tiny-width dryrun/test graphs still
# exercise real tensor-parallel shardings
TP_MIN_SIZE = 1 << 22


def set_tp_min_size(n: int) -> None:
    global TP_MIN_SIZE
    TP_MIN_SIZE = int(n)


@dataclass(frozen=True)
class MeshSpec:
    data: int = 0  # 0 = all devices
    model: int = 1


def make_mesh(spec: MeshSpec = MeshSpec(), devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(spec.model, 1)
    data = spec.data if spec.data > 0 else n // model
    assert data * model <= n, f"mesh ({data},{model}) exceeds {n} devices"
    dev = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axis (inputs, activations)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def param_sharding(mesh: Mesh, path: str = "", leaf=None) -> NamedSharding:
    """Parameter sharding rule. Default: fully replicated.

    Hook point for tensor parallelism: shard the output-channel axis of
    large conv/fc kernels over MODEL_AXIS when spec.model > 1. Bilinear
    deconv interpolation filters ("upscore*") are excluded regardless of
    size: they are fixed resampling weights (reference trains them frozen,
    network.py make_deconv_filter) and channel-sharding one inserts an
    all-gather for zero FLOP savings — the full-width upscore_vertex filter
    (16*16*128*128) lands exactly on the 4M-element threshold otherwise.
    """
    if "upscore" in str(path):
        return NamedSharding(mesh, P())
    if mesh.shape[MODEL_AXIS] > 1 and leaf is not None and getattr(leaf, "ndim", 0) >= 2:
        # channel-shard the last axis of big kernels (fc6/fc7 dominate)
        if leaf.size >= TP_MIN_SIZE and leaf.shape[-1] % mesh.shape[MODEL_AXIS] == 0:
            return NamedSharding(mesh, P(*([None] * (leaf.ndim - 1) + [MODEL_AXIS])))
    return NamedSharding(mesh, P())


def shard_params(mesh: Mesh, params):
    """Apply `param_sharding` across a pytree and device_put accordingly."""
    def place(path, leaf):
        return jax.device_put(leaf, param_sharding(mesh, str(path), leaf))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(mesh: Mesh, batch):
    """Place a host batch dict: arrays with a leading batch axis get split
    over DATA_AXIS, everything else is replicated."""
    n_data = mesh.shape[DATA_AXIS]

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % n_data == 0 and x.shape[0] > 0:
            return jax.device_put(x, batch_sharding(mesh))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(place, batch)
