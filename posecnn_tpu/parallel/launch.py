"""Multi-host (multi-process) launch utilities.

The reference is strictly single-GPU/single-process (SURVEY.md §2.3: no
NCCL/MPI/Horovod anywhere); multi-host data parallelism is a new first-class
subsystem here. The model:

  * one Python process per host, each seeing its local TPU chips;
  * `initialize()` wires them into one JAX global runtime (coordinator via
    ICI/DCN barriers — `jax.distributed.initialize`);
  * `make_mesh` (parallel/mesh.py) then builds the mesh over the GLOBAL
    device set, so shardings and psum collectives span hosts transparently;
  * each host feeds only its own shard of the batch:
    `global_batch_from_local` assembles a global jax.Array from
    process-local numpy shards without gathering (DCN never sees pixels).

Tested for real in tests/test_multihost.py: two coordinated CPU processes
run a psum and a sharded train-style step over a 4-device global mesh.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the global JAX runtime.

    On Cloud TPU pods all three arguments auto-resolve from the metadata
    server — call with no arguments. Elsewhere (CPU fleets, manual layouts)
    they come from the arguments or the environment:
    POSECNN_COORDINATOR / POSECNN_NUM_PROCESSES / POSECNN_PROCESS_ID.
    Single-process runs (num_processes == 1 or nothing configured) are a
    no-op, so the same entry point works from laptop to pod.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("POSECNN_COORDINATOR")
    if num_processes is None and "POSECNN_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["POSECNN_NUM_PROCESSES"])
    if process_id is None and "POSECNN_PROCESS_ID" in os.environ:
        process_id = int(os.environ["POSECNN_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        # Cloud TPU pod: auto-detected; plain single host: nothing to do.
        # Tunneled/partial TPU environments can carry pod-ish env vars
        # without resolvable coordinator metadata — fall back to
        # single-process rather than failing the run.
        if os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
            try:
                jax.distributed.initialize()
            except (ValueError, RuntimeError) as e:
                print(f"multi-host autodetection unavailable ({e}); single-process")
        return
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


# per-image blob keys that shard over the data axis — the same set the
# jitted train step's batch_shardings uses. Everything else ('poses' rows,
# points/symmetry tables, ...) is replicated: a shape that merely happens to
# divide the data axis must NOT be treated as a local shard (e.g. 'poses'
# (max_gt,13) would concatenate into (P*max_gt,13) and break the step).
DATA_SHARDED_KEYS = (
    "data", "data_p", "data_gan", "gan_z", "gt_label_2d",
    "vertex_targets", "vertex_weights", "vertex_targets3", "vertex_weights3",
    "meta_data", "gt_centers",
)


def global_batch_from_local(mesh, batch: Dict[str, np.ndarray], batch_keys=None) -> Dict:
    """Assemble global jax.Arrays from per-process local shards.

    batch: this process's slice of the batch (leading axis = local batch).
    Arrays whose key is in `batch_keys` (default: DATA_SHARDED_KEYS, the
    per-image blobs the train step shards) become data-sharded global arrays
    via `jax.make_array_from_process_local_data`; everything else is
    replicated. The result feeds the same jitted train step as the
    single-host path.

    NOTE the replicated blobs must be process-identical. 'poses' rows carry
    batch indices in column 0 that refer to the *global* batch — multi-host
    pipelines should use the compact per-image 'gt_centers'/device-target
    path (the default), where no cross-image index blob exists."""
    import jax

    from posecnn_tpu.parallel.mesh import batch_sharding, replicated

    bsh = batch_sharding(mesh)
    repl = replicated(mesh)
    keys = DATA_SHARDED_KEYS if batch_keys is None else batch_keys
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if k in keys:
            out[k] = jax.make_array_from_process_local_data(bsh, v)
        else:
            out[k] = jax.make_array_from_process_local_data(repl, v)
    return out


def process_local_batch_size(mesh, global_batch: int) -> int:
    """This process's share of the global batch under the data axis."""
    import jax

    from posecnn_tpu.parallel.mesh import DATA_AXIS

    n_data = mesh.shape[DATA_AXIS]
    per_shard = global_batch // n_data
    # devices of one process may cover several data rows; count distinct
    # data-axis rows owned by this process
    axis = list(mesh.axis_names).index(DATA_AXIS)
    rows = np.moveaxis(mesh.devices, axis, 0).reshape(mesh.shape[DATA_AXIS], -1)
    mine = sum(
        1 for r in range(rows.shape[0])
        if any(d.process_index == jax.process_index() for d in rows[r])
    )
    return per_shard * mine
