"""Checkpointing and legacy weight conversion.

* Two snapshot formats (replaces tf.train.Saver, lib/fcn/train.py:38-56),
  both with `max_to_keep` and `<prefix>_iter_N` naming:
  - "npz" (default): one flat .npz file written via a single device fetch
    + atomic rename. On tunneled device platforms orbax's async machinery
    takes ~15 min per 500 MB snapshot and can hang outright when a save
    lands mid-dispatch; the npz path is a plain `jax.device_get` (~30 s)
    and cannot deadlock. Single-host only.
  - "orbax": sharded/async checkpointing for multi-host meshes.
* `load_vgg16_npy`: Caffe-exported vgg16.npy dict -> param pytree, including
  the reference's auto-duplication into `_p`/`_d` dual towers
  (lib/networks/network.py:71-107).
* `load_tf1_checkpoint`: released TF1 `.ckpt` -> param pytree. Variable
  names map 1:1 (`conv1_1/weights` etc.); conv kernels are HWIO in both
  frameworks and FC weights keep the 7x7x512 NHWC flatten order
  (network.py:399-421), so tensors transfer without permutation.
* `restore_partial`: name+shape-matched partial restore, skipping
  unknown/mismatched entries (SolverWrapper.restore semantics,
  train.py:58-91).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_state(payload) -> Dict[str, np.ndarray]:
    """Pytree -> {keypath: np.ndarray} with jax.tree_util key paths."""
    flat, _ = jax.tree_util.tree_flatten_with_path(payload)
    return {jax.tree_util.keystr(kp): np.asarray(leaf) for kp, leaf in flat}


def save_checkpoint(
    directory: str,
    state,
    step: int,
    prefix: str = "posecnn",
    max_to_keep: int = 12,
    include_opt_state: bool = True,
    fmt: str = "npz",
):
    """Snapshot train state. `include_opt_state=False` writes a light
    params-only checkpoint (~4x less device->host traffic — relevant on
    tunneled platforms where a 1 GB fetch can stall); `restore_checkpoint`
    then reinitializes momentum to zeros (approximate resume). fmt: "npz"
    (single fetch + atomic rename, single-host) or "orbax" (multi-host)."""
    os.makedirs(directory, exist_ok=True)
    params, opt_state, step_arr = state
    payload = {"params": params, "step": step_arr}
    if include_opt_state:
        payload["opt_state"] = opt_state

    if fmt == "npz":
        path = os.path.join(os.path.abspath(directory), f"{prefix}_iter_{step}.npz")
        tmp = path + ".tmp"
        arrays = _flatten_state(jax.device_get(payload))
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)  # atomic: readers never see partial writes
    else:
        import orbax.checkpoint as ocp

        path = os.path.join(os.path.abspath(directory), f"{prefix}_iter_{step}")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()
    _prune_old(directory, prefix, max_to_keep)
    return path


def _prune_old(directory: str, prefix: str, max_to_keep: int):
    entries = []
    for name in os.listdir(directory):
        if name.endswith(".orbax-checkpoint-tmp"):  # stale interrupted writes
            import shutil

            shutil.rmtree(os.path.join(directory, name), ignore_errors=True)
            continue
        if name.endswith(".npz.tmp"):
            try:
                os.remove(os.path.join(directory, name))
            except OSError:
                pass
            continue
        if name.startswith(prefix + "_iter_"):
            try:
                entries.append((_step_of(name), name))
            except ValueError:
                continue
    entries.sort()
    for _, name in entries[:-max_to_keep]:
        full = os.path.join(directory, name)
        if os.path.isdir(full):
            import shutil

            shutil.rmtree(full, ignore_errors=True)
        else:
            try:
                os.remove(full)
            except OSError:
                pass


def _step_of(name: str) -> int:
    stem = name[:-4] if name.endswith(".npz") else name
    return int(stem.rsplit("_", 1)[1])


def latest_checkpoint(directory: str, prefix: str = "posecnn") -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    best, path = -1, None
    for name in os.listdir(directory):
        if name.startswith(prefix + "_iter_") and not name.endswith(".tmp"):
            try:
                step = _step_of(name)
            except ValueError:
                continue
            if step > best:
                best, path = step, os.path.join(directory, name)
    return path


def restore_checkpoint(path: str, target_state):
    params, opt_state, step_arr = target_state
    if path.endswith(".npz"):
        data = np.load(path)
        payload = {"params": params, "step": step_arr, "opt_state": opt_state}
        flat, treedef = jax.tree_util.tree_flatten_with_path(payload)
        out = []
        for kp, leaf in flat:
            key = jax.tree_util.keystr(kp)
            if key in data:
                out.append(jnp.asarray(data[key], dtype=leaf.dtype))
            else:
                # light checkpoint: keep fresh optimizer state
                out.append(leaf)
        restored = jax.tree_util.tree_unflatten(treedef, out)
        return (restored["params"], restored["opt_state"], restored["step"])

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    path = os.path.abspath(path)
    # light (params-only) checkpoints restore with fresh optimizer state:
    # try the full layout first, fall back on a tree-structure mismatch
    try:
        restored = ckptr.restore(
            path, {"params": params, "opt_state": opt_state, "step": step_arr}
        )
        return (restored["params"], restored["opt_state"], restored["step"])
    except ValueError:
        restored = ckptr.restore(path, {"params": params, "step": step_arr})
        return (restored["params"], opt_state, restored["step"])


def load_params_npz(path: str, params, log=None):
    """Load a params pytree from any of this repo's npz layouts: a full
    train-state snapshot (keys prefixed `['params']`), a params-only export
    (bare `['conv1_1']['weights']` keys, possibly f16). Missing keys keep
    their initialized values; dtypes are cast to the target leaf's."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    n = 0
    for kp, leaf in flat:
        key = jax.tree_util.keystr(kp)
        arr = None
        if "['params']" + key in data:
            arr = data["['params']" + key]
        elif key in data:
            arr = data[key]
        if arr is not None and tuple(arr.shape) == tuple(leaf.shape):
            out.append(jnp.asarray(arr, dtype=leaf.dtype))
            n += 1
        else:
            out.append(leaf)
            if log and arr is not None:
                log(f"shape mismatch, skipping {key}")
    if log:
        log(f"restored {n}/{len(flat)} tensors from {path}")
    return jax.tree_util.tree_unflatten(treedef, out)


# ---------------------------------------------------------------------------
# Legacy weight converters
# ---------------------------------------------------------------------------

def load_vgg16_npy(path: str, params: Dict, dual_suffixes=("_p", "_d"), log=None) -> Dict:
    """Merge a Caffe-exported vgg16.npy dict into an existing param pytree.

    npy layout: {op_name: {'weights': w, 'biases': b}}. Like Network.load,
    each op's weights are also copied into `<op>_p` / `<op>_d` scopes when
    those exist in the target.
    """
    data = np.load(path, allow_pickle=True, encoding="latin1").item()
    out = dict(params)
    for op_name, values in data.items():
        for scope in (op_name,) + tuple(op_name + s for s in dual_suffixes):
            if scope not in out:
                continue
            tgt = dict(out[scope])
            for param_name, value in values.items():
                if param_name not in tgt:
                    continue
                if tuple(tgt[param_name].shape) != tuple(value.shape):
                    if log:
                        log(f"skip {scope}/{param_name}: shape {value.shape} vs {tgt[param_name].shape}")
                    continue
                tgt[param_name] = jnp.asarray(value, jnp.float32)
                if log:
                    log(f"{scope}/{param_name} assigned")
            out[scope] = tgt
    return out


def load_tf1_checkpoint(path: str, params: Dict, log=None) -> Dict:
    """Read a TF1 .ckpt (released PoseCNN demo model) into a param pytree.

    Skips `global_step`, bare `Variable` and Momentum slots like
    SolverWrapper.restore (train.py:58-91).
    """
    import tensorflow as tf  # CPU-only TF, used purely as a ckpt reader

    reader = tf.train.load_checkpoint(path)
    shapes = reader.get_variable_to_shape_map()
    out = {k: dict(v) for k, v in params.items()}
    n = 0
    for var_name, shape in sorted(shapes.items()):
        if var_name in ("global_step", "Variable") or "Momentum" in var_name:
            continue
        parts = var_name.split("/")
        if len(parts) != 2:
            continue
        scope, pname = parts
        if scope not in out or pname not in out[scope]:
            if log:
                log(f"skip {var_name}: not in target")
            continue
        value = reader.get_tensor(var_name)
        if tuple(out[scope][pname].shape) != tuple(value.shape):
            if log:
                log(f"skip {var_name}: shape {value.shape} vs {out[scope][pname].shape}")
            continue
        out[scope][pname] = jnp.asarray(value, jnp.float32)
        n += 1
        if log:
            log(f"{var_name} restored")
    if log:
        log(f"restored {n} tensors from {path}")
    return out


def restore_partial(source: Dict, target: Dict, log=None) -> Dict:
    """Name+shape-matched merge of one param pytree into another."""
    out = {k: dict(v) for k, v in target.items()}
    for scope, values in source.items():
        if scope not in out:
            continue
        for pname, value in values.items():
            if pname in out[scope] and tuple(out[scope][pname].shape) == tuple(value.shape):
                out[scope][pname] = value
                if log:
                    log(f"{scope}/{pname} restored")
    return out
