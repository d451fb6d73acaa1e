"""Benchmark: full 21-object PoseCNN inference, raw 640x480 frame -> poses.

Prints ONE JSON line:
  {"metric": "inference_fps_per_chip", "value": N, "unit": "frames/sec",
   "vs_baseline": N/60}

Baseline: 60 fps/chip target from BASELINE.md (the reference publishes no
numbers; its per-frame runtime prints on a 2017 GPU were ~0.1-0.3 s/frame,
i.e. 3-10 fps).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _tunnel_reachable(timeout_s: float = 3.0) -> bool:
    """Fast-fail guard: the axon TPU terminal retries its claim forever when
    the tunnel endpoint is down, which would hang the whole benchmark. Probe
    the terminal port first and emit an error JSON line instead of hanging."""
    import os
    import socket

    if os.environ.get("JAX_PLATFORMS") != "axon":
        return True  # not the tunneled backend (or JAX auto-selects)
    for port in (8082, 8083):
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=timeout_s):
                return True
        except OSError:
            continue
    return False


def main():
    if not _tunnel_reachable():
        print(json.dumps({
            "metric": "inference_fps_per_chip", "value": 0.0,
            "unit": "frames/sec", "vs_baseline": 0.0,
            "error": "tpu tunnel unreachable (terminal ports 8082/8083 refused)",
        }))
        return
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import entry

    fn, (params, raw, meta, extents) = entry()
    jfn = jax.jit(fn)

    # realistic inputs: random image bytes (content doesn't change the work:
    # fixed shapes everywhere, label map just selects hough slots)
    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.randint(0, 255, size=raw.shape, dtype=np.uint8))

    out = jfn(params, raw, meta, extents)
    jax.block_until_ready(out)

    # steady-state device latency via a CHAINED loop: each frame's input is
    # perturbed by the previous frame's output (the label map), forcing
    # strictly serial per-frame execution on device (async dispatch can
    # otherwise overlap iterations and `block_until_ready` alone is
    # unreliable on tunneled platforms). The chain runs INSIDE one jit via
    # lax.scan so per-call host dispatch is excluded: this environment
    # reaches the TPU through a debug tunnel (~2-3 ms per dispatch, ~30 ms
    # RTT — measured), which no production host has; on-device latency is
    # the hardware-meaningful number. The perturbation touches the raw
    # input frame itself, so no part of the network is loop-invariant and
    # XLA cannot hoist any stage out of the scan.
    import jax.numpy as jnp

    K = 25

    @jax.jit
    def chained(params, raw, seed):
        def body(s, _):
            r = (raw + s).astype(jnp.uint8)
            out = jfn(params, r, meta, extents)
            # fold EVERY output head into the carry so dead-code elimination
            # cannot drop any stage (labels, vertex field, rois, poses)
            tot = sum(o.astype(jnp.float32).sum() for o in jax.tree_util.tree_leaves(out))
            return (tot * 1e-9).astype(jnp.uint8), None

        s, _ = jax.lax.scan(body, seed, None, length=K)
        return s

    seed = chained(params, raw, jnp.uint8(0))
    jax.device_get(seed)
    iters = 4
    t0 = time.perf_counter()
    for _ in range(iters):
        seed = chained(params, raw, seed)
    jax.device_get(seed)
    dt = time.perf_counter() - t0
    fps = iters * K / dt

    print(
        json.dumps(
            {
                "metric": "inference_fps_per_chip",
                "value": round(fps, 2),
                "unit": "frames/sec (640x480, 22-class PoseCNN, raw->poses)",
                "vs_baseline": round(fps / 60.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
