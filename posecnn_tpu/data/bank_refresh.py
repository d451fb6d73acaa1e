"""Continuous refresh of the device-resident data bank.

The round-3 device bank (data/device_bank.py) froze a 2K-frame synthetic
set into HBM to make training device-bound on this single-core host — but
a frozen bank is a finite dataset: over the reference's 160K-iteration
schedule at batch 2 every frame is sampled ~160 times, and the rotation /
log-z heads memorize appearance->pose instead of generalizing (the 160K
checkpoint scores 13.5 deg median rotation on train frames vs 77 deg on
held-out val — output/diag_rot_160k_train.json). The reference never
reuses a synthetic frame at all: its render thread streams a fresh scene
every iteration (tools/train_net.py:155-258 consuming
synthesize.cpp render_python).

This module restores that unbounded-data property without giving back the
device-bound step:

  * `BankRefresher` — a daemon thread that renders fresh scenes with the
    native CPU rasterizer and packs them into bank-row chunks
    (`device_bank.pack_frames`). ctypes foreign calls and NumPy kernels
    release the GIL, so the render work overlaps the window where the
    main thread blocks on the device step.
  * `make_bank_updater` — one jitted `dynamic_update_slice` over the bank
    pytree (start index traced, so every chunk position shares a single
    compilation). The update is NOT donated: the solver's prefetch hands
    the step function the previous bank reference, so donation would
    invalidate buffers still in flight; the transient second bank costs
    one HBM copy (~3 ms) every few hundred iterations.
  * `refreshing_bank_iter` — the data iterator for Solver.train: yields
    the current bank every step and splices in a ready chunk between
    steps, rotating the write window over the whole bank.

Training then sees a sliding window over an endless synthetic stream —
tens of thousands of unique frames per run instead of 2K — while the
per-step host cost stays zero.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from posecnn_tpu.data.device_bank import pack_frames

# refresh frames draw from their own seed region, far from the frozen
# train stream (seed0 0) and the val stream (seed0 10_000_000) in
# data/synthetic.py, so a refreshed bank can never leak val frames
REFRESH_SEED0 = 50_000_000


def refresh_synthesizer(imdb):
    """Synthesizer matching the train imdb's render configuration.

    `SyntheticDataset` carries its synthesizer; a `FrozenSyntheticDataset`
    rebuilds from the render params its freeze pinned into manifest.json
    (data/synthetic.py freeze_dataset), so a snapshot frozen with
    non-default dims/object counts refreshes with the same distribution.
    Manifests predating the render_params field fall back to the
    `SyntheticDataset` defaults they were rendered with.
    """
    synth = getattr(imdb, "synth", None)
    if synth is not None:
        return synth
    from posecnn_tpu.data.synthetic import build_ycb_synthesizer

    base = getattr(imdb, "base", imdb)
    params = dict(getattr(imdb, "manifest", {}).get(
        "render_params", {"width": 640, "height": 480, "max_objects": 5}))
    return build_ycb_synthesizer(base, **params)


class BankRefresher(threading.Thread):
    """Background producer of packed bank-row chunks.

    Each chunk of `chunk_size` frames is rendered from deterministic seeds
    `REFRESH_SEED0 + seed_offset + i` (i = global frame counter), so the
    stream never repeats within a run and never collides with the frozen
    train/val seed regions. `seed_offset` should fold in the resume
    iteration so supervisor kill+resume cycles keep advancing through new
    scenes instead of replaying the first chunks.
    """

    def __init__(self, synth, g_max: int, chunk_size: int = 64,
                 seed_offset: int = 0, max_ready: int = 2,
                 throttle_sec: float = 0.0, counter_path: Optional[str] = None):
        super().__init__(daemon=True, name="bank-refresher")
        self.synth = synth
        self.g_max = int(g_max)
        self.chunk_size = int(chunk_size)
        # renders contend with the train loop for this host's single core
        # (~50 ms/iter at full render rate); the throttle caps the render
        # duty cycle. Even at 1 frame/s a 2K bank turns over every ~33 min,
        # ~15 sightings/frame over the 160K schedule vs 160 frozen
        self.throttle_sec = float(throttle_sec)
        self._counter = int(seed_offset)
        # seed_offset=start_iter only approximates frames already rendered:
        # a child that wedges before iterations advance keeps rendering, so
        # a kill+resume at the same start_iter would replay identical seeds.
        # The sidecar persists the true high-water counter across restarts.
        self.counter_path = counter_path
        if counter_path is not None and os.path.exists(counter_path):
            try:
                with open(counter_path) as fh:
                    self._counter = max(self._counter, int(fh.read().strip()))
            except (OSError, ValueError):
                pass
        self._ready: "queue.Queue[Dict[str, np.ndarray]]" = queue.Queue(
            maxsize=max_ready)
        self._stop_evt = threading.Event()
        self.frames_produced = 0

    def _persist_counter(self):
        if self.counter_path is None:
            return
        tmp = self.counter_path + ".tmp"
        try:
            with open(tmp, "w") as fh:
                fh.write(str(self._counter))
            os.replace(tmp, self.counter_path)
        except OSError:
            pass

    def run(self):
        import time as _time

        while not self._stop_evt.is_set():
            frames = []
            for _ in range(self.chunk_size):
                rng = np.random.RandomState(REFRESH_SEED0 + self._counter)
                self._counter += 1
                frames.append(self.synth.render_scene(rng))
                if self._stop_evt.is_set():
                    return
                if self.throttle_sec > 0.0:
                    _time.sleep(self.throttle_sec)
            chunk = pack_frames(frames, self.g_max)
            self._persist_counter()
            while not self._stop_evt.is_set():
                try:
                    self._ready.put(chunk, timeout=1.0)
                    self.frames_produced += self.chunk_size
                    break
                except queue.Full:
                    continue

    def poll(self) -> Optional[Dict[str, np.ndarray]]:
        """A ready chunk, or None without blocking."""
        try:
            return self._ready.get_nowait()
        except queue.Empty:
            return None

    def stop(self):
        self._stop_evt.set()


def make_bank_updater():
    """Jitted splice of a chunk into the bank at a traced row offset."""

    @jax.jit
    def update(bank, chunk, start):
        return {
            k: jax.lax.dynamic_update_slice_in_dim(bank[k], chunk[k], start,
                                                   axis=0)
            for k in bank
        }

    return update


def chunk_positions(n_bank: int, chunk: int):
    """Write offsets tiling [0, n_bank): step-`chunk` strides plus a final
    overlapping window so the tail rows also turn over."""
    if chunk >= n_bank:
        return [0]
    pos = list(range(0, n_bank - chunk + 1, chunk))
    if pos[-1] != n_bank - chunk:
        pos.append(n_bank - chunk)
    return pos


def refreshing_bank_iter(bank, refresher: BankRefresher,
                         log=None) -> Iterator[Dict[str, jnp.ndarray]]:
    """Solver data iterator: yields the live bank, splicing in refreshed
    chunks between steps. Infinite, like `itertools.repeat(bank)`."""
    n = int(bank["data"].shape[0])
    positions = chunk_positions(n, refresher.chunk_size)
    update = make_bank_updater()
    pi = 0
    swapped = 0
    while True:
        chunk = refresher.poll()
        if chunk is not None:
            bank = update(bank, jax.device_put(chunk),
                          jnp.asarray(positions[pi], jnp.int32))
            pi = (pi + 1) % len(positions)
            swapped += 1
            if log is not None and (swapped & (swapped - 1)) == 0:
                # power-of-two cadence: early splices confirm liveness fast,
                # later ones don't spam the log
                log(f"bank refresh: {refresher.frames_produced} fresh frames "
                    f"spliced ({swapped} chunks)")
        yield bank
