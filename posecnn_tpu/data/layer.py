"""Data layer: shuffled real/synthetic/adaptation streams + host prefetch.

Rewrite of `lib/gt_synthesize_layer/layer.py`:
  * independently shuffled index streams for real, synthetic and adaptation
    frames; a synthetic batch is drawn with probability SYN_RATIO/(SYN_RATIO+1)
    and an adaptation batch with ADAPT_RATIO/(ADAPT_RATIO+1) (layer.py:60-88);
  * background image bank for synthetic compositing (:125-176);
  * the reference fed a tf.FIFOQueue(25) from a Python thread
    (lib/fcn/train.py:383-436) — here a bounded prefetch thread feeds
    device-ready numpy batches, overlapping host assembly with device steps.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Callable, Iterator, List, Optional

import numpy as np

from posecnn_tpu.data.minibatch import Frame, MinibatchConfig, get_minibatch


class IndexStream:
    """Endless shuffled index stream (layer.py:24-58)."""

    def __init__(self, n: int, rng: np.random.RandomState):
        self.n = n
        self.rng = rng
        self._perm = None
        self._cur = 0

    def next(self, count: int) -> np.ndarray:
        if self.n <= 0:
            # a missing split file yields an empty index list — fail loudly
            # instead of spinning forever in the fill loop below
            raise ValueError("IndexStream over an empty dataset (0 images)")
        out = []
        while len(out) < count:
            if self._perm is None or self._cur >= self.n:
                self._perm = self.rng.permutation(np.arange(self.n))
                self._cur = 0
            take = min(count - len(out), self.n - self._cur)
            out.extend(self._perm[self._cur : self._cur + take])
            self._cur += take
        return np.asarray(out)


def build_background_paths(
    data_root: str = "data", input_format: str = "COLOR"
) -> List[str]:
    """Background image bank for synthetic compositing — file paths, loaded
    lazily at composite time (reference `_build_background_images`,
    gt_synthesize_layer/layer.py:125-176: SUN2012 + ObjectNet3D for color,
    RGBD-Scenes for depth). Missing roots simply contribute nothing."""
    import glob

    roots = []
    if input_format in ("COLOR", "RGBD", "NORMAL"):
        roots += [
            os.path.join(data_root, "SUN2012", "data", "Images"),
            os.path.join(data_root, "ObjectNet3D", "data"),
        ]
    else:
        roots.append(os.path.join(data_root, "RGBD-Scenes"))
    out: List[str] = []
    for root in roots:
        if not os.path.isdir(root):
            continue
        for ext in ("*.jpg", "*.JPEG", "*.jpeg", "*.png"):
            out.extend(glob.glob(os.path.join(root, "**", ext), recursive=True))
    return sorted(out)


class GtSynthesizeLayer:
    """Minibatch source mixing real / synthetic / adaptation frames."""

    def __init__(
        self,
        dataset,
        mcfg: MinibatchConfig,
        ims_per_batch: int = 2,
        synthesize: bool = False,
        syn_ratio: int = 1,
        syn_frames: Optional[Callable[[int, np.random.RandomState], Frame]] = None,
        adapt: bool = False,
        adapt_ratio: int = 1,
        adapt_frames: Optional[Callable[[int, np.random.RandomState], Frame]] = None,
        backgrounds: Optional[List[np.ndarray]] = None,
        seed: int = 3,
    ):
        self.dataset = dataset
        self.mcfg = mcfg
        self.ims_per_batch = ims_per_batch
        self.synthesize = synthesize
        self.syn_ratio = syn_ratio
        self.syn_frames = syn_frames
        self.adapt = adapt
        self.adapt_ratio = adapt_ratio
        self.adapt_frames = adapt_frames
        self.backgrounds = backgrounds or []
        self.rng = np.random.RandomState(seed)
        self.stream = IndexStream(dataset.num_images, self.rng)
        self._iter = 0

    def _choose_source(self) -> str:
        if self.adapt and self.rng.rand() < self.adapt_ratio / (self.adapt_ratio + 1.0):
            return "adapt"
        if self.synthesize and self.syn_frames is not None:
            if self.rng.rand() < self.syn_ratio / (self.syn_ratio + 1.0):
                return "syn"
        return "real"

    def forward(self) -> dict:
        source = self._choose_source()
        frames: List[Frame] = []
        if source == "real":
            for i in self.stream.next(self.ims_per_batch):
                fr = self.dataset.load_frame(int(i))
                # honor flip-augmentation roidb entries (USE_FLIPPED /
                # append_flipped_images); get_minibatch mirrors the frame
                rdb = getattr(self.dataset, "_roidb", None)
                if rdb is not None and rdb[int(i)].get("flipped"):
                    fr.flipped = True
                frames.append(fr)
        elif source == "syn":
            for _ in range(self.ims_per_batch):
                fr = self.syn_frames(self._iter, self.rng)
                fr.is_synthetic = True
                frames.append(fr)
        else:
            for _ in range(self.ims_per_batch):
                fr = self.adapt_frames(self._iter, self.rng)
                fr.is_adaptation = True
                frames.append(fr)
        self._iter += 1
        return get_minibatch(
            frames,
            self.mcfg,
            self.dataset._extents,
            self.dataset._points_all,
            self.dataset._symmetry,
            backgrounds=self.backgrounds,
            rng=self.rng,
        )

    def __iter__(self):
        while True:
            yield self.forward()


def prefetch(source: Iterator[dict], depth: int = 4, transform: Optional[Callable] = None) -> Iterator[dict]:
    """Bounded background prefetch thread (replaces FIFOQueue+load_and_enqueue)."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def worker():
        # any failure must reach the consumer: a dead worker with no
        # sentinel would hang the training loop on q.get() forever
        try:
            for item in source:
                if stop.is_set():
                    return
                if transform is not None:
                    item = transform(item)
                q.put(item)
            q.put(None)
        except BaseException as e:  # noqa: BLE001 — re-raised consumer-side
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


class GtSingleDataLayer(GtSynthesizeLayer):
    """Single-frame layer without synthesis/adaptation streams — the
    reference's `lib/gt_single_data_layer/layer.py` (it differs from the
    synthesize layer only in what it mixes in; the GAN-label path consumes
    the same blobs). Kept as a named class for API parity."""

    def __init__(self, dataset, mcfg, ims_per_batch: int = 2, seed: int = 3):
        super().__init__(
            dataset, mcfg, ims_per_batch=ims_per_batch,
            synthesize=False, adapt=False, seed=seed,
        )
