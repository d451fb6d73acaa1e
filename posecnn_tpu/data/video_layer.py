"""Multi-frame data layer for the video GRU model.

Rewrite of lib/gt_data_layer/layer.py (:16-67) + minibatch.py: samples
NUM_STEPS-frame contiguous windows within one video sequence and assembles
(T, B, ...) blobs, with per-frame camera-motion matrices written into
meta_data[18:42] (pose_world2live / pose_live2world) so `compute_flow` can
warp the recurrent state between frames.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

from posecnn_tpu.data.minibatch import MinibatchConfig, build_meta_data
from posecnn_tpu.utils.se3 import se3_inverse, se3_mul


def group_by_video(image_index: List[str]) -> Dict[str, List[int]]:
    """YCB-Video style indices '<seq>/<frame>' -> per-video ordered lists."""
    videos = defaultdict(list)
    for i, name in enumerate(image_index):
        seq = name.split("/")[0] if "/" in name else "all"
        videos[seq].append(i)
    return dict(videos)


class GtDataLayer:
    """Contiguous-window sampler over videos (layer.py:31-55)."""

    def __init__(
        self,
        dataset,
        mcfg: MinibatchConfig,
        num_steps: int = 5,
        ims_per_batch: int = 1,
        seed: int = 3,
    ):
        self.dataset = dataset
        self.mcfg = mcfg
        self.num_steps = num_steps
        self.ims_per_batch = ims_per_batch
        self.rng = np.random.RandomState(seed)
        self.videos = group_by_video(dataset.image_index)
        self.video_names = sorted(self.videos)

    def _sample_window(self) -> List[int]:
        for _ in range(100):
            vid = self.video_names[self.rng.randint(len(self.video_names))]
            frames = self.videos[vid]
            if len(frames) >= self.num_steps:
                start = self.rng.randint(0, len(frames) - self.num_steps + 1)
                return frames[start : start + self.num_steps]
        raise RuntimeError("no video long enough for the requested window")

    def forward(self) -> Dict[str, np.ndarray]:
        """Returns blobs shaped (T, B, ...)."""
        T, B = self.num_steps, self.ims_per_batch
        datas, labels, depths, metas = [], [], [], []
        for _ in range(B):
            window = self._sample_window()
            frames = [self.dataset.load_frame(i) for i in window]
            RT_world = getattr(frames[0], "camera_pose", None)
            seq_data, seq_label, seq_depth, seq_meta = [], [], [], []
            for fr in frames:
                im = fr.color.astype(np.float32) - self.mcfg.pixel_means
                seq_data.append(im.astype(np.float32))
                seq_label.append(fr.label.astype(np.int32))
                d = fr.depth.astype(np.float32) / fr.factor_depth if fr.depth is not None else np.zeros(fr.label.shape, np.float32)
                seq_depth.append(d)
                mdata = build_meta_data(fr.intrinsic_matrix)
                RT_live = getattr(fr, "camera_pose", None)
                if RT_live is not None and RT_world is not None:
                    pose_world2live = se3_mul(RT_live, se3_inverse(RT_world))
                    pose_live2world = se3_inverse(pose_world2live)
                else:
                    pose_world2live = np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32)
                    pose_live2world = pose_world2live
                mdata[18:30] = pose_world2live.flatten()
                mdata[30:42] = pose_live2world.flatten()
                seq_meta.append(mdata)
            datas.append(seq_data)
            labels.append(seq_label)
            depths.append(seq_depth)
            metas.append(seq_meta)

        def stack(lists):  # (B,T,...) -> (T,B,...)
            return np.stack([np.stack(x) for x in lists]).swapaxes(0, 1)

        return {
            "data": stack(datas).astype(np.float32),
            "gt_label_2d": stack(labels).astype(np.int32),
            "depth": stack(depths).astype(np.float32),
            "meta_data": stack(metas).astype(np.float32),
        }

    def __iter__(self):
        while True:
            yield self.forward()
