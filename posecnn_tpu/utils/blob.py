"""Host-side (NumPy/cv2) image blob helpers.

Behavioral match of the reference (`lib/utils/blob.py:13-131`): BGR channel
order, mean subtraction *before* resize, pad-to-multiple-of-16 with ceil,
chromatic HLS jitter and gaussian/motion-blur noise augmentation. These run
on CPU in the input pipeline; everything downstream is device-side.
"""

from __future__ import annotations

from typing import List, Optional

import cv2
import numpy as np


def im_list_to_blob(ims: List[np.ndarray], num_channels: int) -> np.ndarray:
    """Stack prepared images (means subtracted, BGR) into a NHWC blob."""
    max_shape = np.array([im.shape for im in ims]).max(axis=0)
    blob = np.zeros((len(ims), max_shape[0], max_shape[1], num_channels), dtype=np.float32)
    for i, im in enumerate(ims):
        if num_channels == 1:
            blob[i, : im.shape[0], : im.shape[1], :] = im[:, :, np.newaxis]
        else:
            blob[i, : im.shape[0], : im.shape[1], :] = im
    return blob


def prep_im_for_blob(im, pixel_means, target_size, max_size):
    """Mean-subtract then scale so min side == target (capped by max side)."""
    im = im.astype(np.float32, copy=False)
    im -= pixel_means
    im_size_min = np.min(im.shape[0:2])
    im_size_max = np.max(im.shape[0:2])
    im_scale = float(target_size) / float(im_size_min)
    if np.round(im_scale * im_size_max) > max_size:
        im_scale = float(max_size) / float(im_size_max)
    im = cv2.resize(im, None, None, fx=im_scale, fy=im_scale, interpolation=cv2.INTER_LINEAR)
    return im, im_scale


def pad_im(im: np.ndarray, factor: int, value=0) -> np.ndarray:
    height, width = im.shape[0], im.shape[1]
    pad_height = int(np.ceil(height / float(factor)) * factor - height)
    pad_width = int(np.ceil(width / float(factor)) * factor - width)
    if im.ndim == 3:
        return np.pad(im, ((0, pad_height), (0, pad_width), (0, 0)), "constant", constant_values=value)
    return np.pad(im, ((0, pad_height), (0, pad_width)), "constant", constant_values=value)


def unpad_im(im: np.ndarray, factor: int) -> np.ndarray:
    height, width = im.shape[0], im.shape[1]
    pad_height = int(np.ceil(height / float(factor)) * factor - height)
    pad_width = int(np.ceil(width / float(factor)) * factor - width)
    if im.ndim == 3:
        return im[0 : height - pad_height, 0 : width - pad_width, :]
    return im[0 : height - pad_height, 0 : width - pad_width]


def chromatic_transform(
    im: np.ndarray,
    label: Optional[np.ndarray] = None,
    rng: Optional[np.random.RandomState] = None,
    d_h=None,
    d_s=None,
    d_l=None,
) -> np.ndarray:
    """Jitter hue/luminosity/saturation in HLS space (BGR input/output)."""
    rng = rng or np.random
    if d_h is None:
        d_h = (rng.rand(1) - 0.5) * 0.02 * 180
    if d_l is None:
        d_l = (rng.rand(1) - 0.5) * 0.2 * 256
    if d_s is None:
        d_s = (rng.rand(1) - 0.5) * 0.2 * 256
    if im.dtype != np.uint8:
        im = np.clip(np.round(im), 0, 255).astype(np.uint8)
    hls = cv2.cvtColor(im, cv2.COLOR_BGR2HLS)
    # per-channel 256-entry LUT instead of three float passes over the full
    # image (the jitter deltas are per-image scalars, so the mapping is a
    # pure function of the 8-bit channel value); ~10x faster at 640x480 and
    # the hot host-side cost of the reference training schedule
    base = np.arange(256, dtype=np.float64)
    lut = np.empty((1, 256, 3), np.uint8)
    lut[0, :, 0] = ((base + float(d_h)) % 180).astype(np.uint8)
    lut[0, :, 1] = np.clip(base + float(d_l), 0, 255).astype(np.uint8)
    lut[0, :, 2] = np.clip(base + float(d_s), 0, 255).astype(np.uint8)
    new_im = cv2.cvtColor(cv2.LUT(hls, lut), cv2.COLOR_HLS2BGR)
    if label is not None:
        # keep foreground pixels un-jittered, as the reference does
        I = np.where(label > 0)
        new_im[I[0], I[1], :] = im[I[0], I[1], :]
    return new_im


def add_noise(image: np.ndarray, rng: Optional[np.random.RandomState] = None,
              force_blur: bool = False) -> np.ndarray:
    """90%: gaussian pixel noise; 10%: axis-aligned motion blur.

    force_blur: skip the coin flip and apply the blur branch (the device-
    noise fast path draws the gate itself and delegates only blur here)."""
    rng = rng or np.random
    r = 1.0 if force_blur else rng.rand(1)
    if r < 0.9:
        row, col, ch = image.shape
        var = rng.rand(1) * 0.3 * 256
        sigma = float(var ** 0.5)
        # float32 Generator noise: RandomState.randn is float64-only and the
        # three float64 passes (randn + repeat + add/clip) dominated the host
        # pipeline (~120 ms/batch at 640x480); same N(0, sigma) distribution,
        # broadcast over channels like the reference's repeat
        gen = np.random.default_rng(int(rng.randint(1 << 31)))
        gauss = gen.standard_normal((row, col), dtype=np.float32) * np.float32(sigma)
        noisy = np.clip(image.astype(np.float32) + gauss[:, :, None], 0, 255)
    else:
        sizes = [3, 5, 7, 9, 11, 15]
        size = sizes[int(rng.randint(len(sizes)))]
        kernel = np.zeros((size, size))
        if rng.rand(1) < 0.5:
            kernel[int((size - 1) / 2), :] = np.ones(size)
        else:
            kernel[:, int((size - 1) / 2)] = np.ones(size)
        noisy = cv2.filter2D(image, -1, kernel / size)
    return noisy
