"""Device-side chromatic augmentation vs the host cv2 implementation.

The host path (utils/blob.py chromatic_transform) is the golden reference:
cv2 BGR->HLS uint8, per-channel LUT jitter, HLS->BGR. The device path
(ops/chromatic.py) runs the same math in float, so differences are bounded
by the host path's uint8 HLS quantization.
"""

import cv2
import numpy as np
import jax.numpy as jnp

from posecnn_tpu.ops.chromatic import bgr_to_hls, chromatic_device, hls_to_bgr
from posecnn_tpu.utils.blob import chromatic_transform


def test_bgr_to_hls_matches_cv2():
    rng = np.random.RandomState(0)
    im = rng.randint(0, 256, (32, 48, 3), np.uint8)
    got = np.asarray(bgr_to_hls(jnp.asarray(im, jnp.float32)))
    want = cv2.cvtColor(im, cv2.COLOR_BGR2HLS).astype(np.float32)
    # cv2 quantizes to uint8; hue wraps at 180 so compare circularly
    dh = np.abs(got[..., 0] - want[..., 0])
    dh = np.minimum(dh, 180.0 - dh)
    assert dh.max() <= 1.5, dh.max()
    assert np.abs(got[..., 1:] - want[..., 1:]).max() <= 1.5


def test_hls_to_bgr_matches_cv2():
    rng = np.random.RandomState(1)
    hls = np.stack(
        [
            rng.randint(0, 180, (32, 48)),
            rng.randint(0, 256, (32, 48)),
            rng.randint(0, 256, (32, 48)),
        ],
        axis=-1,
    ).astype(np.uint8)
    got = np.asarray(hls_to_bgr(jnp.asarray(hls, jnp.float32)))
    want = cv2.cvtColor(hls, cv2.COLOR_HLS2BGR).astype(np.float32)
    assert np.abs(got - want).max() <= 2.0


def test_chromatic_device_matches_host_transform():
    rng = np.random.RandomState(2)
    im = rng.randint(0, 256, (2, 40, 56, 3), np.uint8)
    dhls = np.stack(
        [
            (rng.rand(2) - 0.5) * 0.02 * 180,
            (rng.rand(2) - 0.5) * 0.2 * 256,
            (rng.rand(2) - 0.5) * 0.2 * 256,
        ],
        axis=-1,
    ).astype(np.float32)
    got = np.asarray(chromatic_device(jnp.asarray(im, jnp.float32), jnp.asarray(dhls)))
    for b in range(2):
        want = chromatic_transform(
            im[b], d_h=dhls[b, 0], d_l=dhls[b, 1], d_s=dhls[b, 2]
        ).astype(np.float32)
        diff = np.abs(got[b] - want)
        # the host LUT quantizes HLS to uint8 before converting back; bound
        # the resulting per-pixel divergence instead of demanding equality
        assert np.median(diff) <= 2.0, np.median(diff)
        assert np.mean(diff) <= 3.0, np.mean(diff)
        assert np.quantile(diff, 0.99) <= 12.0, np.quantile(diff, 0.99)


def test_minibatch_ships_chroma_deltas_on_fast_path():
    from posecnn_tpu.data.minibatch import Frame, MinibatchConfig, get_minibatch

    rng = np.random.RandomState(3)
    H, W, C = 32, 32, 4
    fr = Frame(
        color=rng.randint(0, 256, (H, W, 3), np.uint8),
        label=np.zeros((H, W), np.int32),
        cls_indexes=np.asarray([1.0], np.float32),
        poses=np.zeros((3, 4, 1), np.float32),
        center=np.asarray([[16.0, 16.0]], np.float32),
        intrinsic_matrix=np.eye(3),
    )
    fr.poses[2, 3, 0] = 1.0
    mcfg = MinibatchConfig(
        num_classes=C, pixel_means=np.zeros(3), chromatic=True, add_noise=False,
        vertex_reg=True, device_targets=True,
    )
    ext = np.full((C, 3), 0.2, np.float32)
    pts = np.zeros((C, 8, 3), np.float32)
    sym = np.zeros(C, np.float32)
    batch = get_minibatch([fr, fr], mcfg, ext, pts, sym, rng=rng)
    assert batch["chroma_dhls"].shape == (2, 3)
    # deltas drawn from the reference distribution bounds (blob.py:69-74)
    assert np.all(np.abs(batch["chroma_dhls"][:, 0]) <= 1.8)
    assert np.all(np.abs(batch["chroma_dhls"][:, 1:]) <= 25.6)
    # the image blob itself is untouched uint8 (jitter happens in-graph)
    assert batch["data"].dtype == np.uint8
    np.testing.assert_array_equal(batch["data"][0], fr.color)
