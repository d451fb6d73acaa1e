"""Device-side chromatic augmentation (HLS hue/luminosity/saturation jitter).

The reference jitters training images on the host in HLS space
(lib/utils/blob.py:76-96: cv2 BGR->HLS, add per-image scalar deltas, back to
BGR). On the single-core hosts driving TPU training the two cvtColor passes
plus the LUT are ~30 ms/batch — a large fraction of the host-bound step
wall time. Like the gaussian-noise fast path (ops shipping `noise_sigma`),
the host now draws only the three per-image deltas and the (B,H,W,3) color
math runs inside the jit train step on the VPU, fully overlapped with
compute.

Numerics: works in float on the 0..255 uint8 scale with cv2's HLS
conventions (H in [0,180), L/S in [0,255]). The host LUT path quantizes HLS
to uint8 before converting back, so results differ by small rounding; the
golden test bounds the per-pixel difference.
"""

from __future__ import annotations

import jax.numpy as jnp


def bgr_to_hls(bgr: jnp.ndarray) -> jnp.ndarray:
    """BGR float in [0,255] -> HLS with cv2 uint8 scaling (H/2 in [0,180))."""
    b, g, r = bgr[..., 0], bgr[..., 1], bgr[..., 2]
    x = bgr / 255.0
    maxc = jnp.max(x, axis=-1)
    minc = jnp.min(x, axis=-1)
    l = (maxc + minc) * 0.5
    crng = maxc - minc
    safe = jnp.where(crng > 0, crng, 1.0)
    denom = jnp.where(l <= 0.5, maxc + minc, 2.0 - maxc - minc)
    s = jnp.where(crng > 0, crng / jnp.where(denom > 0, denom, 1.0), 0.0)
    rf, gf, bf = r / 255.0, g / 255.0, b / 255.0
    h_r = 60.0 * (gf - bf) / safe
    h_g = 120.0 + 60.0 * (bf - rf) / safe
    h_b = 240.0 + 60.0 * (rf - gf) / safe
    h = jnp.where(
        maxc == rf, h_r, jnp.where(maxc == gf, h_g, h_b)
    )
    h = jnp.where(crng > 0, jnp.mod(h, 360.0), 0.0)
    return jnp.stack([h * 0.5, l * 255.0, s * 255.0], axis=-1)


def _hue_component(m1: jnp.ndarray, m2: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    h = jnp.mod(h, 360.0)
    return jnp.where(
        h < 60.0, m1 + (m2 - m1) * h / 60.0,
        jnp.where(
            h < 180.0, m2,
            jnp.where(h < 240.0, m1 + (m2 - m1) * (240.0 - h) / 60.0, m1),
        ),
    )


def hls_to_bgr(hls: jnp.ndarray) -> jnp.ndarray:
    """HLS (cv2 uint8 scaling) -> BGR float in [0,255]."""
    h = hls[..., 0] * 2.0
    l = hls[..., 1] / 255.0
    s = hls[..., 2] / 255.0
    m2 = jnp.where(l <= 0.5, l * (1.0 + s), l + s - l * s)
    m1 = 2.0 * l - m2
    r = _hue_component(m1, m2, h + 120.0)
    g = _hue_component(m1, m2, h)
    b = _hue_component(m1, m2, h - 120.0)
    return jnp.stack([b, g, r], axis=-1) * 255.0


def chromatic_device(data: jnp.ndarray, dhls: jnp.ndarray) -> jnp.ndarray:
    """Apply per-image HLS jitter to a (B,H,W,3) BGR float batch in [0,255].

    dhls: (B,3) per-image deltas (d_h, d_l, d_s) drawn on the host with the
    reference distribution (blob.py:69-74): d_h ~ U(-1.8,1.8) hue units,
    d_l/d_s ~ U(-25.6,25.6) intensity units. Hue wraps mod 180 like the
    host LUT; L/S clip to [0,255].
    """
    hls = bgr_to_hls(data)
    d = dhls[:, None, None, :]
    h = jnp.mod(hls[..., 0] + d[..., 0], 180.0)
    l = jnp.clip(hls[..., 1] + d[..., 1], 0.0, 255.0)
    s = jnp.clip(hls[..., 2] + d[..., 2], 0.0, 255.0)
    out = hls_to_bgr(jnp.stack([h, l, s], axis=-1))
    return jnp.clip(out, 0.0, 255.0)
