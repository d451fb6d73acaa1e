"""Pallas TPU kernel for Hough vote accumulation.

The reference accumulates center votes with atomicAdd scatters over
(center, pixel) pairs (hough_voting_gpu_layer/hough_voting_gpu_op.cu.cc:
253-333). The TPU formulation is scatter-free: votes for a center are a
reduction over the sampled class pixels, embarrassingly parallel over
centers. The XLA fallback (`_votes_jax`, identical math) materializes
(chunk, Gh, Gw) broadcast intermediates in HBM; this kernel tiles the
(centers x samples) plane into VMEM blocks so the O(N_c * P) work never
touches HBM — only the per-center vote/depth-sum outputs do.

Layout:
  samples  (S, 8, P) f32 rows: px, py, u, v, depth, box_thr, (0.9*|uv|)^2, valid
  centers  (2, NCpad) f32 rows: cx, cy   (padded tail gets cx = -1e9 -> 0 votes)
  outputs  votes (S, NCpad) f32, dsum (S, NCpad) f32

Grid: (S, NCpad // block). Each program computes one (block,) strip of
centers against all P samples of one class slot: ~20 VPU flops per
(center, sample) pair on (block, P) operands resident in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (block, P) f32 intermediates; 512x512x4B = 1 MB each, ~6 live => well under
# the ~16 MB VMEM budget
_CENTER_BLOCK = 512


def _vote_kernel(samples_ref, centers_ref, votes_ref, dsum_ref):
    S = samples_ref.shape[0]
    cx = centers_ref[0, :].reshape(-1, 1)   # (block, 1)
    cy = centers_ref[1, :].reshape(-1, 1)
    # static unroll over slots: one (block, P) tile of VPU work each, all
    # operands resident in VMEM (slot temporaries are reused sequentially)
    for s in range(S):
        px = samples_ref[s, 0, :]      # (P,)
        py = samples_ref[s, 1, :]
        u = samples_ref[s, 2, :]
        v = samples_ref[s, 3, :]
        d = samples_ref[s, 4, :]
        thr = samples_ref[s, 5, :]
        tsq = samples_ref[s, 6, :]     # (inlier_threshold * |(u,v)|)^2
        val = samples_ref[s, 7, :]

        dx = cx - px[None, :]                    # (block, P)
        dy = cy - py[None, :]
        dot = u[None, :] * dx + v[None, :] * dy
        # sqrt-free cosine test: dot > t*|uv|*|c-p|  <=>  dot > 0 and
        # dot^2 > t^2*|uv|^2*|c-p|^2 (both sides non-negative)
        n2sq = dx * dx + dy * dy
        ok = (
            (dot > 0.0)
            & (dot * dot > tsq[None, :] * n2sq)
            & (jnp.abs(dx) < thr[None, :])
            & (jnp.abs(dy) < thr[None, :])
            & (val[None, :] > 0.0)
        )
        okf = ok.astype(jnp.float32)
        votes_ref[s, :] = jnp.sum(okf, axis=1)
        dsum_ref[s, :] = jnp.sum(okf * d[None, :], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _votes_pallas(samples: jnp.ndarray, centers: jnp.ndarray, block: int, interpret: bool):
    """Zero-gradient wrapper: Hough voting has no gradient in the reference
    (hough_voting_gpu_op.cc:54-60) and pallas_call defines no JVP rule —
    without this, reverse-mode linearization of the training graph fails
    even though the outputs sit behind stop_gradient."""
    return _votes_pallas_impl(samples, centers, block, interpret)


def _votes_pallas_fwd(samples, centers, block, interpret):
    shapes = (
        jax.ShapeDtypeStruct(samples.shape, samples.dtype),
        jax.ShapeDtypeStruct(centers.shape, centers.dtype),
    )
    return _votes_pallas_impl(samples, centers, block, interpret), shapes


def _votes_pallas_bwd(block, interpret, shapes, g):
    del block, interpret, g
    s_shape, c_shape = shapes
    return jnp.zeros(s_shape.shape, s_shape.dtype), jnp.zeros(c_shape.shape, c_shape.dtype)


_votes_pallas.defvjp(_votes_pallas_fwd, _votes_pallas_bwd)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _votes_pallas_impl(samples: jnp.ndarray, centers: jnp.ndarray, block: int, interpret: bool):
    S, _, P = samples.shape
    ncpad = centers.shape[1]
    grid = (ncpad // block,)
    return pl.pallas_call(
        _vote_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((S, 8, P), lambda c: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, block), lambda c: (0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, block), lambda c: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, block), lambda c: (0, c), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, ncpad), jnp.float32),
            jax.ShapeDtypeStruct((S, ncpad), jnp.float32),
        ],
        interpret=interpret,
    )(samples, centers)


def _votes_jax(samples, centers):
    """Reference path: same math, XLA broadcast-reduce (used on CPU)."""
    px, py, u, v, d, thr, tsq, val = [samples[:, i, :] for i in range(8)]
    cx, cy = centers[0], centers[1]
    dx = cx[None, :, None] - px[:, None, :]          # (S, NC, P)
    dy = cy[None, :, None] - py[:, None, :]
    dot = u[:, None, :] * dx + v[:, None, :] * dy
    n2sq = dx * dx + dy * dy
    ok = (
        (dot > 0.0)
        & (dot * dot > tsq[:, None, :] * n2sq)
        & (jnp.abs(dx) < thr[:, None, :])
        & (jnp.abs(dy) < thr[:, None, :])
        & (val[:, None, :] > 0.0)
    )
    okf = ok.astype(jnp.float32)
    return jnp.sum(okf, axis=2), jnp.sum(okf * d[:, None, :], axis=2)


def accumulate_votes_slots(
    samples: jnp.ndarray,
    centers: jnp.ndarray,
    *,
    use_pallas: bool = True,
    interpret: bool = False,
    block: int = _CENTER_BLOCK,
):
    """votes/dsum (S, NC) for S class slots over NC candidate centers.

    samples: (S, 8, P) packed rows px, py, u, v, depth, box_thr,
    (inlier_thr*|uv|)^2, valid; centers: (2, NC). NC is padded internally to a
    multiple of `block` (padded centers sit at -1e9 and collect 0 votes).
    """
    S, rows, P = samples.shape
    assert rows == 8, samples.shape
    nc = centers.shape[1]
    if not use_pallas:
        return _votes_jax(samples, centers)
    pad = (-nc) % block
    if pad:
        centers = jnp.pad(centers, ((0, 0), (0, pad)), constant_values=-1e9)
    votes, dsum = _votes_pallas(samples, centers, block, interpret)
    return votes[:, :nc], dsum[:, :nc]
