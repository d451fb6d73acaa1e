"""Pallas TPU kernel for stride-1 SAME 3x3 convolution (fused bias+ReLU).

Why: XLA's conv lowering collapses on the full-resolution low-channel
layers of the VGG trunk — conv1_2 (640x480x64 -> 64) runs at ~6 TFLOP/s
forward and worse backward, costing more than conv2..conv5 COMBINED
(measured: ~17 of the 25.7 ms B=2 trunk fwd+bwd). This kernel streams row
slabs through VMEM and expresses each kernel tap as an MXU matmul with f32
accumulation:

    grid = (B, H/Hb); each program DMAs a (Hb+2, W+8, Cp) halo slab of the
    pre-padded input HBM->VMEM, then for each of the 9 taps computes
    (Hb*W, Cp) @ (Cp, Cout) into an f32 VMEM accumulator, and writes
    relu(acc + bias) as one (Hb, W, Cout) bf16 output block.

Alignment (Mosaic requires DMA slice shapes aligned to the (8, 128)
tiling): W is padded 1 left + 7 right, and channels are zero-padded up to
a multiple of 128 (Cp) — a zero-padded K=128 matmul wastes nothing the
half-empty K=64 MXU tile wasn't already wasting.

Backward (custom_vjp):
    dx = same kernel applied to the cotangent with spatially flipped,
         transposed weights (a stride-1 SAME conv identity);
    dw[dy,dx] = einsum over pixels of the shifted input with the cotangent
         (tall-K matmuls XLA already handles well);
    db = cotangent sum; the ReLU mask is taken from the saved output.

Status: tested alternative, NOT the production trunk path. Standalone this
kernel beats XLA's conv (2.84 vs 3.87 ms fwd at conv1_2 shape), but inside
the full jit graph the custom-call boundary breaks XLA's surrounding
fusions and costs more than it saves (trunk fwd 8.4 vs 4.8 ms measured) —
the shipped fix is `models/layers.conv3x3_manual_bwd` (XLA forward,
hand-written XLA backward; see DESIGN.md §4a). Numerics match
lax.conv_general_dilated bf16 within accumulation-order rounding (golden
test: tests/test_pallas_conv.py). Reference conv wrapper:
lib/networks/network.py:224-249.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _cp(c: int) -> int:
    return ((c + _LANE - 1) // _LANE) * _LANE


def _pick_hb(H: int, W: int, c_in: int, c_out: int) -> int:
    """Largest row-block dividing H that fits VMEM. Budget is conservative:
    besides slab + f32 accumulator + double-buffered out blocks, Mosaic
    stack-allocates the per-tap load and dot-result temporaries (~2 more
    acc-sized buffers — a 12 MB budget OOMed at 19.1 MB measured)."""
    cp = _cp(c_in)
    for hb in (64, 48, 40, 32, 30, 24, 20, 16, 12, 10, 8, 6, 5, 4, 3, 2, 1):
        if H % hb:
            continue
        slab = (hb + 2) * (W + 8) * cp * 2
        acc = hb * W * c_out * 4
        out = hb * W * c_out * 2
        xt_tmp = hb * W * cp * 2
        if slab + 2 * acc + 2 * out + xt_tmp < 13 * 1024 * 1024:
            return hb
    return 1


def _conv_kernel(W, C_p, C_out, Hb, relu, x_hbm, w_ref, b_ref, out_ref, xs, sem):
    b = pl.program_id(0)
    h = pl.program_id(1)
    dma = pltpu.make_async_copy(x_hbm.at[b, pl.ds(h * Hb, Hb + 2)], xs, sem)
    dma.start()
    dma.wait()
    # sum-of-dots in registers (a read-modify-write VMEM accumulator between
    # taps serializes MXU against VPU; this form measures ~12% faster)
    acc = None
    for dy in range(3):
        for dx in range(3):
            xt = xs[dy:dy + Hb, dx:dx + W, :].reshape(Hb * W, C_p)
            t = jnp.dot(xt, w_ref[dy, dx], preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
    y = acc + b_ref[0, :].reshape(1, C_out)
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[:] = y.reshape(1, Hb, W, C_out).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def _conv3x3_pallas_raw(x, w, b, relu: bool, interpret: bool = False):
    """x: (B,H,W,Cin) bf16 (unpadded); w: (3,3,Cin,Cout) bf16; b: (Cout,) f32."""
    B, H, W, C_in = x.shape
    C_out = w.shape[3]
    C_p = _cp(C_in)
    Hb = _pick_hb(H, W, C_in, C_out)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 7), (0, C_p - C_in)))
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, C_p - C_in), (0, 0)))
    kernel = functools.partial(_conv_kernel, W, C_p, C_out, Hb, relu)
    return pl.pallas_call(
        kernel,
        grid=(B, H // Hb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # full padded input, manual DMA
            pl.BlockSpec((3, 3, C_p, C_out), lambda b_, h_: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C_out), lambda b_, h_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Hb, W, C_out), lambda b_, h_: (b_, h_, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((Hb + 2, W + 8, C_p), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, wp, b.reshape(1, C_out))


def _flip_transpose(w):
    """dgrad weights: spatial flip + in/out transpose."""
    return jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def conv3x3_bias_relu(x, w, b, relu: bool = True, interpret: bool = False):
    """Fused 3x3 SAME conv + bias + optional ReLU, bf16 in/out, f32 accum.

    x: (B,H,W,Cin) bf16; w: (3,3,Cin,Cout) any float (cast to bf16);
    b: (Cout,) f32. Returns (B,H,W,Cout) bf16.
    """
    y, _ = _conv3x3_fwd(x, w, b, relu, interpret)
    return y


def _conv3x3_fwd(x, w, b, relu, interpret):
    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    y = _conv3x3_pallas_raw(xb, wb, b.astype(jnp.float32), relu, interpret)
    return y, (xb, wb, y)


def _conv3x3_bwd(relu, interpret, res, g):
    xb, wb, y = res
    g = g.astype(jnp.bfloat16)
    if relu:
        g = jnp.where(y > 0, g, jnp.bfloat16(0))
    # dx: stride-1 SAME conv of the cotangent with flipped/transposed weights
    dx = _conv3x3_pallas_raw(
        g, _flip_transpose(wb), jnp.zeros((xb.shape[-1],), jnp.float32), False, interpret
    )
    # dw: per-tap pixel contraction (tall-K matmul, MXU-friendly in XLA)
    B, H, W, _ = xb.shape
    xp = jnp.pad(xb, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = []
    for dy in range(3):
        row = []
        for dx_ in range(3):
            row.append(
                jnp.einsum(
                    "bhwc,bhwd->cd",
                    xp[:, dy:dy + H, dx_:dx_ + W, :],
                    g,
                    preferred_element_type=jnp.float32,
                )
            )
        taps.append(jnp.stack(row))
    dw = jnp.stack(taps)  # (3,3,Cin,Cout) f32
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2))
    return dx.astype(xb.dtype), dw, db


conv3x3_bias_relu.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def conv3x3_supported(x_shape, w_shape, stride: int, padding: str) -> bool:
    """Gate for the fast path: stride-1 SAME 3x3 on TPU with lane-aligned
    channels and enough rows to block usefully."""
    if jax.default_backend() != "tpu":
        return False
    if stride != 1 or padding != "SAME":
        return False
    kh, kw, c_in, c_out = w_shape
    if (kh, kw) != (3, 3):
        return False
    # Cin tiny (conv1_1's 3) would waste 128/3 of the MXU K tile; Cout must
    # fill lanes
    if c_in % 64 or c_out % 64:
        return False
    B, H, W, _ = x_shape
    return _pick_hb(H, W, c_in, c_out) >= 8
