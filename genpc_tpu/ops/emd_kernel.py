"""Pallas TPU kernel for the auction-EMD bid phase.

The XLA bid phase (ops/emd.py:_bid_phase) is HBM-bound: the [rows, m]
value matrix (64 MB per 1024-row tile at m=16384) cannot stay in VMEM,
so every auction iteration streams ~n*m*4 bytes several times (compute v,
argmax, masked second-best).  Measured at the metric envelope
(B=13, n=m=16384, 50 iterations): ~94 ms/iteration, 4.7 s per eval —
the dominant cost of the whole metric stage.

This kernel keeps the value tile VMEM-resident: one grid cell per
(object, 256-source-row tile), an inner fori_loop over 2048-column
chunks computing distance -> value -> running top-2 merge entirely
on-chip.  Per-cell HBM traffic is just the x2/price vectors (~260 KB)
instead of ~3 passes over a [rows, m] float matrix.

Mosaic constraints shape the layout (cf. ops/fps_kernel.py):
  * sources ride the SUBLANE dim: x1 block [TX, 3] gives [TX, 1]
    coordinate columns by static slicing — no transposes anywhere;
  * targets ride the LANE dim: x2 is passed TRANSPOSED [B, 3, m] so
    column chunks are [1, C] dynamic slices at 128-aligned starts;
  * outputs are [B, n, 1] so the [TX, 1] running carries store directly;
  * argmax = min-index-over-maximal-set (first-index tie-break, equal to
    jnp.argmax), via 2D broadcasted_iota.

Exactness: same value formula (3 - ||x-y|| - price), same first-index
argmax tie-break, and the same "exclude only the argmax column" second-
best as the XLA path; the chunk merge keeps the earlier chunk on ties
(strict >), preserving first-index semantics globally.

Reference: loss_functions/emd/emd_cuda.cu:95-179 (Bid kernel: shared-
memory tiled best/second-best search with price).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TX = 256       # source rows per grid cell (sublane dim)
CCHUNK = 2048  # target columns per inner step ([TX, CCHUNK] f32 = 2 MB)
_NEG = -1e30  # python scalar: jnp constants would be captured consts


def _bid_kernel(x1_ref, x2t_ref, price_ref, bid_ref, best_ref, better_ref,
                *, m_pad: int):
    x = x1_ref[0]                       # [TX, 3] sources (sublane-major)
    xx = x[:, 0:1]
    xy = x[:, 1:2]
    xz = x[:, 2:3]                      # [TX, 1] each

    nchunks = m_pad // CCHUNK
    col_base = jax.lax.broadcasted_iota(jnp.int32, (TX, CCHUNK), 1)

    def chunk(j, carry):
        best, better, bid = carry       # [TX,1] f32, f32, int32
        off = j * CCHUNK
        yx = x2t_ref[0, 0:1, pl.ds(off, CCHUNK)]     # [1, C]
        yy = x2t_ref[0, 1:2, pl.ds(off, CCHUNK)]
        yz = x2t_ref[0, 2:3, pl.ds(off, CCHUNK)]
        pr = price_ref[0, 0:1, pl.ds(off, CCHUNK)]   # [1, C]
        d2 = (xx - yx) ** 2 + (xy - yy) ** 2 + (xz - yz) ** 2
        v = 3.0 - jnp.sqrt(jnp.maximum(d2, 0.0)) - pr        # [TX, C]
        cmax = jnp.max(v, axis=1, keepdims=True)             # [TX, 1]
        colid = col_base + off
        # first-index argmax within the chunk
        carg = jnp.min(jnp.where(v == cmax, colid, jnp.int32(m_pad)),
                       axis=1, keepdims=True)
        second = jnp.max(jnp.where(colid == carg, _NEG, v),
                         axis=1, keepdims=True)
        take = cmax > best              # strict: earlier chunk wins ties
        better = jnp.where(take, jnp.maximum(best, second),
                           jnp.maximum(better, cmax))
        bid = jnp.where(take, carg, bid)
        best = jnp.maximum(best, cmax)
        return best, better, bid

    init = (jnp.full((TX, 1), _NEG, jnp.float32),
            jnp.full((TX, 1), _NEG, jnp.float32),
            jnp.zeros((TX, 1), jnp.int32))
    best, better, bid = jax.lax.fori_loop(0, nchunks, chunk, init)
    bid_ref[0] = bid
    best_ref[0] = best
    better_ref[0] = better


@jax.jit
def bid_pallas(x1: jnp.ndarray, x2: jnp.ndarray, price: jnp.ndarray):
    """Batched bid phase. x1 [B,n,3], x2 [B,m,3], price [B,m] ->
    (bid [B,n] int32, best [B,n] f32, better [B,n] f32)."""
    B, n, _ = x1.shape
    m = x2.shape[1]
    n_pad = -(-n // TX) * TX
    m_pad = -(-m // CCHUNK) * CCHUNK
    x1p = jnp.pad(x1.astype(jnp.float32), ((0, 0), (0, n_pad - n), (0, 0)))
    x2t = jnp.pad(
        jnp.transpose(x2.astype(jnp.float32), (0, 2, 1)),
        ((0, 0), (0, 0), (0, m_pad - m)))
    # poison padded targets: +price inf -> v = -inf, never the best.
    # [B, 1, m_pad]: block second-to-last dims must divide 8 or equal
    # the array dim — a singleton middle dim satisfies that exactly.
    pricep = jnp.pad(price.astype(jnp.float32),
                     ((0, 0), (0, m_pad - m)),
                     constant_values=1e30)[:, None, :]

    grid = (B, n_pad // TX)
    bid, best, better = pl.pallas_call(
        functools.partial(_bid_kernel, m_pad=m_pad),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TX, 3), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, m_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m_pad), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TX, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TX, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TX, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, n_pad, 1), jnp.float32),
        ],
    )(x1p, x2t, pricep)
    return (bid[:, :n, 0], best[:, :n, 0], better[:, :n, 0])


def bid_supported(n: int, m: int) -> bool:
    """VMEM envelope: the x2t block is [3, m_pad] and price [1, m_pad] —
    fine to ~1M targets; the dominant per-cell buffer is the fixed
    [TX, CCHUNK] value chunk."""
    return n >= 1 and 1 <= m <= (1 << 20)
