"""Pallas TPU kernel for exact farthest-point sampling.

The XLA FPS loop (ops/fps.py) is correct but slow at metric scale: each
of the k=16384 sequential iterations re-streams the [B,N] min-distance
table and the [B,N,3] points through HBM, and measured ~1.5 ms/step at
N=165k (24.5 s for the batched GT downsample — the dominant cost of the
whole metric stage).  Points (2 MB/object) and the min-distance table
(0.66 MB) fit comfortably in VMEM, so this kernel runs the ENTIRE
sequential selection loop on-chip: one grid step per object, zero HBM
traffic per iteration.

Mosaic constraints shape the design (cf. render/splat_kernel.py):
  * no dynamic gathers on the tiled dims — the selected point's
    coordinates come from a masked sum (``where(flat_iota == idx, x,
    0).sum()``), and the per-step index store is a masked full-tile
    write into the [KR,128] output block;
  * 1D iota does not lower — all index math uses 2D broadcasted_iota;
  * padding rows (N -> R*128) are poisoned with min_d = -1 at init:
    ``min(min_d, d>=0)`` keeps them at -1 forever, so the argmax can
    never select one and the hot loop needs no mask.

Exactness: identical update math and the same lowest-index tie-break as
the XLA path (argmax picks the first maximum; here the flat-index min
over the maximal set), so the selected sequence matches fps_indices.

Reference: fpsample.fps_sampling calls in /root/reference/main.py:21-22,
DepthPrompting.py:88-90, reg_xyz.py:215.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM working set is ~5 arrays of [R,128] f32; stay well under the
# ~16 MB budget (N = 1.5M -> R = 11719 -> ~6 MB/array would not).
MAX_POINTS = 1 << 20


def _kernel(mind0_ref, xyz_ref, out_ref, mind_scr, *, k: int, start: int):
    R = mind0_ref.shape[0]
    KR = out_ref.shape[1]
    x = xyz_ref[0, 0]
    y = xyz_ref[0, 1]
    z = xyz_ref[0, 2]
    flat = (jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1))
    oflat = (jax.lax.broadcasted_iota(jnp.int32, (KR, 128), 0) * 128
             + jax.lax.broadcasted_iota(jnp.int32, (KR, 128), 1))
    sentinel = jnp.int32(R * 128)

    mind_scr[:] = mind0_ref[:]
    out_ref[0] = jnp.where(oflat == 0, jnp.int32(start),
                           jnp.zeros((KR, 128), jnp.int32))
    sel0 = flat == start
    sx = jnp.sum(jnp.where(sel0, x, 0.0))
    sy = jnp.sum(jnp.where(sel0, y, 0.0))
    sz = jnp.sum(jnp.where(sel0, z, 0.0))

    def body(i, carry):
        sx, sy, sz = carry
        d = (x - sx) ** 2 + (y - sy) ** 2 + (z - sz) ** 2
        md = jnp.minimum(mind_scr[:], d)
        mind_scr[:] = md
        m = jnp.max(md)
        idx = jnp.min(jnp.where(md == m, flat, sentinel))
        out_ref[0] = jnp.where(oflat == i, idx, out_ref[0])
        sel = flat == idx
        return (jnp.sum(jnp.where(sel, x, 0.0)),
                jnp.sum(jnp.where(sel, y, 0.0)),
                jnp.sum(jnp.where(sel, z, 0.0)))

    jax.lax.fori_loop(1, k, body, (sx, sy, sz))


@functools.partial(jax.jit, static_argnames=("k", "start"))
def fps_pallas_batched(pts: jnp.ndarray, k: int,
                       start: int = 0) -> jnp.ndarray:
    """Exact FPS indices for a batch. pts [B,N,3] -> [B,k] int32."""
    B, N, _ = pts.shape
    R = -(-N // 128)
    KR = -(-k // 128)
    # [B,3,R,128] with the (R,128) pair minor; pad tail with zeros
    xyz = jnp.transpose(jnp.asarray(pts, jnp.float32), (0, 2, 1))
    xyz = jnp.pad(xyz, ((0, 0), (0, 0), (0, R * 128 - N)))
    xyz = xyz.reshape(B, 3, R, 128)
    # +inf for real points, -1 poison for padding (never selectable)
    flat = (jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1))
    mind0 = jnp.where(flat < N, jnp.inf, -1.0).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, k=k, start=start),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((R, 128), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, R, 128), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, KR, 128), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, KR, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((R, 128), jnp.float32)],
    )(mind0, xyz)
    return out.reshape(B, KR * 128)[:, :k]


def fps_supported(n: int, k: int) -> bool:
    """Whether the kernel handles this problem size (caller falls back
    to the XLA loop otherwise)."""
    return 1 < k < n <= MAX_POINTS
