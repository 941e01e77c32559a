"""Pallas TPU kernel for the slotted point-splat assembly.

The differentiable renderer's accumulation is a 25-offset window sum
over a per-pixel slot table (see point_renderer._render_slots for the
formulation and why scatter-add is off the table: XLA:TPU serializes
scatters with computed indices).  The pure-XLA slots path re-reads the
table from HBM once per offset and its VJP materializes 25 full-table
gradient pads; this kernel runs all offsets on-chip over VMEM-resident
strips.

Mosaic constraints shape the design:
  * dynamic slice starts on the two minor (tiled) dims must be
    8/128-aligned, so the 25 offsets are statically unrolled;
  * the per-step working set must fit ~16 MB VMEM, so each grid step
    handles one (instance, slot, image strip); the strip halo problem
    (offsets read ±f rows) is solved by materializing OVERLAPPED strips
    outside the kernel (~7% extra HBM) rather than overlapping blocks;
  * accumulation order is fixed (slots × offsets per strip), so the
    result is bitwise deterministic.

Table layout [B,S,CH,H,W] with the image dims minor ((8,128) tiling
pads ~1.1x; a trailing [S,CH] pair pads ~17x).  Channels: px py dn
sigma2 r g b — sigma2 > 0 doubles as the presence flag.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CH = 7          # px py dn sigma2 r g b


def pick_strip(res: int):
    """Largest strip height <= 56 that divides res and is a multiple of
    8; None if res has no such divisor (caller falls back to XLA)."""
    for ns in range(max(1, res // 56), res + 1):
        if res % ns == 0 and (res // ns) % 8 == 0:
            return res // ns
    return None


def pick_panel(res: int, f: int):
    """Largest panel width dividing res with panel+2f <= 128: every
    in-kernel column slice then stays inside one 128-lane tile (observed
    Mosaic miscompile: static unaligned lane slices across lane-tile
    boundaries return wrong data; width <= 128 is the safe regime)."""
    for np_ in range(1, res + 1):
        if res % np_ == 0 and res // np_ + 2 * f <= 128:
            return res // np_
    return None


def _iota2(h: int, w: int):
    qx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    qy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    return qx.astype(jnp.float32), qy.astype(jnp.float32)


def _tiles(table: jnp.ndarray, res: int, f: int, strip: int,
           panel: int) -> jnp.ndarray:
    """[B,S,CH,H,W] -> overlapped tiles [B,S,NY*NX,CH,strip+2f,panel+2f]."""
    ny, nx = res // strip, res // panel
    parts = []
    for i in range(ny):
        for j in range(nx):
            parts.append(table[:, :, None, :,
                               i * strip:i * strip + strip + 2 * f,
                               j * panel:j * panel + panel + 2 * f])
    return jnp.concatenate(parts, axis=2)


def _fwd_kernel(t_ref, o_ref, *, res: int, f: int, gamma: float,
                strip: int, panel: int):
    """Grid (B, 2, S, NY*NX); t block [1,1,1,CH,strip+2f,panel+2f];
    o block [1,5,1,strip,panel].

    The output tile is revisited across (phase, slot) steps: phase 0
    folds each slot slab into the dmax channel, phase 1 adds the
    weighted contributions.
    """
    st = pl.program_id(1)
    ph = pl.program_id(2)
    s = pl.program_id(3)
    nx = res // panel
    qx, qy = _iota2(strip, panel)
    qy = qy + ((st // nx) * strip).astype(jnp.float32)
    qx = qx + ((st % nx) * panel).astype(jnp.float32)

    def slab(c, oy, ox):
        return t_ref[0, 0, 0, c, f - oy:f - oy + strip,
                     f - ox:f - ox + panel]

    def window(px, py):
        ixf = jnp.floor(px)
        iyf = jnp.floor(py)
        center_in = ((ixf >= 0) & (ixf <= res - 1)
                     & (iyf >= 0) & (iyf <= res - 1))
        win = ((jnp.abs(qx - ixf) <= f) & (jnp.abs(qy - iyf) <= f))
        return center_in, win

    offs = [(oy, ox) for oy in range(-f, f + 1) for ox in range(-f, f + 1)]

    @pl.when((ph == 0) & (s == 0))
    def _():
        z = jnp.zeros((strip, panel), jnp.float32)
        for c in range(4):
            o_ref[0, c, 0] = z
        o_ref[0, 4, 0] = jnp.full((strip, panel), -1.0, jnp.float32)

    @pl.when(ph == 0)
    def _():
        dmax = o_ref[0, 4, 0]
        for oy, ox in offs:
            px = slab(0, oy, ox)
            py = slab(1, oy, ox)
            dn = slab(2, oy, ox)
            pres = slab(3, oy, ox) > 0
            center_in, win = window(px, py)
            dmax = jnp.maximum(
                dmax, jnp.where(pres & center_in & win, dn, -1.0))
        o_ref[0, 4, 0] = dmax

    @pl.when(ph == 1)
    def _():
        dmax = o_ref[0, 4, 0]
        acc_r = o_ref[0, 0, 0]
        acc_g = o_ref[0, 1, 0]
        acc_b = o_ref[0, 2, 0]
        wacc = o_ref[0, 3, 0]
        for oy, ox in offs:
            px = slab(0, oy, ox)
            py = slab(1, oy, ox)
            dn = slab(2, oy, ox)
            s2 = slab(3, oy, ox)
            pres = s2 > 0
            center_in, win = window(px, py)
            d2 = (px - qx) ** 2 + (py - qy) ** 2
            w_s = jnp.exp(-d2 / jnp.maximum(2.0 * s2, 1e-12))
            ok = pres & win & (w_s > 1e-4)
            expo = jnp.minimum((dn - dmax) / gamma, 0.0)
            w = jnp.where(ok, w_s * jnp.exp(expo), 0.0)
            acc_r = acc_r + w * slab(4, oy, ox)
            acc_g = acc_g + w * slab(5, oy, ox)
            acc_b = acc_b + w * slab(6, oy, ox)
            wacc = wacc + w
        o_ref[0, 0, 0] = acc_r
        o_ref[0, 1, 0] = acc_g
        o_ref[0, 2, 0] = acc_b
        o_ref[0, 3, 0] = wacc


def _fwd_call(tiles: jnp.ndarray, res: int, f: int, gamma: float,
              strip: int, panel: int):
    B, S, NS = tiles.shape[0], tiles.shape[1], tiles.shape[2]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, res=res, f=f, gamma=gamma,
                          strip=strip, panel=panel),
        # the output tile's visits must be CONSECUTIVE in grid order for
        # Pallas's revisit (read-modify-write) semantics, so the tile dim
        # sits outside the (phase, slot) dims
        grid=(B, NS, 2, S),
        in_specs=[pl.BlockSpec((1, 1, 1, CH, strip + 2 * f, panel + 2 * f),
                               lambda b, st, ph, s: (b, s, st, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 5, 1, strip, panel),
                               lambda b, st, ph, s: (b, 0, st, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 5, NS, strip, panel),
                                       jnp.float32),
    )(tiles)


def assemble(table, res: int, f: int, slots: int, gamma: float):
    """Batched slot-table assembly: [B,S,CH,H,W] -> ((acc [B,3,r,r],
    wacc [B,r,r]), dmax [B,r,r]).  NOT differentiable through the
    kernel — point_renderer wraps it in a custom_vjp whose backward is
    point-centric XLA gathers (the fast TPU direction; a backward
    Pallas kernel sent the Mosaic compiler into a loop)."""
    return _assemble_impl(table, res, f, gamma)


def _assemble_impl(table, res, f, gamma):
    strip = pick_strip(res)
    panel = pick_panel(res, f)
    ny, nx = res // strip, res // panel
    tiles = _tiles(table, res, f, strip, panel)
    o = _fwd_call(tiles, res, f, gamma, strip, panel)
    # [B,5,NY*NX,strip,panel] -> [B,5,res,res]
    B = o.shape[0]
    o = o.reshape(B, 5, ny, nx, strip, panel).transpose(0, 1, 2, 4, 3, 5)
    o = o.reshape(B, 5, res, res)
    return (o[:, :3], o[:, 3]), o[:, 4]



# ------------------------------------------------------------ backward

def _bwd_kernel(c_ref, t_ref, o_ref, *, res: int, f: int, gamma: float,
                strip: int, panel: int):
    """Grid (B, NS, S); c block [1,1,5,strip+2f,panel+2f] = cotangents
    (g_r, g_g, g_b, g_wacc) + dmax, overlapped like the forward input
    tiles; t block [1,1,1,CH,strip,panel] = INTERIOR table entries;
    o block [1,1,1,7,strip,panel] = per-entry gradients
    (d_px, d_py, d_dn, d_sigma2, d_r, d_g, d_b).

    Transpose of the forward accumulation: the entry stored at pixel q
    contributed to output pixels q+(oy,ox), so its gradient reads the
    cotangent slabs at those offsets — same statically-unrolled 25-slab
    structure as _fwd_kernel, output written once per grid step (no
    revisits, no phases).  The weight-chain math replicates
    point_renderer's gather backward exactly (incl. the 50/50 dmax-tie
    convention)."""
    st = pl.program_id(1)
    nx = res // panel
    qx, qy = _iota2(strip, panel)
    qy = qy + ((st // nx) * strip).astype(jnp.float32)
    qx = qx + ((st % nx) * panel).astype(jnp.float32)

    px = t_ref[0, 0, 0, 0]
    py = t_ref[0, 0, 0, 1]
    dn = t_ref[0, 0, 0, 2]
    s2 = t_ref[0, 0, 0, 3]
    cr = t_ref[0, 0, 0, 4]
    cg = t_ref[0, 0, 0, 5]
    cb = t_ref[0, 0, 0, 6]
    pres = s2 > 0
    ixf = jnp.floor(px)
    iyf = jnp.floor(py)
    s2c = jnp.maximum(2.0 * s2, 1e-12)

    z = jnp.zeros((strip, panel), jnp.float32)
    d_px, d_py, d_dn, d_s2 = z, z, z, z
    d_r, d_g, d_b = z, z, z

    def cot(c, oy, ox):
        return c_ref[0, 0, c, f + oy:f + oy + strip,
                     f + ox:f + ox + panel]

    for oy in range(-f, f + 1):
        for ox in range(-f, f + 1):
            gr = cot(0, oy, ox)
            gg = cot(1, oy, ox)
            gb = cot(2, oy, ox)
            gwa = cot(3, oy, ox)
            dmax = cot(4, oy, ox)
            qx2 = qx + ox
            qy2 = qy + oy
            inb = ((qx2 >= 0) & (qx2 <= res - 1)
                   & (qy2 >= 0) & (qy2 <= res - 1))
            win = ((jnp.abs(qx2 - ixf) <= f) & (jnp.abs(qy2 - iyf) <= f))
            d2 = (px - qx2) ** 2 + (py - qy2) ** 2
            w_s = jnp.exp(-d2 / s2c)
            ok = pres & inb & win & (w_s > 1e-4)
            expo_raw = (dn - dmax) / gamma
            e = jnp.exp(jnp.minimum(expo_raw, 0.0))
            w = jnp.where(ok, w_s * e, 0.0)
            gw = jnp.where(ok, gr * cr + gg * cg + gb * cb + gwa, 0.0)
            dw_s = gw * e
            dd2 = dw_s * w_s * (-1.0 / s2c)
            d_px = d_px + dd2 * 2.0 * (px - qx2)
            d_py = d_py + dd2 * 2.0 * (py - qy2)
            tie_w = jnp.where(expo_raw < 0.0, 1.0,
                              jnp.where(expo_raw == 0.0, 0.5, 0.0))
            d_dn = d_dn + tie_w * gw * w_s * e / gamma
            d_s2 = d_s2 + dw_s * w_s * (d2 / (s2c * s2c)) * 2.0
            d_r = d_r + w * gr
            d_g = d_g + w * gg
            d_b = d_b + w * gb

    o_ref[0, 0, 0, 0] = d_px
    o_ref[0, 0, 0, 1] = d_py
    o_ref[0, 0, 0, 2] = d_dn
    o_ref[0, 0, 0, 3] = d_s2
    o_ref[0, 0, 0, 4] = d_r
    o_ref[0, 0, 0, 5] = d_g
    o_ref[0, 0, 0, 6] = d_b


def assemble_bwd(table, cots, dmax, res: int, f: int, slots: int,
                 gamma: float) -> jnp.ndarray:
    """Dense gradient table: d L / d(table entries).

    table: padded [B,S,CH,H+2f,W+2f] (the _build_table output);
    cots: (g_acc [B,3,res,res], g_wacc [B,res,res]); dmax [B,res,res].
    Returns [B,S,7,res,res] per-entry gradients in interior pixel
    layout (d_px, d_py, d_dn, d_sigma2, d_r, d_g, d_b)."""
    g_acc, g_wacc = cots
    strip = pick_strip(res)
    panel = pick_panel(res, f)
    ny, nx = res // strip, res // panel
    B, S = table.shape[0], table.shape[1]
    c = jnp.concatenate([g_acc, g_wacc[:, None], dmax[:, None]],
                        axis=1)                       # [B,5,res,res]
    c = jnp.pad(c, ((0, 0), (0, 0), (f, f), (f, f)))
    ctiles = _tiles(c[:, None], res, f, strip, panel)[:, 0]  # [B,NS,5,...]
    interior = table[:, :, :, f:-f, f:-f]
    ttiles = _tiles(interior, res, 0, strip, panel)    # [B,S,NS,CH,...]
    NS = ny * nx
    o = pl.pallas_call(
        functools.partial(_bwd_kernel, res=res, f=f, gamma=gamma,
                          strip=strip, panel=panel),
        grid=(B, NS, S),
        in_specs=[
            pl.BlockSpec((1, 1, 5, strip + 2 * f, panel + 2 * f),
                         lambda b, st, s: (b, st, 0, 0, 0)),
            pl.BlockSpec((1, 1, 1, CH, strip, panel),
                         lambda b, st, s: (b, s, st, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, 7, strip, panel),
                               lambda b, st, s: (b, s, st, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, S, NS, 7, strip, panel),
                                       jnp.float32),
    )(ctiles, ttiles)
    o = o.reshape(B, S, ny, nx, 7, strip, panel)
    o = o.transpose(0, 1, 4, 2, 5, 3, 6).reshape(B, S, 7, res, res)
    return o
