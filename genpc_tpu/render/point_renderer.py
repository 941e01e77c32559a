"""Differentiable soft point-splat renderer (PyTorch3D Pulsar replacement).

The reference's 7-DoF pose optimizer renders point clouds with the Pulsar
sphere renderer: fixed camera at (0,0,3), focal 4.0, 224², gamma=1e-2,
world-space radii, black background (reference:
optim_registration/diff_obj_pose.py:108-134, 374-391, 419-436).

TPU-native design: each point projects to a continuous pixel location and
splats a Gaussian footprint over a static K×K window via scatter-add —
fully differentiable w.r.t. point positions (through both the footprint
weights and the depth compositing).  Depth compositing follows Pulsar's
exponential weighting exp(d̂/γ) (closer points dominate as γ→0), computed
stably in log space with a per-pixel scatter-max pass.  Gradients flow
through XLA scatter-add; there is no Python loop over points.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class RenderCamera:
    """Fixed pinhole camera for the pose-optimization renders.

    Matches the reference setup: eye on +z looking at the origin with +y up
    (pytorch3d look_at_view_transform(eye=(0,0,3))), focal length in NDC
    units (4.0), square image.
    """
    eye: jnp.ndarray          # [3]
    focal: float
    res: int
    znear: float = 1e-4
    zfar: float = 5.0

    def tree_flatten(self):
        return (self.eye,), (self.focal, self.res, self.znear, self.zfar)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(leaves[0], *aux)

    @classmethod
    def default(cls, render_size: int = 224, eye=(0.0, 0.0, 3.0),
                focal: float = 4.0) -> "RenderCamera":
        return cls(jnp.asarray(eye, jnp.float32), focal, render_size)


def _quantized_sums(idx: jnp.ndarray, vals: jnp.ndarray, npix: int
                    ) -> jnp.ndarray:
    """Per-pixel-scaled fixed-point scatter-add: bitwise deterministic.

    TPU scatter-add accumulates duplicate float indices in a
    nondeterministic order; over a 200-step Adam trajectory the float
    noise amplifies into a ±1 CD×100 registration wobble (round-1
    STATUS).  INTEGER addition is exactly associative and commutative,
    so an int scatter-add is order-independent.  A global fixed-point
    scale cannot give the near-empty "splat tail" pixels (total weight
    ~1e-8) relative precision, so each pixel first gets its own scale:
    a scatter-MAX (fp max is associative — also deterministic) finds the
    largest contribution per pixel, every element is quantized RELATIVE
    to its pixel's max with two fixed-point words (main 2^15 + residual
    2^12), and the int sums are rescaled back.  Per-pixel error is
    ≤ n·2⁻²⁸ RELATIVE to the pixel's own magnitude (~2e-7 at 50
    contributions) for every pixel, bright or near-empty.  Cost: one
    extra scatter-max + gather over the nondeterministic path (a
    sorted-segment-scan alternative was 10× slower at run time and took
    minutes to compile).

    Envelope: vals ≥ 0 with each row bounded by its pixel's max over
    the LAST channel (here: w·rgb ≤ w); ≤ 2¹⁶ contributions per pixel
    before int32 overflow.  idx in [0, npix] (npix = dummy slot);
    returns [npix+1, ...] float32 sums.
    """
    s1 = jnp.float32(32768.0)       # 2^15 main word
    s2 = jnp.float32(4096.0)        # 2^12 residual word
    v = vals.astype(jnp.float32)
    w = v[..., -1]                  # per-element bound (the splat weight)
    pmax = jnp.zeros((npix + 1,), jnp.float32).at[idx].max(w, mode="drop")
    scale = jnp.maximum(pmax[idx], jnp.float32(1e-30))[:, None]
    u = v / scale                   # every channel ≤ 1
    q1 = jnp.round(u * s1)          # exact: u*s1 ≤ 2^15 < 2^24
    q2 = jnp.round((u * s1 - q1) * s2)
    # one fused scatter over both words (scatter cost on TPU is the op
    # count, not the update width)
    c = vals.shape[-1]
    q = jnp.concatenate([q1, q2], axis=-1).astype(jnp.int32)
    acc = jnp.zeros((npix + 1, 2 * c), jnp.int32).at[idx].add(
        q, mode="drop")
    a1, a2 = acc[:, :c], acc[:, c:]
    sums = (a1.astype(jnp.float32) + a2.astype(jnp.float32) / s2) / s1
    return sums * pmax[:, None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _segment_accumulate(idx, vals, npix: int):
    """Deterministic per-index sum with the float scatter-add's VJP.

    The forward value is the quantized integer accumulation
    (_quantized_sums); the gradient is exactly scatter-add's: gather the
    output cotangent at each element's index (the VJP of a sum does not
    depend on forward values, so it is both exact and deterministic).
    """
    return _quantized_sums(idx, vals, npix)


def _segment_accumulate_fwd(idx, vals, npix: int):
    return _quantized_sums(idx, vals, npix), idx


def _segment_accumulate_bwd(npix, idx, g):
    import numpy as np
    return (np.zeros(idx.shape, jax.dtypes.float0), g[idx])


_segment_accumulate.defvjp(_segment_accumulate_fwd, _segment_accumulate_bwd)


def _project_attrs(points, radius, camera, footprint: int):
    """Shared projection: continuous pixel centers + splat parameters."""
    res = camera.res
    pts = jnp.asarray(points, jnp.float32)
    rad = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (pts.shape[0],))

    # camera at eye looking at origin, up +y  (x right, y up, z toward cam)
    depth = jnp.maximum(camera.eye[2] - pts[:, 2], camera.znear)
    half = res / 2.0
    px = (pts[:, 0] * camera.focal / depth) * half + half - 0.5
    py = (-pts[:, 1] * camera.focal / depth) * half + half - 0.5  # +y is up

    # pixel-space splat radius; clamp into [0.3, footprint]
    rad_pix = jnp.clip(rad * camera.focal / depth * half, 0.3,
                       float(footprint))
    sigma2 = (rad_pix * 0.6) ** 2

    # Pulsar-style depth weight, normalized to [0,1] (1 = closest)
    dn = jnp.clip((camera.zfar - depth) / (camera.zfar - camera.znear),
                  0.0, 1.0)
    in_front = depth > camera.znear
    return px, py, dn, sigma2, in_front


def _build_table(px, py, dn, sigma2, cols, in_front, res: int, f: int,
                 slots: int):
    """Per-pixel slot table: ([S,CH,H,W] padded table, keep mask [N]).

    Points scatter ONE attribute record each into their center pixel's
    next free slot (stable-sort rank; single-writer set — no
    accumulation race).  Out-of-image centers are clamped for storage
    (true window membership is re-checked at assembly).  keep marks
    points that landed in the table (in front, rank < slots).
    """
    npix = res * res
    n = px.shape[0]
    ix = jnp.floor(px).astype(jnp.int32)
    iy = jnp.floor(py).astype(jnp.int32)
    ixc = jnp.clip(ix, 0, res - 1)
    iyc = jnp.clip(iy, 0, res - 1)
    cpix = jnp.where(in_front, iyc * res + ixc, npix)
    order = jnp.argsort(cpix)                    # stable
    cs = cpix[order]
    ar = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones(1, bool), cs[1:] != cs[:-1]])
    rank = ar - jax.lax.cummax(jnp.where(first, ar, 0))
    valid = (cs < npix) & (rank < slots)
    # slot-major flat index so the reshape to [CH,S,res,res] needs no
    # transpose; channel/slot dims LEADING keeps the (res,res) dims
    # minor, which tiles cleanly as T(8,128) (a trailing [S,CH] pair
    # pads ~17x)
    slot = jnp.where(valid, rank * npix + cs, slots * npix)

    # channels: px py dn sigma2 r g b — sigma2 > 0 doubles as presence
    # (real points have sigma2 >= (0.3*0.6)^2; empty slots are zero)
    attrs = jnp.stack([px, py, dn, sigma2, cols[:, 0], cols[:, 1],
                       cols[:, 2]], axis=0)[:, order]
    table = jnp.zeros((7, slots * npix + 1), jnp.float32).at[:, slot].set(
        jnp.where(valid[None, :], attrs, 0.0), mode="drop")
    T = table[:, :slots * npix].reshape(7, slots, res, res)
    Tp = jnp.pad(T, ((0, 0), (0, 0), (f, f), (f, f))).transpose(1, 0, 2, 3)
    keep = jnp.zeros((n,), bool).at[order].set(valid)
    # each point's flat table position in ORIGINAL point order (sentinel
    # slots*npix for dropped points) — the dense backward gathers
    # per-point gradients from the gradient table at these positions
    slot_orig = jnp.full((n,), slots * npix, jnp.int32).at[order].set(
        slot.astype(jnp.int32))
    return Tp, keep, slot_orig    # Tp: [S, CH, H, W]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _slots_pallas(px, py, dn, sigma2, cols, in_front, res: int, f: int,
                  slots: int, gamma: float):
    """Pallas-assembled slot render: attrs -> (acc [3,r,r], wacc [r,r]).

    Forward = slot table + the Pallas tile kernel
    (render/splat_kernel.py).  Backward = point-centric XLA gathers:
    each point reads the output cotangents over its (2f+1)² window and
    re-derives its weight chain — all gathers (the fast TPU direction;
    scatter with computed indices serializes, and a backward Pallas
    kernel hung the Mosaic compiler).
    """
    (acc, wacc), _ = _slots_pallas_fwd(px, py, dn, sigma2, cols, in_front,
                                       res, f, slots, gamma)
    return acc, wacc


def _slots_pallas_fwd(px, py, dn, sigma2, cols, in_front, res, f, slots,
                      gamma):
    from genpc_tpu.render.splat_kernel import assemble
    Tp, keep, slot_orig = _build_table(px, py, dn, sigma2, cols, in_front,
                                       res, f, slots)
    (acc, wacc), dmax = assemble(Tp[None], res, f, slots, gamma)
    out = (acc[0], wacc[0])
    return out, (Tp, slot_orig, dmax[0])


def _slots_pallas_bwd(res, f, slots, gamma, resids, cots):
    """Dense backward: one Pallas pass computes the gradient TABLE
    (transpose of the forward's 25-slab accumulation, splat_kernel.
    assemble_bwd), then each point gathers its 7 per-entry gradients at
    its slot position — 7·N gathers instead of the old point-centric
    chain's ~8·K²·N (90 ms -> ~10 ms for the 52-render pose step)."""
    from genpc_tpu.render.splat_kernel import assemble_bwd
    Tp, slot_orig, dmax = resids
    g_acc, g_wacc = cots
    dT = assemble_bwd(Tp[None], (g_acc[None], g_wacc[None]), dmax[None],
                      res, f, slots, gamma)[0]       # [S,7,res,res]
    # flat slot-major layout matches slot_orig = rank*npix + pix; pad one
    # trailing zero entry for dropped points (sentinel slots*npix)
    flat = jnp.concatenate(
        [dT.transpose(1, 0, 2, 3).reshape(7, -1),
         jnp.zeros((7, 1), jnp.float32)], axis=1)
    d_px = flat[0][slot_orig]
    d_py = flat[1][slot_orig]
    d_dn = flat[2][slot_orig]
    d_s2 = flat[3][slot_orig]
    d_cols = jnp.stack([flat[4][slot_orig], flat[5][slot_orig],
                        flat[6][slot_orig]], axis=-1)
    import numpy as np
    d_infront = np.zeros(slot_orig.shape, dtype=jax.dtypes.float0)
    return d_px, d_py, d_dn, d_s2, d_cols, d_infront


_slots_pallas.defvjp(_slots_pallas_fwd, _slots_pallas_bwd)


def _render_slots(points, colors, radius, camera, gamma: float,
                  footprint: int, slots: int) -> jnp.ndarray:
    """Slotted center-scatter + dense shifted assembly (TPU default).

    XLA:TPU lowers scatter-add with in-program-computed indices through a
    SERIALIZED emitter (~20M updates/s measured — 300× below the
    vectorized path), so the classic K²N footprint scatter dominates the
    pose-optimization step.  This formulation scatters only one
    attribute record per POINT into per-pixel slots (N tiny updates),
    then assembles the image with K² statically-shifted dense passes
    over the [res,res,S] table — pure slices/elementwise, no large
    scatter anywhere (forward or VJP).  Accumulation order is fixed by
    the program (offsets × slots), so the result is bitwise
    deterministic without quantization.

    Points sharing a center pixel occupy successive slots (stable-sort
    rank); beyond `slots` they are dropped — pose inputs are 0.02-voxel
    downsamples (~3px spacing at 224²), which keeps occupancy ≤2.
    """
    res = camera.res
    f = footprint
    cols = jnp.asarray(colors, jnp.float32)
    px, py, dn, sigma2, in_front = _project_attrs(points, radius, camera,
                                                  footprint)

    from genpc_tpu.runtime import use_pallas
    from genpc_tpu.render.splat_kernel import pick_panel, pick_strip
    bg_w = jnp.exp(jnp.float32(-1.0) / gamma) + 1e-8
    if (use_pallas() and pick_strip(res) is not None
            and pick_panel(res, f) is not None):
        acc, wacc = _slots_pallas(px, py, dn, sigma2, cols, in_front,
                                  res, f, slots, float(gamma))
        img = acc / (wacc + bg_w)[None]
        return jnp.moveaxis(img, 0, -1)

    Tp, _, _ = _build_table(px, py, dn, sigma2, cols, in_front, res, f,
                            slots)

    qx = jnp.arange(res, dtype=jnp.float32)[None, None, :]
    qy = jnp.arange(res, dtype=jnp.float32)[None, :, None]
    offs = [(oy, ox) for oy in range(-f, f + 1) for ox in range(-f, f + 1)]

    def contrib(tp, oy, ox, with_depth):
        # Sh[:, :, q] = T[:, :, q - (oy,ox)]: points centered (oy,ox)
        # away from pixel q
        sh = jax.lax.dynamic_slice(tp, (0, 0, f - oy, f - ox),
                                   (slots, 7, res, res))
        pxs, pys = sh[:, 0], sh[:, 1]
        dns, s2 = sh[:, 2], sh[:, 3]
        col = sh[:, 4:7]
        pres = s2 > 0
        ixf = jnp.floor(pxs)
        iyf = jnp.floor(pys)
        win = ((jnp.abs(qx - ixf) <= f) & (jnp.abs(qy - iyf) <= f))
        if with_depth is None:
            # depth pass: max dn over present in-image centers in window
            center_in = ((ixf >= 0) & (ixf <= res - 1)
                         & (iyf >= 0) & (iyf <= res - 1))
            okm = pres & center_in & win
            return jnp.where(okm, dns, -1.0).max(0)
        d2 = (pxs - qx) ** 2 + (pys - qy) ** 2
        w_s = jnp.exp(-d2 / jnp.maximum(2.0 * s2, 1e-12))
        ok = pres & win & (w_s > 1e-4)
        expo = jnp.minimum((dns - with_depth[None]) / gamma, 0.0)
        w = jnp.where(ok, w_s * jnp.exp(expo), 0.0)
        return (w[:, None] * col).sum(0), w.sum(0)

    # pass 1: per-pixel depth max (≡ scatter path's center scatter-max +
    # (2f+1)² dilation); carries no gradient
    Tsg = jax.lax.stop_gradient(Tp)
    dmax = jnp.full((res, res), -1.0, jnp.float32)
    for oy, ox in offs:
        dmax = jnp.maximum(dmax, contrib(Tsg, oy, ox, None))
    dmax = jax.lax.stop_gradient(dmax)

    # pass 2: fixed-order weighted accumulation; each offset is
    # checkpointed so the VJP recomputes its weights from the table
    # instead of saving 25 [S,res,res] residual stacks
    acc = jnp.zeros((3, res, res), jnp.float32)
    wacc = jnp.zeros((res, res), jnp.float32)
    for oy, ox in offs:
        a, ww = jax.checkpoint(
            functools.partial(contrib, oy=oy, ox=ox, with_depth=dmax)
        )(Tp)
        acc = acc + a
        wacc = wacc + ww

    img = acc / (wacc + bg_w)[None]
    return jnp.moveaxis(img, 0, -1)


def _render_scatter(points, colors, radius, camera, gamma: float,
                    footprint: int, deterministic: bool) -> jnp.ndarray:
    """Footprint scatter-add renderer (reference formulation)."""
    res = camera.res
    cols = jnp.asarray(colors, jnp.float32)
    px, py, dn, sigma2, in_front = _project_attrs(points, radius, camera,
                                                  footprint)
    ix = jnp.floor(px).astype(jnp.int32)
    iy = jnp.floor(py).astype(jnp.int32)
    npix = res * res
    n = px.shape[0]
    K = 2 * footprint + 1

    # pass 1: per-pixel depth max = ONE center-pixel scatter-max followed
    # by a (2f+1)² max-pool dilation — exactly the full-footprint
    # scatter-max (every point's footprint reaches at most f pixels from
    # its center), but the dilation is a dense reduce_window instead of
    # K² scatters
    center_ok = in_front & (ix >= 0) & (ix < res) & (iy >= 0) & (iy < res)
    cpix = jnp.where(center_ok, iy * res + ix, npix)
    kwin = 2 * footprint + 1

    def _depth_max(dn_sg):
        d0 = jnp.full((npix + 1,), -1.0, jnp.float32).at[cpix].max(
            jnp.where(center_ok, dn_sg, -1.0), mode="drop")
        img = jax.lax.reduce_window(d0[:npix].reshape(res, res), -1.0,
                                    jax.lax.max, (kwin, kwin), (1, 1),
                                    "SAME")
        return jnp.concatenate([img.reshape(-1), d0[npix:]])

    # dmax only normalizes the softmax; it carries no gradient
    dmax = _depth_max(jax.lax.stop_gradient(dn))
    dmax = jax.lax.stop_gradient(dmax)

    # pass 2: ONE fused scatter-add over all K² offsets (TPU scatter cost
    # is dominated by the op count, not the update size)
    dys = jnp.arange(-footprint, footprint + 1, dtype=jnp.int32)
    offs_y = jnp.repeat(dys, K)[:, None]      # [K²,1]
    offs_x = jnp.tile(dys, K)[:, None]
    cy = iy[None, :] + offs_y                 # [K²,N]
    cx = ix[None, :] + offs_x
    d2 = ((px[None, :] - cx.astype(jnp.float32)) ** 2
          + (py[None, :] - cy.astype(jnp.float32)) ** 2)
    w_s = jnp.exp(-d2 / (2.0 * sigma2)[None, :])
    ok = ((cx >= 0) & (cx < res) & (cy >= 0) & (cy < res)
          & in_front[None, :] & (w_s > 1e-4))
    idx2d = jnp.where(ok, cy * res + cx, npix)
    # dn <= dmax on center-covered pixels, so clamping to <= 0 is exact
    # there; it also keeps dropped offsets (dummy slot, dmax=-1) finite
    expo = jnp.minimum(
        (dn[None, :] - jax.lax.stop_gradient(dmax[idx2d])) / gamma, 0.0)
    w = jnp.where(ok, w_s * jnp.exp(expo), 0.0).reshape(-1)
    idx = idx2d.reshape(-1)
    cols_t = jnp.broadcast_to(cols[None], (K * K, n, 3)).reshape(-1, 3)
    if deterministic:
        packed = jnp.concatenate([w[:, None] * cols_t, w[:, None]], axis=-1)
        seg = _segment_accumulate(idx, packed, npix)
        acc, wacc = seg[:, :3], seg[:, 3]
    else:
        acc = jnp.zeros((npix + 1, 3), jnp.float32).at[idx].add(
            w[:, None] * cols_t, mode="drop")
        wacc = jnp.zeros((npix + 1,), jnp.float32).at[idx].add(w,
                                                              mode="drop")

    # background weight: a fixed unit weight at dn=0 (normalized vs dmax=1)
    bg_w = jnp.exp(jnp.float32(-1.0) / gamma) + 1e-8
    img = acc[:npix] / (wacc[:npix] + bg_w)[:, None]
    return img.reshape(res, res, 3)


@functools.partial(jax.jit, static_argnames=("gamma", "footprint",
                                             "deterministic", "method",
                                             "slots"))
def render_points(points: jnp.ndarray, colors: jnp.ndarray,
                  radius, camera: RenderCamera, gamma: float = 1e-2,
                  footprint: int = 3, deterministic: bool = False,
                  method: str = "scatter", slots: int = 6) -> jnp.ndarray:
    """Render [N,3] points with [N,3] colors -> [res,res,3] image.

    radius: world-space splat radius (scalar or [N]).
    footprint: half-width of the splat window in pixels (K = 2f+1).
    method: 'scatter' (default) — the classic K²N footprint scatter
      (reference formulation), with `deterministic` selecting
      fixed-point integer accumulation.  'slots' — slotted
      center-scatter + dense shifted assembly, backed by the Pallas
      tile kernel on TPU (render/splat_kernel.py): bitwise
      deterministic by construction and ~100x faster forward; still
      being validated end-to-end before becoming the default.
    """
    if method == "slots":
        return _render_slots(points, colors, radius, camera, gamma,
                             footprint, slots)
    return _render_scatter(points, colors, radius, camera, gamma,
                           footprint, deterministic)


def luminance(img: jnp.ndarray) -> jnp.ndarray:
    """Rec.601 luminance (reference: diff_obj_pose.py:177)."""
    return (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])


def soft_mask(img: jnp.ndarray, threshold: float = 0.1, tau: float = 0.05
              ) -> jnp.ndarray:
    """Differentiable occupancy mask (reference: diff_obj_pose.py:258-275)."""
    return jax.nn.sigmoid((luminance(img) - threshold) / tau)


def hard_mask(img: jnp.ndarray, threshold: float = 0.1) -> jnp.ndarray:
    """Hard-threshold mask (reference: diff_obj_pose.py:166-178)."""
    return (luminance(img) > threshold).astype(jnp.float32)
