"""Point-to-point ICP and the coarse/fine scale searches, jit + vmap.

Replaces the reference's open3d ICP calls and its two scale-search loops:
  * ``icp`` ≡ o3d.pipelines.registration.registration_icp with
    TransformationEstimationPointToPoint (reference: reg_xyz.py:18-20,28-37)
    — correspondence = NN within max_correspondence_distance, update via
    weighted Kabsch/SVD, 30 iterations (o3d's default criterion).
  * ``icp_with_scaling`` ≡ reg_xyz.py:24-38 (ICP, inject isotropic scale
    into the init, ICP again).
  * ``coarse_scale_sweep`` ≡ the 11-scale loop reg_xyz.py:146-173, vmapped —
    all scales run as one batched program instead of a host loop.
  * ``iterative_scale_search`` ≡ the 10×10×10 per-axis grid reg_xyz.py:60-96
    (the reference's hottest CPU loop, ~1000 sequential deepcopy+ICP+CUDA
    chamfer round-trips), vmapped over the whole grid.

Parity notes: the reference *scores* each per-axis candidate by Chamfer on
the scaled-but-unregistered source (icp_with_scaling_xyz mutates the source
by the scale matrix only; the ICP result is saved but not applied before
scoring — reg_xyz.py:75-83).  We reproduce exactly that.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from genpc_tpu.ops.chamfer import _nn
from genpc_tpu.metrics.losses import chamfer_partial_l1


def kabsch(src: jnp.ndarray, tgt: jnp.ndarray, weights: jnp.ndarray
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted rigid alignment src->tgt: returns (R, t)."""
    w = weights / jnp.maximum(weights.sum(), 1e-12)
    ms = jnp.sum(src * w[:, None], axis=0)
    mt = jnp.sum(tgt * w[:, None], axis=0)
    H = (src - ms).T @ ((tgt - mt) * w[:, None])
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(d)
    R = Vt.T @ D @ U.T
    t = mt - R @ ms
    return R, t


@functools.partial(jax.jit, static_argnames=("iters",))
def icp(source: jnp.ndarray, target: jnp.ndarray,
        max_correspondence_distance: float,
        init_transform: jnp.ndarray | None = None,
        iters: int = 30) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """ICP source->target. Returns (T 4x4, fitness, inlier_rmse)."""
    src = jnp.asarray(source, jnp.float32)
    tgt = jnp.asarray(target, jnp.float32)
    T0 = jnp.eye(4, dtype=jnp.float32) if init_transform is None \
        else jnp.asarray(init_transform, jnp.float32)
    thresh2 = jnp.float32(max_correspondence_distance) ** 2

    def body(_, T):
        moved = src @ T[:3, :3].T + T[:3, 3]
        d2, idx = _nn(moved[None], tgt[None])
        d2, idx = d2[0], idx[0]
        w = (d2 <= thresh2).astype(jnp.float32)
        any_in = w.sum() > 0
        R, t = kabsch(moved, tgt[idx], jnp.where(any_in, w, jnp.ones_like(w)))
        dT = jnp.eye(4, dtype=jnp.float32).at[:3, :3].set(R).at[:3, 3].set(t)
        return jnp.where(any_in, dT @ T, T)

    T = jax.lax.fori_loop(0, iters, body, T0)
    moved = src @ T[:3, :3].T + T[:3, 3]
    d2, _ = _nn(moved[None], tgt[None])
    inl = d2[0] <= thresh2
    fitness = inl.mean()
    rmse = jnp.sqrt(jnp.sum(jnp.where(inl, d2[0], 0.0))
                    / jnp.maximum(inl.sum(), 1))
    return T, fitness, rmse


def umeyama(src: jnp.ndarray, tgt: jnp.ndarray, weights: jnp.ndarray
            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Weighted similarity alignment src->tgt: returns (c, R, t) with
    x -> c·R·x + t (Umeyama 1991 closed form)."""
    w = weights / jnp.maximum(weights.sum(), 1e-12)
    ms = jnp.sum(src * w[:, None], axis=0)
    mt = jnp.sum(tgt * w[:, None], axis=0)
    xs = src - ms
    xt = tgt - mt
    H = xs.T @ (xt * w[:, None])
    U, D, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    S = jnp.array([1.0, 1.0, 1.0]).at[2].set(d)
    R = Vt.T @ jnp.diag(S) @ U.T
    var_s = jnp.sum((xs ** 2) * w[:, None])
    c = jnp.sum(D * S) / jnp.maximum(var_s, 1e-12)
    t = mt - c * (R @ ms)
    return c, R, t


@functools.partial(jax.jit, static_argnames=("iters",))
def similarity_icp(source: jnp.ndarray, target: jnp.ndarray,
                   max_correspondence_distance: float = 0.05,
                   iters: int = 30) -> jnp.ndarray:
    """ICP with per-iteration closed-form scale (Umeyama update).

    Used as the FINAL input-frame refinement after the reference's undo
    chain: the coarse/fine stages only sample scale on a grid (11
    isotropic values, then 10 steps/axis ≈ 4.4% resolution), so the
    returned alignment carries up to a few-percent residual scale error;
    one similarity ICP from the near-aligned start removes it.  No
    reference counterpart (reg_xyz.py stops after the grid) — this is a
    rebuild improvement, gated by cfg.final_icp_refine.

    Returns T 4x4 mapping source into target's frame (T[:3,:3] = c·R).
    """
    src = jnp.asarray(source, jnp.float32)
    tgt = jnp.asarray(target, jnp.float32)
    thresh2 = jnp.float32(max_correspondence_distance) ** 2

    def body(_, T):
        moved = src @ T[:3, :3].T + T[:3, 3]
        d2, idx = _nn(moved[None], tgt[None])
        d2, idx = d2[0], idx[0]
        w = (d2 <= thresh2).astype(jnp.float32)
        any_in = w.sum() > 2
        c, R, t = umeyama(moved, tgt[idx],
                          jnp.where(any_in, w, jnp.ones_like(w)))
        dT = (jnp.eye(4, dtype=jnp.float32)
              .at[:3, :3].set(c * R).at[:3, 3].set(t))
        return jnp.where(any_in, dT @ T, T)

    return jax.lax.fori_loop(0, iters, body,
                             jnp.eye(4, dtype=jnp.float32))


@functools.partial(jax.jit, static_argnames=("iters", "inner"))
def anisotropic_icp(source: jnp.ndarray, target: jnp.ndarray,
                    max_correspondence_distance: float = 0.05,
                    iters: int = 30, inner: int = 2) -> jnp.ndarray:
    """ICP with a per-axis scale model x -> R·diag(s)·x + t.

    The registration chain's residual on already-aligned inputs is not a
    similarity: the fine grid's anisotropic S is undone out of order
    (reference quirk, reg_xyz.py:194-199) and its candidates are scored
    on the UNREGISTERED scaled source (reg_xyz.py:75-83), so the net
    error composes to R1·diag·R2.  From a near-aligned start this
    alternating solver (Kabsch for R,t; per-axis least squares for s,
    clamped to ±25%) cancels the dominant part.

    Returns T 4x4 with T[:3,:3] = R·diag(s).
    """
    src = jnp.asarray(source, jnp.float32)
    tgt = jnp.asarray(target, jnp.float32)
    thresh2 = jnp.float32(max_correspondence_distance) ** 2

    def body(_, T):
        moved = src @ T[:3, :3].T + T[:3, 3]
        d2, idx = _nn(moved[None], tgt[None])
        d2, idx = d2[0], idx[0]
        w0 = (d2 <= thresh2).astype(jnp.float32)
        any_in = w0.sum() > 8
        w = jnp.where(any_in, w0, jnp.ones_like(w0))
        y = tgt[idx]

        def alternate(_, carry):
            R, s, t = carry
            # per-axis scale: min over s_k of || R diag(s) x + t - y ||
            # -> s_k = <x_k, (Rᵀ(y - t))_k> / <x_k, x_k> (weighted)
            yb = (y - t) @ R            # Rᵀ applied rowwise
            num = jnp.sum(w[:, None] * moved * yb, axis=0)
            den = jnp.sum(w[:, None] * moved * moved, axis=0)
            s = jnp.clip(num / jnp.maximum(den, 1e-12), 0.75, 1.25)
            # rigid part on the scaled points
            R, t = kabsch(moved * s[None, :], y, w)
            return R, s, t

        R0 = jnp.eye(3, dtype=jnp.float32)
        s0 = jnp.ones(3, jnp.float32)
        t0 = jnp.zeros(3, jnp.float32)
        R, s, t = jax.lax.fori_loop(0, inner, alternate, (R0, s0, t0))
        dT = (jnp.eye(4, dtype=jnp.float32)
              .at[:3, :3].set(R @ jnp.diag(s)).at[:3, 3].set(t))
        return jnp.where(any_in, dT @ T, T)

    return jax.lax.fori_loop(0, iters, body,
                             jnp.eye(4, dtype=jnp.float32))


@functools.partial(jax.jit, static_argnames=("iters",))
def affine_icp(source: jnp.ndarray, target: jnp.ndarray,
               max_correspondence_distance: float = 0.05,
               iters: int = 30) -> jnp.ndarray:
    """ICP with a GENERAL affine model x -> A·x + t (A any 3x3).

    The registration chain's exact residual on aligned inputs composes
    to R1·diag(s)·R2 — a general affine, not R·diag(s)
    (anisotropic_icp's model; see its docstring for the two reference
    quirks that compose it).  Per iteration the closed-form weighted
    least squares A = (Ycᵀ W Xc)(Xcᵀ W Xc + λI)⁻¹ cancels it fully.
    A's singular values are clamped to [0.75, 1.25] so degenerate
    correspondences (thin structures, partial overlap) cannot collapse
    or shear the cloud unboundedly.  Opt-in via cfg.final_refine =
    'affine' (default stays 'anisotropic').

    Returns T 4x4 with T[:3,:3] = A.
    """
    src = jnp.asarray(source, jnp.float32)
    tgt = jnp.asarray(target, jnp.float32)
    thresh2 = jnp.float32(max_correspondence_distance) ** 2

    def body(_, T):
        moved = src @ T[:3, :3].T + T[:3, 3]
        d2, idx = _nn(moved[None], tgt[None])
        d2, idx = d2[0], idx[0]
        w0 = (d2 <= thresh2).astype(jnp.float32)
        any_in = w0.sum() > 8
        w = jnp.where(any_in, w0, jnp.ones_like(w0))
        y = tgt[idx]
        wsum = jnp.maximum(w.sum(), 1e-6)
        xm = (w[:, None] * moved).sum(0) / wsum
        ym = (w[:, None] * y).sum(0) / wsum
        Xc = moved - xm
        Yc = y - ym
        Sxx = (w[:, None] * Xc).T @ Xc
        Sxx = Sxx + 1e-6 * jnp.trace(Sxx) * jnp.eye(3, dtype=jnp.float32)
        Sxy = (w[:, None] * Yc).T @ Xc
        A = Sxy @ jnp.linalg.inv(Sxx)
        U, S, Vt = jnp.linalg.svd(A)
        A = U @ jnp.diag(jnp.clip(S, 0.75, 1.25)) @ Vt
        t = ym - A @ xm
        dT = (jnp.eye(4, dtype=jnp.float32)
              .at[:3, :3].set(A).at[:3, 3].set(t))
        return jnp.where(any_in, dT @ T, T)

    return jax.lax.fori_loop(0, iters, body,
                             jnp.eye(4, dtype=jnp.float32))


def _scale_mat(s) -> jnp.ndarray:
    s3 = jnp.broadcast_to(jnp.asarray(s, jnp.float32), (3,))
    return jnp.diag(jnp.concatenate([s3, jnp.ones(1, jnp.float32)]))


@functools.partial(jax.jit, static_argnames=("iters",))
def icp_with_scaling(source, target, scale,
                     max_correspondence_distance: float = 0.05,
                     init_transform: jnp.ndarray | None = None,
                     iters: int = 30):
    """ICP, bake an isotropic scale into the result, ICP again.

    Reference: reg_xyz.py:24-38 (final_transform = T1 @ diag(scale)).
    """
    T1, _, _ = icp(source, target, max_correspondence_distance,
                   init_transform, iters=iters)
    T_init = T1 @ _scale_mat(scale)
    return icp(source, target, max_correspondence_distance, T_init,
               iters=iters)


@functools.partial(jax.jit, static_argnames=("iters",))
def _coarse_one(scale, src, tgt, cd_inv_weight, iters=30):
    T, _, _ = icp_with_scaling(src, tgt, scale,
                               max_correspondence_distance=0.075, iters=iters)
    inv = jnp.linalg.inv(T)
    tgt_back = tgt @ inv[:3, :3].T + inv[:3, 3]
    cd = chamfer_partial_l1(src, tgt_back) \
        + chamfer_partial_l1(tgt_back, src) * cd_inv_weight
    return cd, T


def coarse_scale_sweep(source, target, scales=None, cd_inv_weight: float = 0.5
                       ) -> Tuple[float, np.ndarray, float]:
    """Best isotropic scale by batched ICP (reference: reg_xyz.py:146-173).

    Returns (best_scale, coarse_transformation 4x4, best_loss).
    """
    if scales is None:
        scales = np.linspace(1.5, 0.8, 11)
    src = jnp.asarray(source, jnp.float32)
    tgt = jnp.asarray(target, jnp.float32)
    cds, Ts = jax.vmap(lambda s: _coarse_one(s, src, tgt,
                                             jnp.float32(cd_inv_weight)))(
        jnp.asarray(scales, jnp.float32))
    best = int(jnp.argmin(cds))
    return float(scales[best]), np.asarray(Ts[best]), float(cds[best])


@functools.partial(jax.jit, static_argnames=("iters",))
def _fine_one(scales3, src, tgt, cd_inv_weight, iters=15):
    # 15 iterations: o3d's default criterion stops on 1e-6 relative change,
    # which from the grid's already-aligned starts converges well under 15;
    # we run the fixed budget the compiler can pipeline.
    scaled = src * scales3[None, :]
    T, _, _ = icp(scaled, tgt, 0.075, iters=iters)
    # score on the scaled-but-unregistered source — reference semantics
    cd = chamfer_partial_l1(scaled, tgt) \
        + chamfer_partial_l1(tgt, scaled) * cd_inv_weight
    return cd, T


@jax.jit
def _fine_score(scales3, src, tgt, cd_inv_weight):
    """Score of one per-axis-scale candidate WITHOUT the ICP.

    The reference scores each grid candidate on the scaled-but-
    UNREGISTERED source (reg_xyz.py:75-83) — the score never depends on
    the ICP result.  Splitting score from registration lets the grid
    search score all 10^3 candidates chamfer-only and run the 15-iter
    ICP once per object at the winner (identical selection and result,
    ~1000x less ICP work — it was 19 s of the batched stage 3)."""
    scaled = src * scales3[None, :]
    return (chamfer_partial_l1(scaled, tgt)
            + chamfer_partial_l1(tgt, scaled) * cd_inv_weight)


def iterative_scale_search(source, target,
                           scale_ranges=((0.8, 1.2), (0.8, 1.2), (0.8, 1.2)),
                           scale_steps: int = 10,
                           cd_inv_weight: float = 0.0,
                           batch: int = 125,
                           ) -> Tuple[np.ndarray, float, np.ndarray]:
    """Per-axis scale grid search (reference: reg_xyz.py:60-96), batched.

    Returns (best_scales_transformation 4x4, best_loss, best_transformation).
    """
    axes = [np.linspace(lo, hi, scale_steps) for lo, hi in scale_ranges]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    src = jnp.asarray(source, jnp.float32)
    tgt = jnp.asarray(target, jnp.float32)
    # score/register split (see _fine_score): chamfer-only scores for the
    # whole grid, then ONE 15-iter ICP at the winning scales
    f = jax.jit(jax.vmap(lambda s: _fine_score(s, src, tgt,
                                               jnp.float32(cd_inv_weight))))
    best_cd, best_scales = np.inf, None
    for i in range(0, len(grid), batch):
        chunk = jnp.asarray(grid[i:i + batch], jnp.float32)
        cds = np.asarray(f(chunk))
        j = int(cds.argmin())
        if cds[j] < best_cd:
            best_cd = float(cds[j])
            best_scales = grid[i + j]
    T, _, _ = icp(src * jnp.asarray(best_scales, jnp.float32)[None, :],
                  tgt, 0.075, iters=15)
    S = np.eye(4)
    S[0, 0], S[1, 1], S[2, 2] = best_scales
    return S, best_cd, np.asarray(T)
