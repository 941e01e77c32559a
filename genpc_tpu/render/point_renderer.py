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


@functools.partial(jax.jit, static_argnames=("footprint", "deterministic"))
def render_points(points: jnp.ndarray, colors: jnp.ndarray,
                  radius, camera: RenderCamera, gamma: float = 1e-2,
                  footprint: int = 3, deterministic: bool = False
                  ) -> jnp.ndarray:
    """Render [N,3] points with [N,3] colors -> [res,res,3] image.

    radius: world-space splat radius (scalar or [N]).
    footprint: half-width of the splat window in pixels (K = 2f+1).
    deterministic: replace float scatter-add accumulation with the
    fixed-point integer accumulate (bitwise run-to-run reproducible on
    TPU at scatter-add speed; the pose optimizer uses this by default).
    """
    res = camera.res
    pts = jnp.asarray(points, jnp.float32)
    cols = jnp.asarray(colors, jnp.float32)
    rad = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (pts.shape[0],))

    # camera at eye looking at origin, up +y  (x right, y up, z toward cam)
    depth = jnp.maximum(camera.eye[2] - pts[:, 2], camera.znear)
    half = res / 2.0
    px = (pts[:, 0] * camera.focal / depth) * half + half - 0.5
    py = (-pts[:, 1] * camera.focal / depth) * half + half - 0.5  # +y is up

    # pixel-space splat radius; clamp into [0.3, footprint]
    rad_pix = jnp.clip(rad * camera.focal / depth * half, 0.3, float(footprint))
    sigma2 = (rad_pix * 0.6) ** 2

    # Pulsar-style depth weight, normalized to [0,1] (1 = closest)
    dn = jnp.clip((camera.zfar - depth) / (camera.zfar - camera.znear), 0.0, 1.0)

    ix = jnp.floor(px).astype(jnp.int32)
    iy = jnp.floor(py).astype(jnp.int32)
    npix = res * res
    in_front = depth > camera.znear

    n = pts.shape[0]
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
