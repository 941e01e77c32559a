"""Point splatting into depth/color images + hole-mask construction.

Jit-compiled equivalents of the reference's ``paintPixels`` (scatter points
with a square brush then flip vertically, DepthPrompting.py:292-339) and
``getRawDepth`` (inverted normalized depth encoding 0.1+0.8·(1−d̂), sparse
color/depth images, two hole masks via dilated-vs-thin XOR,
DepthPrompting.py:341-391).

The torch version loops/duplicates brush offsets on the host; here the
brush is a static unrolled offset grid of scatter stores, one fused XLA
program, vmappable across objects.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("point_size", "flip"))
def paint_pixels(img: jnp.ndarray, pixel_coords: jnp.ndarray,
                 pixel_colors: jnp.ndarray, point_size: int = 1,
                 flip: bool = True, valid: jnp.ndarray | None = None
                 ) -> jnp.ndarray:
    """Scatter colors into an image with a square brush.

    img [C,R,R]; pixel_coords [N,2] as (row, col); pixel_colors [N,C] or
    scalar.  Brush covers offsets in (-point_size+1 .. point_size-1)², like
    the reference.  Out-of-bounds brush pixels are dropped.  The result is
    flipped vertically (reference: DepthPrompting.py:339) unless flip=False.
    ``valid`` (bool [N]) masks points out without changing shapes — this is
    how visibility filtering stays a static-shape program.
    """
    C, R, _ = img.shape
    coords = jnp.asarray(pixel_coords, jnp.int32)
    colors = jnp.asarray(pixel_colors, jnp.float32)
    if colors.ndim == 0 or colors.shape == (1,):
        colors = jnp.broadcast_to(colors.reshape(()), (coords.shape[0], C))
    flat = img.reshape(C, R * R)
    dummy = R * R  # clipped-out writes land here
    flat = jnp.pad(flat, ((0, 0), (0, 1)))
    for dy in range(-point_size + 1, point_size):
        for dx in range(-point_size + 1, point_size):
            r = coords[:, 0] + dy
            c = coords[:, 1] + dx
            ok = (r >= 0) & (r < R) & (c >= 0) & (c < R)
            if valid is not None:
                ok = ok & valid
            idx = jnp.where(ok, r * R + c, dummy)
            flat = flat.at[:, idx].set(colors.T, mode="drop")
    out = flat[:, :R * R].reshape(C, R, R)
    return out[:, ::-1, :] if flip else out


@functools.partial(jax.jit,
                   static_argnames=("res", "point_size", "mask_pixel_rate"))
def raw_depth_images(point_pixels: jnp.ndarray, point_depth: jnp.ndarray,
                     colors: jnp.ndarray, res: int = 256, point_size: int = 1,
                     mask_pixel_rate: int = 3,
                     valid: jnp.ndarray | None = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sparse color/depth images + two hole masks (DepthPrompting.py:341-391).

    point_pixels [N,2] (row,col), point_depth [N] view depths (any scale),
    colors [N,3], valid optional bool [N] (invisible points masked out —
    depth normalization ignores them too).  Returns (sparse_img, raw_depth,
    hole_mask1, hole_mask2), each [3,res,res] float in [0,1].
    """
    zero = jnp.zeros((3, res, res), jnp.float32)
    d = jnp.asarray(point_depth, jnp.float32)
    if valid is not None:
        dmin = jnp.min(jnp.where(valid, d, jnp.inf))
        dmax = jnp.max(jnp.where(valid, d, -jnp.inf))
    else:
        dmin, dmax = d.min(), d.max()
    dn = (d - dmin) / jnp.maximum(dmax - dmin, 1e-12)
    depth_col = (0.1 + 0.8 * (1.0 - dn))[:, None].repeat(3, axis=1)

    sparse_img = paint_pixels(zero, point_pixels, colors, point_size,
                              valid=valid)
    raw_depth = paint_pixels(zero, point_pixels, depth_col, point_size,
                             valid=valid)
    all_front = (paint_pixels(zero, point_pixels, colors,
                              point_size * mask_pixel_rate,
                              valid=valid) != 0).astype(jnp.float32)
    all_back = 1.0 - all_front
    front = (sparse_img != 0).astype(jnp.float32)
    back = 1.0 - front
    # binary XOR of 0/1 masks == absolute difference
    hole_mask1 = jnp.abs(all_back - back)
    hole_mask2 = jnp.abs(all_front - back)
    return sparse_img, raw_depth, hole_mask1, hole_mask2


def uvs_to_pixels(uvs: jnp.ndarray, res: int) -> jnp.ndarray:
    """UV [N,2] in [0,1] -> integer (row, col) pixels, clipped.

    Mirrors the reference's (row, col) swap + clip
    (DepthPrompting.py:179-184).
    """
    p = (jnp.asarray(uvs) * res).astype(jnp.int32)
    p = jnp.stack([p[:, 1], p[:, 0]], axis=-1)
    return jnp.clip(p, 0, res - 1)
