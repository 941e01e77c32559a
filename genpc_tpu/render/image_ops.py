"""2D image utilities (reference: utils/utils_2d.py).

The numpy/torch grab-bag the reference keeps next to the pipeline:
morphological hole filling, scatter-based inpainting, Scharr edges,
bilateral filtering, image concat/pad helpers.  All jnp (jit-safe) except
``naive_inpainting`` which, like the reference's scipy-griddata version
(utils_2d.py:529-572), is a host op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("iterations",))
def dilate(mask: jnp.ndarray, iterations: int = 1) -> jnp.ndarray:
    """Binary 3x3 dilation; mask [H,W] float/bool."""
    m = jnp.asarray(mask, jnp.float32)
    for _ in range(iterations):
        m = jax.lax.reduce_window(m, 0.0, jax.lax.max, (3, 3), (1, 1),
                                  "SAME")
    return m


@functools.partial(jax.jit, static_argnames=("iterations",))
def erode(mask: jnp.ndarray, iterations: int = 1) -> jnp.ndarray:
    m = jnp.asarray(mask, jnp.float32)
    for _ in range(iterations):
        m = -jax.lax.reduce_window(-m, -1.0, jax.lax.max, (3, 3), (1, 1),
                                   "SAME")
    return m


def fill_hole(mask: jnp.ndarray, iterations: int = 2) -> jnp.ndarray:
    """Morphological close (reference: utils_2d.py:511-528)."""
    return erode(dilate(mask, iterations), iterations)


def naive_inpainting(img: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Interpolation fill of masked pixels (reference: utils_2d.py:529-572).

    img [H,W,C]; mask [H,W] nonzero = hole.  Host scipy griddata (linear
    with nearest fallback), matching the reference's behavior.
    """
    from scipy.interpolate import griddata
    img = np.asarray(img, np.float64)
    m = np.asarray(mask) > 0.5
    if not m.any():
        return img
    yy, xx = np.mgrid[0:img.shape[0], 0:img.shape[1]]
    known = ~m
    pts = np.stack([yy[known], xx[known]], axis=1)
    q = np.stack([yy[m], xx[m]], axis=1)
    out = img.copy()
    for c in range(img.shape[2]):
        vals = griddata(pts, img[..., c][known], q, method="linear")
        nn = griddata(pts, img[..., c][known], q, method="nearest")
        vals = np.where(np.isnan(vals), nn, vals)
        out[..., c][m] = vals
    return out


@jax.jit
def scharr_edges(img: jnp.ndarray) -> jnp.ndarray:
    """Scharr gradient magnitude (reference: utils_2d.py:725-780).

    img [H,W] or [H,W,C] -> [H,W] edge magnitude.
    """
    g = jnp.asarray(img, jnp.float32)
    if g.ndim == 3:
        g = g.mean(axis=-1)
    kx = jnp.array([[-3, 0, 3], [-10, 0, 10], [-3, 0, 3]], jnp.float32)
    ky = kx.T
    x = g[None, :, :, None]

    def conv(k):
        return jax.lax.conv_general_dilated(
            x, k[:, :, None, None], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]

    gx, gy = conv(kx), conv(ky)
    return jnp.sqrt(gx ** 2 + gy ** 2)


@functools.partial(jax.jit, static_argnames=("radius",))
def bilateral_filter(img: jnp.ndarray, radius: int = 2,
                     sigma_space: float = 2.0,
                     sigma_color: float = 0.1) -> jnp.ndarray:
    """Edge-preserving smoothing (reference: utils_2d.py:782-850).

    img [H,W,C] float in [0,1].
    """
    x = jnp.asarray(img, jnp.float32)
    acc = jnp.zeros_like(x)
    wacc = jnp.zeros(x.shape[:2], jnp.float32)
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            shifted = jnp.roll(x, (dy, dx), axis=(0, 1))
            w_s = np.exp(-(dy * dy + dx * dx) / (2 * sigma_space ** 2))
            dc = jnp.sum((shifted - x) ** 2, axis=-1)
            w = w_s * jnp.exp(-dc / (2 * sigma_color ** 2))
            acc = acc + shifted * w[..., None]
            wacc = wacc + w
    return acc / wacc[..., None]


def cat_images(images, axis: int = 1, pad: int = 0, pad_value: float = 1.0
               ) -> np.ndarray:
    """Concatenate [H,W,C] images with optional padding bars
    (reference: utils_2d.py:95-210 cat/pad/display helpers)."""
    images = [np.asarray(im) for im in images]
    if pad:
        h, w, c = images[0].shape
        bar_shape = (h, pad, c) if axis == 1 else (pad, w, c)
        bar = np.full(bar_shape, pad_value, images[0].dtype)
        out = []
        for i, im in enumerate(images):
            out.append(im)
            if i < len(images) - 1:
                out.append(bar)
        images = out
    return np.concatenate(images, axis=axis)
