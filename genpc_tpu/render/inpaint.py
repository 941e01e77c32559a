"""Depth-image hole inpainting.

The reference's default inpainter is cv2.INPAINT_NS (Navier-Stokes) on the
host (reference: DepthPrompting.py:29-30,217-228; configs/config.yaml:31).
Here the default is a jit-compiled diffusion fill: masked pixels relax to
the solution of Laplace's equation with known pixels as Dirichlet boundary
— the smooth-continuation behavior NS inpainting converges to for the small
splat-ring holes this pipeline produces — running entirely on the TPU and
vmappable over a batch of depth images.  A cv2 pass-through backend is kept
for exact host parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("iters",))
def diffusion_inpaint(img: jnp.ndarray, hole_mask: jnp.ndarray,
                      iters: int = 250) -> jnp.ndarray:
    """Fill hole pixels by iterative 4-neighbor diffusion.

    img [C,H,W] float; hole_mask [H,W] (or [C,H,W], any nonzero = hole).
    Returns img with holes replaced by the harmonic fill.
    """
    x = jnp.asarray(img, jnp.float32)
    m = jnp.asarray(hole_mask, jnp.float32)
    if m.ndim == 3:
        m = m.max(axis=0)
    hole = (m > 0.5)[None, :, :]

    # seed holes with the global mean of known pixels for faster relaxation
    known_mean = jnp.sum(x * (~hole), axis=(1, 2)) / jnp.maximum(
        jnp.sum(~hole, axis=(1, 2)), 1)
    x = jnp.where(hole, known_mean[:, None, None], x)

    def avg4(a):
        s = (jnp.roll(a, 1, axis=1) + jnp.roll(a, -1, axis=1)
             + jnp.roll(a, 1, axis=2) + jnp.roll(a, -1, axis=2))
        return s / 4.0

    def body(_, a):
        return jnp.where(hole, avg4(a), a)

    return jax.lax.fori_loop(0, iters, body, x)


def inpaint_image(img, hole_mask, backend: str = "jax", iters: int = 250):
    """Dispatch: 'jax' (device diffusion) or 'cv2' (host INPAINT_NS parity).

    img [C,H,W] float in [0,1]; returns the same layout.
    """
    if backend == "cv2":
        import cv2
        img_np = (np.asarray(img).transpose(1, 2, 0) * 255).astype(np.uint8)
        m = np.asarray(hole_mask)
        if m.ndim == 3:
            m = m.max(axis=0)
        mask_np = (m * 255).astype(np.uint8)
        out = cv2.inpaint(img_np, mask_np, 2, cv2.INPAINT_NS)
        return jnp.asarray(out.transpose(2, 0, 1), jnp.float32) / 255.0
    return diffusion_inpaint(img, hole_mask, iters=iters)
