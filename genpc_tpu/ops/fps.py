"""Farthest-point sampling as a jit-compiled XLA loop.

TPU-native equivalent of the external Rust ``fpsample`` package the
reference uses for metric downsampling to 16384 (reference: main.py:21-22),
viewpoint-select downsampling to 10k (reference: DepthPrompting.py:88-90)
and fusion downsampling to 20000 (reference: reg_xyz.py:215).

Algorithm: iterative argmax-of-min-distance.  The whole loop is a single
``lax.fori_loop`` under jit — the min-distance table lives in VMEM/HBM and
each step is one fused distance update + argmax, so the op never leaves the
device.  ``fpsample`` uses a random start point by default; we default to
the deterministic point 0 (the reference never fixes a seed, so exact index
parity is not defined — FPS quality is what matters).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def fps_indices(points: jnp.ndarray, k: int, start: int = 0) -> jnp.ndarray:
    """Indices of k farthest points. points: [N,3] (any float dtype).

    On TPU (runtime.use_pallas) this routes through the VMEM-resident
    Pallas kernel (ops/fps_kernel.py) — same selection sequence, ~20x
    faster at metric scale; the XLA loop below is the fallback/CPU path.
    """
    from genpc_tpu.runtime import use_pallas
    from genpc_tpu.ops.fps_kernel import fps_pallas_batched, fps_supported
    n = points.shape[0]
    if use_pallas() and fps_supported(n, k):
        return fps_pallas_batched(points[None], k, start=start)[0]
    return _fps_indices_xla(points, k, start)


@functools.partial(jax.jit, static_argnames=("k",))
def _fps_indices_xla(points: jnp.ndarray, k: int,
                     start: int = 0) -> jnp.ndarray:
    pts = jnp.asarray(points, jnp.float32)
    n = pts.shape[0]

    def body(i, state):
        min_d, idxs, last = state
        d = jnp.sum((pts - pts[last]) ** 2, axis=1)
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(min_d).astype(jnp.int32)
        idxs = idxs.at[i].set(nxt)
        return min_d, idxs, nxt

    init = (jnp.full((n,), jnp.inf, jnp.float32),
            jnp.zeros((k,), jnp.int32).at[0].set(start),
            jnp.int32(start))
    _, idxs, _ = jax.lax.fori_loop(1, k, body, init)
    return idxs


def farthest_point_sample(points, k: int, start: int = 0):
    """Return the sampled points (and indices) directly.

    Accepts numpy or jax arrays; if k >= N, returns all points (indices
    0..N-1) — the reference's fpsample would error here, we degrade softly.
    """
    pts = jnp.asarray(points)
    n = pts.shape[0]
    if k >= n:
        idx = jnp.arange(n, dtype=jnp.int32)
        return pts, idx
    idx = fps_indices(pts, k, start)
    return pts[idx], idx


def fps_numpy(points: np.ndarray, k: int, start: int = 0) -> np.ndarray:
    """Host numpy FPS (reference implementation for tests)."""
    pts = np.asarray(points, np.float64)
    n = len(pts)
    idxs = np.zeros(k, np.int64)
    idxs[0] = start
    min_d = np.full(n, np.inf)
    last = start
    for i in range(1, k):
        d = np.sum((pts - pts[last]) ** 2, axis=1)
        min_d = np.minimum(min_d, d)
        last = int(np.argmax(min_d))
        idxs[i] = last
    return idxs
