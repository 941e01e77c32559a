"""k-nearest-neighbor and ball-query ops (pointnet2_ops equivalents).

The reference installs pointnet2_ops (CUDA FPS/ball-query/grouping) for its
image-to-3D dependency (reference: README.md:22; SURVEY §2.2).  Here both
are memory-bounded XLA ops: distances are computed in row tiles and reduced
with top_k, so clouds of 100k+ points never materialize an N×M matrix.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("k",))
def knn(query: jnp.ndarray, ref: jnp.ndarray, k: int
        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each query point, the k nearest reference points.

    query [N,3], ref [M,3] -> (sq_dists [N,k], idx [N,k] int32), ascending.
    """
    q = jnp.asarray(query, jnp.float32)
    r = jnp.asarray(ref, jnp.float32)
    n = q.shape[0]
    tx = min(_round_up(n, 8), 1024)
    n_pad = _round_up(n, tx)
    qp = jnp.pad(q, ((0, n_pad - n), (0, 0)))
    qt = qp.reshape(n_pad // tx, tx, 3)

    def one_tile(x_tile):
        d = jnp.sum((x_tile[:, None, :] - r[None, :, :]) ** 2, axis=-1)
        neg_d, idx = jax.lax.top_k(-d, k)
        return -neg_d, idx.astype(jnp.int32)

    dists, idxs = jax.lax.map(one_tile, qt)
    return (dists.reshape(n_pad, k)[:n], idxs.reshape(n_pad, k)[:n])


@functools.partial(jax.jit, static_argnames=("k",))
def ball_query(query: jnp.ndarray, ref: jnp.ndarray, radius: float, k: int
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Up to k reference points within radius of each query point.

    Matches pointnet2 ball_query semantics: slots beyond the found count are
    filled with the first found index; if none found, index 0.
    Returns (idx [N,k] int32, valid_mask [N,k] bool).
    """
    d, idx = knn(query, ref, k)
    inside = d <= radius * radius
    first = idx[:, :1]
    any_inside = inside[:, :1]
    idx = jnp.where(inside, idx, jnp.where(any_inside, first, 0))
    return idx, inside


def group_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather grouped features: points [M,C], idx [N,k] -> [N,k,C]."""
    return jnp.asarray(points)[idx]
