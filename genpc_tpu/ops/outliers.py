"""Statistical outlier removal (open3d ``remove_statistical_outlier``).

Used by the reference after fusion (reference: reg_xyz.py:219 via
utils/dataUtils.py:652-666, nb_neighbors=20) and on InstantMesh partials
(reference: reg_xyz.py:136).  Semantics: a point is kept iff its mean
distance to its nb_neighbors nearest neighbors (excluding itself) is below
global_mean + std_ratio * global_std of those per-point means.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from genpc_tpu.ops.knn import knn


@functools.partial(jax.jit, static_argnames=("nb_neighbors",))
def statistical_outlier_mask(points: jnp.ndarray, nb_neighbors: int = 20,
                             std_ratio: float = 2.0) -> jnp.ndarray:
    pts = jnp.asarray(points, jnp.float32)
    d, _ = knn(pts, pts, nb_neighbors + 1)   # first neighbor is self (d=0)
    mean_d = jnp.sqrt(jnp.maximum(d[:, 1:], 0.0)).mean(axis=1)
    mu = mean_d.mean()
    sigma = mean_d.std()
    return mean_d <= mu + std_ratio * sigma


def remove_statistical_outliers(points, colors=None, nb_neighbors: int = 20,
                                std_ratio: float = 2.0
                                ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Host wrapper returning filtered (points, colors)."""
    mask = np.asarray(statistical_outlier_mask(points, nb_neighbors, std_ratio))
    pts = np.asarray(points)[mask]
    cols = None if colors is None else np.asarray(colors)[mask]
    return pts, cols
