"""Point-cloud densification (reference: utils/dataUtils.py:99-134).

``linear_interpolation`` adds midpoints between each point and its nearest
neighbor; ``random_add_points`` repeats it until a target count, like the
reference's interpolation-based densify helpers.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from genpc_tpu.ops.knn import knn


def linear_interpolation(points: np.ndarray,
                         colors: Optional[np.ndarray] = None,
                         frac: float = 1.0, seed: int = 0
                         ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Add midpoints toward nearest neighbors for a fraction of points."""
    pts = np.asarray(points, np.float32)
    _, idx = knn(jnp.asarray(pts), jnp.asarray(pts), 2)
    nn = pts[np.asarray(idx)[:, 1]]
    mid = (pts + nn) / 2.0
    if frac < 1.0:
        rng = np.random.default_rng(seed)
        sel = rng.choice(len(pts), int(len(pts) * frac), replace=False)
        mid = mid[sel]
        mid_cols = None if colors is None else (
            (np.asarray(colors) + np.asarray(colors)[np.asarray(idx)[:, 1]])
            / 2.0)[sel]
    else:
        mid_cols = None if colors is None else (
            np.asarray(colors)
            + np.asarray(colors)[np.asarray(idx)[:, 1]]) / 2.0
    out = np.concatenate([pts, mid], axis=0)
    out_cols = None
    if colors is not None:
        out_cols = np.concatenate([np.asarray(colors), mid_cols], axis=0)
    return out, out_cols


def random_add_points(points: np.ndarray, target: int,
                      colors: Optional[np.ndarray] = None, seed: int = 0
                      ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Densify by repeated interpolation until >= target, then trim."""
    pts, cols = np.asarray(points, np.float32), colors
    while len(pts) < target:
        pts, cols = linear_interpolation(pts, cols, seed=seed)
    rng = np.random.default_rng(seed)
    if len(pts) > target:
        sel = rng.choice(len(pts), target, replace=False)
        pts = pts[sel]
        cols = None if cols is None else np.asarray(cols)[sel]
    return pts, cols
