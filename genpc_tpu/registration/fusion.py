"""Cloud fusion: dedup, concat, FPS, denoise.

Equivalent of the reference's fusion tail (reference: reg_xyz.py:210-223):
  1. drop generated points whose nearest input point is closer than the
     threshold (``remove_close_points``, reg_xyz.py:41-57 — note the
     reference compares open3d's *squared* KNN distance against 1e-4,
     i.e. a 0.01 euclidean radius; we preserve that),
  2. concatenate input + surviving generated points,
  3. FPS-downsample to 20000,
  4. statistical outlier removal (std_ratio 2.5, dataUtils.py:652-666).

The reference runs step 1 as a Python KDTree loop per point; here it is one
NN kernel call.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from genpc_tpu.ops.chamfer import nearest_neighbor
from genpc_tpu.ops.fps import farthest_point_sample
from genpc_tpu.ops.outliers import remove_statistical_outliers


def remove_close_points(source_pts: np.ndarray, target_pts: np.ndarray,
                        target_colors: Optional[np.ndarray] = None,
                        distance_threshold: float = 1e-4
                        ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Keep target points whose squared NN distance to source >= threshold."""
    d2, _ = nearest_neighbor(jnp.asarray(target_pts, jnp.float32),
                             jnp.asarray(source_pts, jnp.float32))
    mask = np.asarray(d2) >= distance_threshold
    kept = np.asarray(target_pts)[mask]
    cols = None if target_colors is None else np.asarray(target_colors)[mask]
    return kept, cols


def fuse_clouds(source_pts: np.ndarray, target_pts: np.ndarray,
                source_colors: Optional[np.ndarray] = None,
                target_colors: Optional[np.ndarray] = None,
                num_points: int = 20000,
                distance_threshold: float = 1e-4,
                denoise_std_ratio: float = 2.5
                ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Full fusion tail; returns (points, colors)."""
    kept, kept_cols = remove_close_points(source_pts, target_pts,
                                          target_colors, distance_threshold)
    pts = np.concatenate([np.asarray(source_pts), kept], axis=0)
    cols = None
    if source_colors is not None and kept_cols is not None:
        cols = np.concatenate([np.asarray(source_colors), kept_cols], axis=0)
    if len(pts) > num_points:
        _, idx = farthest_point_sample(pts, num_points)
        idx = np.asarray(idx)
        pts = pts[idx]
        cols = None if cols is None else cols[idx]
    return remove_statistical_outliers(pts, cols, nb_neighbors=20,
                                       std_ratio=denoise_std_ratio)
