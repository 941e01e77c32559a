"""Voxel-grid downsampling (open3d ``voxel_down_sample`` equivalent).

The reference voxel-downsamples before ICP and pose optimization
(reference: reg_xyz.py:154-155,183-189; optim_registration/diff_obj_pose.py
:150-153).  Points falling in the same voxel are averaged (coordinates and
colors), matching open3d semantics.  This is host-side preprocessing with
data-dependent output size, so it runs in numpy; the C++ native extension
(genpc_tpu/native) provides a faster drop-in when built.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np


def voxel_down_sample(points: np.ndarray, voxel_size: float,
                      colors: Optional[np.ndarray] = None,
                      ) -> Union[np.ndarray, Tuple[np.ndarray, Optional[np.ndarray]]]:
    """Average points (and colors) per occupied voxel.

    Returns points only when colors is None was passed positionally is
    ambiguous, so: always returns (points, colors) where colors may be None.
    """
    points = np.asarray(points)
    if len(points) == 0:
        return points, colors
    try:
        from genpc_tpu.native import voxel_down_sample_native
        return voxel_down_sample_native(points, voxel_size, colors)
    except Exception:
        pass
    min_bound = points.min(axis=0)
    idx = np.floor((points - min_bound) / voxel_size).astype(np.int64)
    # pack 3 voxel coords into one key (21 bits each covers 2M voxels/axis)
    key = (idx[:, 0] << 42) | (idx[:, 1] << 21) | idx[:, 2]
    uniq, inv, counts = np.unique(key, return_inverse=True, return_counts=True)
    out = np.zeros((len(uniq), 3), dtype=np.float64)
    np.add.at(out, inv, points.astype(np.float64))
    out /= counts[:, None]
    out = out.astype(points.dtype)
    out_colors = None
    if colors is not None:
        out_colors = np.zeros((len(uniq), colors.shape[1]), dtype=np.float64)
        np.add.at(out_colors, inv, np.asarray(colors, np.float64))
        out_colors = (out_colors / counts[:, None]).astype(np.asarray(colors).dtype)
    return out, out_colors
