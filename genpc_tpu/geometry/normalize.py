"""Bounding-box normalization (reference: utils/dataUtils.py:514-581).

``normalize_points(x, range=0.5)`` recenters to the bbox midpoint and
scales by the largest bbox extent, then multiplies by range/0.5 — i.e.
range=0.5 maps the largest extent to exactly 1.0 centered at 0, which is
how the reference normalizes the generated complete cloud before
registration (reference: reg_xyz.py:131).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def normalize_points(xyz, range: float = 1.0
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (normalized, center, scale_factor)."""
    pts = jnp.asarray(xyz, jnp.float32)
    lo = pts.min(axis=0)
    hi = pts.max(axis=0)
    center = (hi + lo) / 2.0
    scale_factor = (hi - lo).max()
    out = (pts - center) / jnp.maximum(scale_factor, 1e-12)
    out = out * (range / 0.5)
    return out, center, scale_factor
