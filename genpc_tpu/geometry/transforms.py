"""Rotation parameterizations and rigid/similarity transforms in jnp.

Replaces the pytorch3d.transforms subset the reference uses
(reference: optim_registration/diff_obj_pose.py:20-22: rotation_6d_to_matrix,
matrix_to_rotation_6d, axis_angle_to_matrix) plus the numpy rotation helper
(reference: utils/dataUtils.py:455-471 ``get_rotate_matrix``).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """Zhou et al. 6D -> rotation matrix via Gram-Schmidt.

    The 6 numbers are the first two *columns* of R stacked
    [r00,r10,r20, r01,r11,r21], matching pytorch3d's layout
    (reference: diff_obj_pose.py:492 comment).
    """
    a1 = d6[..., 0:3]
    a2 = d6[..., 3:6]
    b1 = a1 / (jnp.linalg.norm(a1, axis=-1, keepdims=True) + 1e-12)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / (jnp.linalg.norm(a2p, axis=-1, keepdims=True) + 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)   # columns


def matrix_to_rotation_6d(R: jnp.ndarray) -> jnp.ndarray:
    """First two columns of R, column-major flattened."""
    return jnp.concatenate([R[..., :, 0], R[..., :, 1]], axis=-1)


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula; axis_angle [...,3] with |v| = angle."""
    v = jnp.asarray(axis_angle, jnp.float32)
    angle = jnp.linalg.norm(v, axis=-1, keepdims=True)
    safe = jnp.where(angle > 1e-12, angle, 1.0)
    k = v / safe
    K = jnp.stack([
        jnp.stack([jnp.zeros_like(k[..., 0]), -k[..., 2], k[..., 1]], -1),
        jnp.stack([k[..., 2], jnp.zeros_like(k[..., 0]), -k[..., 0]], -1),
        jnp.stack([-k[..., 1], k[..., 0], jnp.zeros_like(k[..., 0])], -1),
    ], axis=-2)
    eye = jnp.eye(3, dtype=v.dtype)
    s = jnp.sin(angle)[..., None]
    c = jnp.cos(angle)[..., None]
    R = eye + s * K + (1 - c) * (K @ K)
    return jnp.where(angle[..., None] > 1e-12, R, eye)


def rot6d_from_axis_angle(axis: str, angle_deg: float) -> jnp.ndarray:
    """6D init rotation about a named axis (reference: diff_obj_pose.py:470-493)."""
    unit = {"x": [1.0, 0, 0], "y": [0, 1.0, 0], "z": [0, 0, 1.0]}[axis]
    v = jnp.asarray(unit, jnp.float32) * math.radians(angle_deg)
    return matrix_to_rotation_6d(axis_angle_to_matrix(v))


def get_rotate_matrix(axis: str, angle_deg: float) -> np.ndarray:
    """Numpy rotation matrix (reference: utils/dataUtils.py:455-471)."""
    a = math.radians(angle_deg)
    c, s = math.cos(a), math.sin(a)
    if axis == "x":
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    if axis == "y":
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    if axis == "z":
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    raise ValueError("axis should be x, y or z")


def build_transform(R, t, scale) -> jnp.ndarray:
    """4x4 [s·R | t] (reference: diff_obj_pose.py:464-468)."""
    R = jnp.asarray(R, jnp.float32)
    T = jnp.eye(4, dtype=jnp.float32)
    T = T.at[:3, :3].set(R * scale)
    T = T.at[:3, 3].set(jnp.asarray(t, jnp.float32))
    return T


def invert_se3(T):
    """Inverse of a 4x4 (general, via solve — handles scaled blocks too)."""
    return jnp.linalg.inv(jnp.asarray(T, jnp.float32))


def apply_transform(T, points):
    """Apply a 4x4 to [N,3] points."""
    pts = jnp.asarray(points, jnp.float32)
    T = jnp.asarray(T, jnp.float32)
    return pts @ T[:3, :3].T + T[:3, 3]
