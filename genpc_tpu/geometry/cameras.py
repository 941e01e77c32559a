"""Pinhole camera math as a JAX pytree — the kaolin replacement.

The reference builds 1024 kaolin ``Camera`` objects in a Python loop and
projects the cloud one camera at a time (reference: utils/camera_utils.py
:115-160 ``create_cameras``; DepthPrompting.py:239-271 ``getUvs`` — hot
loop #1).  Here a camera rig is one struct-of-arrays pytree and projection
is a single vmapped einsum over all views — the 1024-view projection is one
fused XLA kernel.

Conventions (documented because the reference inherits kaolin's implicitly):
  * right-handed world, cameras look at the origin, `up` chosen to align
    world +y (reference: camera_utils.py:104-113 ``calculate_up_vector``);
  * camera space: x=right, y=up, z=-forward (OpenGL style);
  * ``transform_points`` returns (u, v, depth) with u,v in NDC ([-1,1]
    across the horizontal/vertical FOV) and depth = distance along the
    viewing axis (positive in front of the camera).  The reference's
    downstream consumers re-normalize both uv (min/max rescale to
    [0.05, 0.95], DepthPrompting.py:247-261) and depth (min/max inversion,
    DepthPrompting.py:362-366), so only relative geometry must agree.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def fibonacci_sphere(samples: int, radius: float = 2.0) -> np.ndarray:
    """Evenly distributed viewpoints (reference: dataUtils.py:334-360)."""
    i = np.arange(samples, dtype=np.float64)
    phi = math.pi * (3.0 - math.sqrt(5.0))
    y = 1.0 - (i / (samples - 1)) * 2.0 if samples > 1 else np.zeros(1)
    r_y = np.sqrt(np.maximum(1.0 - y * y, 0.0))
    theta = phi * i
    pts = np.stack([np.cos(theta) * r_y, y, np.sin(theta) * r_y], axis=1)
    return pts * radius


def calculate_up_vector(eye, target=(0.0, 0.0, 0.0)) -> np.ndarray:
    """Up vector aligning world +y (reference: camera_utils.py:104-113)."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    gaze = target - eye
    world_up = np.array([0.0, 1.0, 0.0])
    side = np.cross(gaze, world_up)
    if np.allclose(side, 0):
        return np.array([0.0, 0.0, 1.0])
    up = np.cross(side, gaze)
    return up / np.linalg.norm(up)


def look_at_rotation(eye, at, up):
    """World->camera rotation rows (right, true_up, -forward)."""
    eye = jnp.asarray(eye, jnp.float32)
    at = jnp.asarray(at, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    fwd = at - eye
    fwd = fwd / (jnp.linalg.norm(fwd) + 1e-12)
    right = jnp.cross(fwd, up)
    right = right / (jnp.linalg.norm(right) + 1e-12)
    true_up = jnp.cross(right, fwd)
    return jnp.stack([right, true_up, -fwd], axis=0)   # [3,3]


@jax.tree_util.register_pytree_node_class
@dataclass
class Camera:
    """Batched pinhole cameras: all fields carry a leading view axis [V,...]."""
    eye: jnp.ndarray      # [V,3]
    rot: jnp.ndarray      # [V,3,3] world->camera
    fov: jnp.ndarray      # [V] vertical fov, radians
    res: int              # image resolution (square)

    def tree_flatten(self):
        return (self.eye, self.rot, self.fov), (self.res,)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves, res=aux[0])

    def __len__(self):
        return self.eye.shape[0]

    def __getitem__(self, i) -> "Camera":
        sel = (lambda a: a[i][None]) if jnp.ndim(i) == 0 else (lambda a: a[i])
        return Camera(sel(self.eye), sel(self.rot), sel(self.fov), self.res)

    @classmethod
    def from_eyes(cls, eyes, fovy_deg: float, res: int,
                  at=(0.0, 0.0, 0.0), ups=None) -> "Camera":
        eyes = np.atleast_2d(np.asarray(eyes, np.float64))
        if ups is None:
            ups = np.stack([calculate_up_vector(e, np.asarray(at)) for e in eyes])
        else:
            ups = np.atleast_2d(np.asarray(ups, np.float64))
        at_arr = jnp.broadcast_to(jnp.asarray(at, jnp.float32), (len(eyes), 3))
        rot = jax.vmap(look_at_rotation)(jnp.asarray(eyes, jnp.float32),
                                         at_arr, jnp.asarray(ups, jnp.float32))
        fov = jnp.full((len(eyes),), math.pi * fovy_deg / 180.0, jnp.float32)
        return cls(jnp.asarray(eyes, jnp.float32), rot, fov, res)

    def transform(self, points: jnp.ndarray) -> jnp.ndarray:
        """Project points [N,3] with every camera -> [V,N,3] = (u, v, depth)."""
        return transform_points(self, points)


@jax.jit
def transform_points(cam: Camera, points: jnp.ndarray) -> jnp.ndarray:
    pts = jnp.asarray(points, jnp.float32)
    rel = pts[None, :, :] - cam.eye[:, None, :]            # [V,N,3]
    cam_pts = jnp.einsum("vij,vnj->vni", cam.rot, rel)     # [V,N,3]
    depth = -cam_pts[..., 2]
    inv_tan = 1.0 / jnp.tan(cam.fov * 0.5)
    safe = jnp.maximum(depth, 1e-8)
    u = cam_pts[..., 0] / safe * inv_tan[:, None]
    v = cam_pts[..., 1] / safe * inv_tan[:, None]
    return jnp.stack([u, v, depth], axis=-1)


@jax.jit
def rescale_uvs(transformed: jnp.ndarray, padding: float = 0.15
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Min/max-rescale projected uvs into [padding/2·…] like the reference.

    transformed: [V,N,3] from transform_points.  Returns (uvs [V,N,2] in
    [pad, 1-pad]-ish, depths [V,N]) following DepthPrompting.py:247-261:
    center and scale by the larger uv span, shrink by (1-2·padding),
    shift to [0,1].
    """
    uv = transformed[..., :2]
    lo = uv.min(axis=1, keepdims=True)
    hi = uv.max(axis=1, keepdims=True)
    center = (lo + hi) / 2.0
    scale = (hi - lo).max(axis=2, keepdims=True)
    out = (uv - center) / jnp.maximum(scale, 1e-12)
    out = out * (1.0 - 2.0 * padding) + 0.5
    return out, transformed[..., 2]


_CANONICAL_6 = np.array([
    [0, 0, -1.0], [0, 0, 1.0], [0, -1.0, 0],
    [0, 1.0, 0], [-1.0, 0, 0], [1.0, 0, 0],
])
_CANONICAL_6_UPS = np.array([
    [0, 1.0, 0], [0, 1.0, 0], [0, 0, 1.0],
    [0, 0, 1.0], [0, 1.0, 0], [0, 1.0, 0],
])


def create_cameras(num_views: int = 1024, distance: float = 1.6,
                   fovy: float = 49.1, res: int = 256,
                   distribution: str = "fibonacci_sphere",
                   ) -> Tuple[Camera, np.ndarray]:
    """Camera rig + eye positions (reference: camera_utils.py:115-160).

    num_views == 6 selects the canonical orthogonal rig
    (camera_utils.py:28-84); otherwise a fibonacci sphere.
    """
    if num_views == 6:
        eyes = _CANONICAL_6 * distance
        cam = Camera.from_eyes(eyes, fovy, res, ups=_CANONICAL_6_UPS)
        return cam, eyes
    eyes = fibonacci_sphere(num_views, distance)
    return Camera.from_eyes(eyes, fovy, res), eyes


# ----------------------------------------------------------- orbit camera

def look_at_pose(campos, target=(0, 0, 0), opengl=True) -> np.ndarray:
    """Camera->world rotation (reference: utils/cam_utils.py:24-41)."""
    campos = np.asarray(campos, np.float64)
    target = np.asarray(target, np.float64)
    if opengl:
        forward = campos - target
    else:
        forward = target - campos
    forward /= np.linalg.norm(forward) + 1e-12
    right = np.cross(np.array([0.0, 1.0, 0.0]), forward)
    if np.linalg.norm(right) < 1e-9:
        right = np.array([1.0, 0.0, 0.0])
    right /= np.linalg.norm(right)
    up = np.cross(forward, right)
    return np.stack([right, up, forward], axis=1)


def orbit_camera(elevation_deg: float, azimuth_deg: float, radius: float = 1.0,
                 is_degree: bool = True, target=None, opengl: bool = True
                 ) -> np.ndarray:
    """Elevation/azimuth -> 4x4 camera pose (reference: cam_utils.py:45-62)."""
    el = math.radians(elevation_deg) if is_degree else elevation_deg
    az = math.radians(azimuth_deg) if is_degree else azimuth_deg
    x = radius * math.cos(el) * math.sin(az)
    y = -radius * math.sin(el)
    z = radius * math.cos(el) * math.cos(az)
    campos = np.array([x, y, z])
    if target is None:
        target = np.zeros(3)
    campos = campos + target
    T = np.eye(4)
    T[:3, :3] = look_at_pose(campos, target, opengl)
    T[:3, 3] = campos
    return T


class OrbitCamera:
    """Interactive orbit camera state (reference: cam_utils.py:65-146)."""

    def __init__(self, W, H, r=2.0, fovy=60.0, near=0.01, far=100.0):
        self.W, self.H = W, H
        self.radius = r
        self.fovy = math.radians(fovy)
        self.near, self.far = near, far
        self.center = np.zeros(3)
        self.elevation = 0.0
        self.azimuth = 0.0

    @property
    def fovx(self):
        return 2 * math.atan(math.tan(self.fovy / 2) * self.W / self.H)

    @property
    def campos(self):
        return self.pose[:3, 3]

    @property
    def pose(self):
        return orbit_camera(self.elevation, self.azimuth, self.radius,
                            is_degree=True, target=self.center)

    @property
    def view(self):
        return np.linalg.inv(self.pose)

    @property
    def perspective(self):
        y = math.tan(self.fovy / 2)
        aspect = self.W / self.H
        n, f = self.near, self.far
        return np.array([
            [1 / (y * aspect), 0, 0, 0],
            [0, -1 / y, 0, 0],
            [0, 0, -(f + n) / (f - n), -(2 * f * n) / (f - n)],
            [0, 0, -1, 0],
        ], dtype=np.float32)

    @property
    def intrinsics(self):
        focal = self.H / (2 * math.tan(self.fovy / 2))
        return np.array([focal, focal, self.W // 2, self.H // 2], np.float32)

    @property
    def mvp(self):
        return self.perspective @ np.linalg.inv(self.pose)

    def orbit(self, dx, dy):
        self.azimuth -= 0.05 * dx
        self.elevation -= 0.05 * dy

    def scale(self, delta):
        self.radius *= 1.1 ** (-delta)

    def pan(self, dx, dy, dz=0):
        self.center += 0.0005 * self.pose[:3, :3] @ np.array([-dx, -dy, dz])
