import numpy as np
import jax.numpy as jnp

from genpc_tpu.geometry.cameras import (
    Camera, create_cameras, fibonacci_sphere, rescale_uvs, transform_points,
    orbit_camera, OrbitCamera)
from genpc_tpu.geometry.transforms import (
    axis_angle_to_matrix, build_transform, get_rotate_matrix,
    matrix_to_rotation_6d, rotation_6d_to_matrix, rot6d_from_axis_angle,
    apply_transform, invert_se3)
from genpc_tpu.geometry.normalize import normalize_points


def test_fibonacci_sphere_radius():
    pts = fibonacci_sphere(1024, 1.6)
    assert pts.shape == (1024, 3)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.6, rtol=1e-6)
    # y spans 1.6 .. -1.6 like the reference (camera_utils.py:87-100)
    assert abs(pts[0, 1] - 1.6) < 1e-9 and abs(pts[-1, 1] + 1.6) < 1e-9


def test_camera_rig_projection_center():
    cam, eyes = create_cameras(num_views=16, distance=1.6, fovy=49.1, res=256)
    assert len(cam) == 16 and eyes.shape == (16, 3)
    # the origin projects to uv (0,0) with depth = distance for every view
    out = transform_points(cam, jnp.zeros((1, 3)))
    np.testing.assert_allclose(np.asarray(out[:, 0, :2]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[:, 0, 2]), 1.6, rtol=1e-5)


def test_camera_canonical_6():
    cam, eyes = create_cameras(num_views=6, distance=2.0, fovy=49.1, res=128)
    assert len(cam) == 6
    np.testing.assert_allclose(np.abs(eyes).max(axis=1), 2.0)
    # front camera at -z: a point at +x world should project u<0 or u>0
    # consistently and be closer when moved toward the camera
    p = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 0.0]])
    out = transform_points(cam[0], p)
    assert float(out[0, 0, 2]) < float(out[0, 1, 2])  # nearer -> smaller depth


def test_rescale_uvs_range():
    rng = np.random.default_rng(0)
    cam, _ = create_cameras(num_views=4, distance=1.6, fovy=49.1, res=256)
    pts = jnp.asarray(rng.normal(size=(500, 3)) * 0.3, jnp.float32)
    transformed = transform_points(cam, pts)
    uvs, depths = rescale_uvs(transformed, padding=0.15)
    uvs = np.asarray(uvs)
    # reference contract: uvs span exactly [0.05, 0.95] on the larger axis
    assert uvs.min() >= 0.05 - 1e-5 and uvs.max() <= 0.95 + 1e-5
    spans = uvs.max(axis=1) - uvs.min(axis=1)
    np.testing.assert_allclose(spans.max(axis=1), 0.7, atol=1e-5)


def test_rotation_6d_roundtrip():
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.normal(size=(3,)), jnp.float32)
    R = axis_angle_to_matrix(v)
    Rnp = np.asarray(R)
    np.testing.assert_allclose(Rnp @ Rnp.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(Rnp), 1.0, atol=1e-5)
    d6 = matrix_to_rotation_6d(R)
    R2 = rotation_6d_to_matrix(d6)
    np.testing.assert_allclose(np.asarray(R2), Rnp, atol=1e-5)


def test_rot6d_init_matches_get_rotate_matrix():
    # y-axis 90° via the 6D path equals the numpy helper
    R6 = np.asarray(rotation_6d_to_matrix(rot6d_from_axis_angle("y", 90)))
    Rnp = get_rotate_matrix("y", 90)
    np.testing.assert_allclose(R6, Rnp, atol=1e-6)


def test_build_transform_and_inverse():
    R = jnp.asarray(get_rotate_matrix("z", 30), jnp.float32)
    T = build_transform(R, jnp.array([0.1, -0.2, 0.3]), 0.75)
    pts = jnp.asarray(np.random.default_rng(2).normal(size=(10, 3)), jnp.float32)
    fwd = apply_transform(T, pts)
    back = apply_transform(invert_se3(T), fwd)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


def test_normalize_points_range_half():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(100, 3)) * np.array([3.0, 1.0, 0.5]) + 5.0
    out, center, scale = normalize_points(pts, range=0.5)
    out = np.asarray(out)
    ext = out.max(axis=0) - out.min(axis=0)
    # largest extent maps to exactly 1.0, centered at 0
    np.testing.assert_allclose(ext.max(), 1.0, rtol=1e-5)
    np.testing.assert_allclose((out.max(axis=0) + out.min(axis=0)) / 2, 0.0,
                               atol=1e-6)


def test_orbit_camera_pose():
    T = orbit_camera(0.0, 0.0, radius=2.0)
    np.testing.assert_allclose(T[:3, 3], [0, 0, 2], atol=1e-9)
    cam = OrbitCamera(640, 480, r=2.0)
    assert cam.mvp.shape == (4, 4)
    assert cam.intrinsics.shape == (4,)
