import numpy as np
import pytest

from genpc_tpu.io.ply import load_ply, load_xyz, save_ply
from genpc_tpu.io.glb import Mesh, load_glb, save_glb, sample_mesh_surface, glb_to_points


def test_load_reference_ply():
    pts, colors = load_ply("/root/reference/data/01184.ply")
    assert pts.shape == (71372, 3)
    assert np.isfinite(pts).all()
    # redwood partials carry no colors
    assert colors is None


def test_ply_roundtrip_xyz(tmp_path):
    pts = np.random.default_rng(0).normal(size=(100, 3))
    save_ply(str(tmp_path / "a.ply"), pts)
    back, colors = load_ply(str(tmp_path / "a.ply"))
    np.testing.assert_allclose(back, pts, rtol=0, atol=0)
    assert colors is None


def test_ply_roundtrip_rgb(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(64, 3))
    cols = rng.random((64, 3))
    save_ply(str(tmp_path / "c.ply"), pts, cols)
    back, bcols = load_ply(str(tmp_path / "c.ply"))
    np.testing.assert_allclose(back, pts)
    assert np.abs(bcols - cols).max() < 1 / 255 + 1e-9


def test_load_xyz_fallback_colors():
    pts, cols = load_xyz("/root/reference/data/01184.ply")
    assert cols.shape == pts.shape
    assert cols.min() >= 0 and cols.max() <= 1
    # fallback colors are coordinate-normalized (reference dataUtils.py:185-188)
    assert not np.allclose(cols, cols[0])


def _unit_tetra():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    f = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)
    c = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]], np.float32)
    return Mesh(v, f, c)


def test_glb_roundtrip(tmp_path):
    mesh = _unit_tetra()
    path = str(tmp_path / "m.glb")
    save_glb(path, mesh)
    back = load_glb(path)
    np.testing.assert_allclose(back.vertices, mesh.vertices, atol=1e-6)
    np.testing.assert_array_equal(back.faces, mesh.faces)
    np.testing.assert_allclose(back.vertex_colors, mesh.vertex_colors, atol=1e-6)


def test_mesh_sampling_barycentric(tmp_path):
    mesh = _unit_tetra()
    pts, cols = sample_mesh_surface(mesh, 2000)
    assert pts.shape == (2000, 3)
    assert cols.shape == (2000, 3)
    # all samples lie within the tetra bounding box
    assert pts.min() >= -1e-5 and pts.max() <= 1 + 1e-5
    path = str(tmp_path / "m.glb")
    save_glb(path, mesh)
    pts2, cols2 = glb_to_points(path, num_points=500)
    assert pts2.shape == (500, 3)


def test_glb_sampling_area_weighted(tmp_path):
    # two triangles, one 100x larger: samples should mostly land on it
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                  [10, 0, 0], [30, 0, 0], [10, 20, 0]], np.float32)
    f = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    mesh = Mesh(v, f, np.ones((6, 3), np.float32))
    pts, _ = sample_mesh_surface(mesh, 1000)
    frac_big = np.mean(pts[:, 0] > 5)
    assert frac_big > 0.95
