"""Tests for the auxiliary toolkit: SH, image ops, mesh utils, segmentation,
densify."""

import numpy as np
import jax.numpy as jnp
import pytest

from genpc_tpu.geometry.sh import eval_sh, rgb_to_sh, sh_to_rgb
from genpc_tpu.geometry.densify import linear_interpolation, random_add_points
from genpc_tpu.geometry.mesh_utils import (
    clean_mesh, decimate_mesh, estimate_normals, poisson_reconstruct,
    weld_vertices)
from genpc_tpu.io.glb import Mesh
from genpc_tpu.render.image_ops import (
    bilateral_filter, dilate, erode, fill_hole, naive_inpainting,
    scharr_edges, cat_images)
from genpc_tpu.models.segmentation import (
    ConnectedComponentSegmenter, crop_center_object, dedup_masks, mask_iou,
    match_masks, process_scene_image)


def test_sh_roundtrip():
    rgb = jnp.asarray(np.random.default_rng(0).random((10, 3)))
    np.testing.assert_allclose(np.asarray(sh_to_rgb(rgb_to_sh(rgb))),
                               np.asarray(rgb), atol=1e-6)


def test_sh_degree0_is_constant():
    sh = jnp.ones((5, 3, 1))
    dirs = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)))
    out = eval_sh(0, sh, dirs)
    np.testing.assert_allclose(np.asarray(out), 0.28209479, rtol=1e-6)


def test_morphology():
    m = jnp.zeros((16, 16)).at[8, 8].set(1.0)
    d = np.asarray(dilate(m, 1))
    assert d.sum() == 9
    e = np.asarray(erode(jnp.asarray(d), 1))
    assert e.sum() == 1
    # a ring with a hole closes
    ring = np.zeros((16, 16), np.float32)
    ring[6:11, 6:11] = 1
    ring[8, 8] = 0
    closed = np.asarray(fill_hole(jnp.asarray(ring), 1))
    assert closed[8, 8] == 1.0


def test_naive_inpainting():
    img = np.ones((16, 16, 3)) * 0.5
    img[8, 8] = 0
    mask = np.zeros((16, 16))
    mask[8, 8] = 1
    out = naive_inpainting(img, mask)
    np.testing.assert_allclose(out[8, 8], 0.5, atol=1e-6)


def test_scharr_and_bilateral():
    img = np.zeros((16, 16, 3), np.float32)
    img[:, 8:] = 1.0
    e = np.asarray(scharr_edges(jnp.asarray(img)))
    assert e[:, 7:9].max() > e[:, 0:4].max() + 1
    sm = np.asarray(bilateral_filter(jnp.asarray(img)))
    # edge preserved
    assert sm[8, 6, 0] < 0.3 and sm[8, 10, 0] > 0.7


def test_cat_images():
    a = np.zeros((4, 4, 3))
    b = np.ones((4, 4, 3))
    out = cat_images([a, b], axis=1, pad=2)
    assert out.shape == (4, 10, 3)


def _tetra_mesh():
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    f = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)
    return Mesh(v, f, np.ones((4, 3), np.float32) * 0.5)


def test_weld_and_clean():
    m = _tetra_mesh()
    # duplicate a vertex
    v = np.concatenate([m.vertices, m.vertices[:1] + 1e-9])
    f = m.faces.copy()
    f[0, 0] = 4
    dup = Mesh(v, f, np.ones((5, 3), np.float32))
    welded = weld_vertices(dup)
    assert len(welded.vertices) == 4
    cleaned = clean_mesh(dup, min_component_faces=1)
    assert len(cleaned.faces) == 4


def test_decimate():
    # dense sphere mesh from marching tets, decimate hard
    from genpc_tpu.ops.marching import marching_tetrahedra
    g = np.linspace(-1, 1, 32)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    v, f = marching_tetrahedra(0.6 - np.sqrt(X**2 + Y**2 + Z**2))
    mesh = Mesh(v, f, np.ones_like(v) * 0.5)
    dec = decimate_mesh(mesh, 500)
    assert len(dec.faces) < len(f)
    r = np.linalg.norm(dec.vertices, axis=1)
    assert np.abs(r - 0.6).max() < 0.1


def test_normals_and_poisson():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(3000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    n = estimate_normals(v.astype(np.float32))
    # sphere normals point radially
    align = np.abs(np.sum(n * v, axis=1))
    assert align.mean() > 0.95
    mesh = poisson_reconstruct(v, grid_res=48,
                               colors=np.ones_like(v) * 0.5)
    assert len(mesh.vertices) > 100
    r = np.linalg.norm(mesh.vertices, axis=1)
    assert abs(np.median(r) - 1.0) < 0.15


def test_mask_tools():
    a = np.zeros((8, 8)); a[:4] = 1
    b = np.zeros((8, 8)); b[:4] = 1
    c = np.zeros((8, 8)); c[6:] = 1
    assert mask_iou(a, b) == 1.0
    keep = dedup_masks([a, b, c], iou_thresh=0.5)
    assert len(keep) == 2
    assert match_masks([a], [b, c]) == [0, None]


def test_crop_center_and_scene():
    img = np.zeros((64, 64, 3), np.float32)
    img[10:20, 30:45] = 0.8
    mask = (img[..., 0] > 0).astype(np.float32)
    rgba, A, m = crop_center_object(img, mask, out_size=64,
                                    object_ratio=0.85)
    ys, xs = np.nonzero(m > 0.5)
    # object occupies ~85% of the larger dimension, centered
    assert 0.75 < (xs.max() - xs.min() + 1) / 64 < 0.95
    assert abs((xs.max() + xs.min()) / 2 - 32) < 3
    recs = process_scene_image(img)
    assert len(recs) == 1
    assert recs[0]["rgba"].shape == (512, 512, 4)


def test_densify():
    pts = np.random.default_rng(0).random((100, 3)).astype(np.float32)
    out, _ = random_add_points(pts, 350)
    assert len(out) == 350
    more, cols = linear_interpolation(pts, np.ones_like(pts) * 0.5)
    assert len(more) == 200 and len(cols) == 200


# ------------------------------------------------------------- debug vis

def test_vis_actors_renders_png(tmp_path):
    """Headless vtk_basic parity (reference: utils/vtk_basic.py:172,431,
    488,531,797,876): every actor type renders into one PNG."""
    from genpc_tpu.vis import (
        ArrowActor, BoxActor, MeshActor, colorful_pc_actor, pc_actor,
        vis_actors, vis_scenes)
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    mesh = MeshActor(
        vertices=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                          np.float32),
        faces=np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]]),
        vertex_colors=np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1],
                                [1, 1, 0]], np.float32))
    actors = [colorful_pc_actor(pts), pc_actor(pts[:50], color=(1, 0, 0)),
              mesh, BoxActor(np.array([0, 0, 0, 2, 2, 2, 0.3])),
              ArrowActor(np.zeros(3), np.array([0, 0, 1.5]))]
    out = tmp_path / "scene.png"
    img = vis_actors(actors, save_path=str(out), info="debug")
    assert out.exists() and out.stat().st_size > 1000
    assert img.ndim == 3 and img.shape[2] == 3 and img.std() > 1.0

    grid = vis_scenes([actors[:2], actors[2:]], titles=["pc", "geo"])
    assert grid.shape[2] == 3
