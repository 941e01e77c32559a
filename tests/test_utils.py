import numpy as np
import pytest

from genpc_tpu.metrics.image_metrics import fid, mse, psnr, ssim
from genpc_tpu.utils_logging import get_logger


def test_psnr_ssim_identity():
    img = np.random.default_rng(0).random((32, 32, 3)).astype(np.float32)
    assert float(psnr(img, img)) > 100
    assert abs(float(ssim(img, img)) - 1.0) < 1e-5


def test_psnr_ordering():
    rng = np.random.default_rng(0)
    img = rng.random((32, 32, 3)).astype(np.float32)
    small = np.clip(img + rng.normal(0, 0.01, img.shape), 0, 1)
    big = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1)
    assert float(psnr(img, small)) > float(psnr(img, big))
    assert float(ssim(img, small)) > float(ssim(img, big))


def test_fid_sanity():
    rng = np.random.default_rng(0)
    a = rng.random((8, 16, 16, 3))
    b = a + rng.normal(0, 0.01, a.shape)
    c = rng.random((8, 16, 16, 3)) * 0.2
    assert fid(a, b) < fid(a, c)


def test_logger(tmp_path):
    log = get_logger("test_genpc", str(tmp_path / "x.log"))
    log.info("hello")
    assert (tmp_path / "x.log").read_text().strip().endswith("hello")


def test_native_ops_or_fallback():
    # native build is optional; if it loads, it must match numpy exactly
    try:
        from genpc_tpu.native import fps_sample_native, voxel_down_sample_native
    except ImportError:
        pytest.skip("native host ops not built")
    from genpc_tpu.ops.fps import fps_numpy
    rng = np.random.default_rng(0)
    pts = rng.random((3000, 3)).astype(np.float32)
    np.testing.assert_array_equal(fps_sample_native(pts, 128),
                                  fps_numpy(pts, 128))
    p = rng.random((5000, 3))
    op, _ = voxel_down_sample_native(p, 0.1)
    mn = p.min(0)
    key = np.floor((p - mn) / 0.1).astype(np.int64)
    nvox = len(np.unique((key[:, 0] << 42) | (key[:, 1] << 21) | key[:, 2]))
    assert len(op) == nvox


def test_lidar_scan_listing():
    from genpc_tpu.main_lidar import list_scans
    flags = list_scans("/root/reference/data/waymo", "CAR", limit=3)
    assert len(flags) == 3
    assert all(f.startswith("CAR_") for f in flags)


def test_stage_timer():
    import time as _t
    from genpc_tpu.tracing import StageTimer
    timer = StageTimer()
    with timer.span("a"):
        with timer.span("b"):
            _t.sleep(0.01)
    d = timer.as_dict()
    assert "a" in d and "a/b" in d
    assert d["a"][0] >= d["a/b"][0] >= 0.01
    assert d["a"][1] == 1


def test_evaluate_mesh_bbox_normalization():
    from genpc_tpu.io.glb import Mesh
    from genpc_tpu.metrics.metric import evaluate_mesh
    from genpc_tpu.ops.marching import marching_tetrahedra
    # a sphere mesh scaled/shifted away from a sphere GT cloud: bbox
    # normalization must bring CD near zero
    g = np.linspace(-1, 1, 24)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    v, f = marching_tetrahedra(0.5 - np.sqrt(X**2 + Y**2 + Z**2))
    mesh = Mesh((v * 3.0 + 2.0).astype(np.float32), f,
                np.full((len(v), 3), 0.5, np.float32))
    rng = np.random.default_rng(0)
    gt = rng.normal(size=(5000, 3))
    gt = (gt / np.linalg.norm(gt, axis=1, keepdims=True) * 0.5).astype(np.float32)
    m = evaluate_mesh(mesh, gt, num_points=2048)
    assert m["cd"] < 0.05
