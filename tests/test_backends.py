"""Backend registry coverage + inpainter dispatch.

Every documented backend name must construct (VERDICT r1: the broken
instantmesh registry import survived 110 green tests because nothing
iterated the registries).  Generation itself is exercised at tiny size
for the non-synthetic backends elsewhere; here we verify construction and
the generate/call contract end-to-end for each family once.
"""

import numpy as np
import pytest

from genpc_tpu.config import load_config
from genpc_tpu.models.backends import (
    get_depth2image, get_image23d, get_rembg)

TINY = load_config(model_size="tiny", save=False, output_path="/tmp/ws")


@pytest.mark.parametrize("name", ["synthetic", "controlnet", "adapter",
                                  "flux", "qwen"])
def test_depth2image_registry_constructs(name):
    backend = get_depth2image(name, TINY)
    assert hasattr(backend, "generate")


@pytest.mark.parametrize("name", ["synthetic", "rembg", "RMBG", "rmbg"])
def test_rembg_registry_constructs(name):
    backend = get_rembg(name, TINY)
    assert callable(backend)


@pytest.mark.parametrize("name", ["synthetic", "instantmesh", "trellis",
                                  "trellis_2", "sf3d"])
def test_image23d_registry_constructs(name):
    backend = get_image23d(name, TINY)
    assert callable(backend)


def test_image23d_unported_names_raise_cleanly():
    with pytest.raises(ValueError):
        get_image23d("nonsense", TINY)
    with pytest.raises(ValueError):
        get_depth2image("nonsense", TINY)
    with pytest.raises(ValueError):
        get_rembg("nonsense", TINY)


@pytest.mark.parametrize("name", ["trellis", "sf3d"])
def test_image23d_backend_generates_mesh(name):
    backend = get_image23d(name, TINY)
    rng = np.random.default_rng(0)
    img = rng.random((64, 64, 4)).astype(np.float32)
    mesh = backend("testflag", img)
    assert mesh.vertices.ndim == 2 and mesh.vertices.shape[1] == 3
    assert mesh.faces.ndim == 2 and mesh.faces.shape[1] == 3
    assert len(mesh.vertices) >= 3
    assert np.all(np.abs(mesh.vertices) <= 1.0 + 1e-5)
    assert mesh.vertex_colors.shape == mesh.vertices.shape


# ------------------------------------------------------- inpainter switch

def _raw_depth_and_masks():
    rng = np.random.default_rng(1)
    img = rng.random((3, 32, 32)).astype(np.float32)
    m1 = np.zeros((32, 32), np.float32)
    m1[10:14, 10:14] = 1.0
    m2 = np.zeros((32, 32), np.float32)
    m2[8:16, 8:16] = 1.0
    return img, m1, m2


def test_ddnm_inpainter_dispatch():
    """inpainter: DDNM must construct DDNMInpainter (ref DepthPrompting.py
    :25-28) and honor data consistency on the m2-known region."""
    from genpc_tpu.models.ddnm import DDNMInpainter
    from genpc_tpu.pipeline.depth_prompting import DepthPrompting
    cfg = load_config(inpainter="DDNM", model_size="tiny", save=False,
                      output_path="/tmp/ws", view_num=8,
                      control_model="synthetic")
    dp = DepthPrompting(cfg)
    assert isinstance(dp.inpainter, DDNMInpainter)
    img, m1, m2 = _raw_depth_and_masks()
    out = dp.inpainter.inpaint(img, m2)
    known = m2 < 0.5
    np.testing.assert_allclose(out[:, known], img[:, known], atol=1e-3)


def test_flux_inpainter_dispatch():
    """inpainter: flux must construct the FLUX painter (ref :21-24) and
    keep known pixels exactly (final composite)."""
    from genpc_tpu.models.dit_depth import FluxInpainter
    from genpc_tpu.pipeline.depth_prompting import DepthPrompting
    cfg = load_config(inpainter="flux", model_size="tiny", save=False,
                      output_path="/tmp/ws", view_num=8,
                      control_model="synthetic")
    dp = DepthPrompting(cfg)
    assert isinstance(dp.inpainter, FluxInpainter)
    img, m1, _ = _raw_depth_and_masks()
    out = dp.inpainter.paint(img, m1, size=32, steps=2)
    known = m1 < 0.5
    np.testing.assert_allclose(out[:, known], img[:, known], atol=1e-3)
    assert out.shape == img.shape


def test_unknown_inpainter_raises():
    from genpc_tpu.pipeline.depth_prompting import DepthPrompting
    cfg = load_config(inpainter="bogus", save=False, output_path="/tmp/ws",
                      view_num=8, control_model="synthetic")
    with pytest.raises(NotImplementedError):
        DepthPrompting(cfg)
