"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on host CPU devices
(xla_force_host_platform_device_count); real-TPU runs happen via bench.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("GENPC_IMPL", "xla")   # pin hot ops to the XLA path
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# In this container a sitecustomize force-registers the TPU backend and
# ignores JAX_PLATFORMS; route computation to CPU devices explicitly so the
# suite exercises the virtual 8-device mesh (real-TPU parity checks live in
# test_tpu_kernels.py and bench.py).
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except Exception:
    pass

REFERENCE_DATA = "/root/reference/data"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def redwood_pair():
    """A small real partial/GT pair (downsampled for test speed)."""
    from genpc_tpu.io.ply import load_xyz
    partial, _ = load_xyz(f"{REFERENCE_DATA}/01184.ply")
    gt, _ = load_xyz(f"{REFERENCE_DATA}/GT/01184.ply")
    return partial, gt
