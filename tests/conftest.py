"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated on host CPU devices
(xla_force_host_platform_device_count); real-TPU runs happen via bench.py.
"""

import hashlib
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("GENPC_IMPL", "xla")   # pin hot ops to the XLA path
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Host-fingerprinted compilation cache for the CPU suite.  The shared
# repo cache (.jax_cache) accumulates XLA:CPU AOT results from OTHER
# machines (driver/judge hosts with different CPU features); loading a
# foreign entry warns "Target machine feature +prefer-no-scatter is not
# supported on the host machine ... SIGILL" and has produced real
# segfaults inside compile_or_get_cached mid-suite (ADVICE r2 #1 called
# out the numeric-drift form of the same problem).  Keying the cache
# dir by /proc/cpuinfo flags keeps re-runs on THIS host fast and never
# loads another machine's AOT code.  bench/TPU runs are unaffected
# (TPU executables are machine-portable; this only scopes the tests).
if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
    try:
        with open("/proc/cpuinfo") as f:
            cpu = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        cpu = ""
    fp = hashlib.sha1(cpu.encode()).hexdigest()[:12]
    os.environ["JAX_COMPILATION_CACHE_DIR"] = \
        f"/tmp/genpc_jax_cache_cpu_{fp}"

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


@pytest.fixture(scope="module", autouse=True)
def _free_executables_between_modules():
    """Drop compiled executables after each test module.

    Every XLA:CPU executable holds multiple memory mappings for the
    life of the process; a full-suite run accumulates ~68k maps and
    SEGFAULTS inside LLVM once vm.max_map_count (default 65530) is
    exhausted — observed as 8 'failures' + a fatal crash around
    test_towers_parity.  Clearing jit caches at module teardown bounds
    the live set to one module's worth; the persistent per-host
    compilation cache makes cross-module re-traces cheap disk loads."""
    yield
    jax.clear_caches()


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
