"""Backend/runtime selection helpers.

``use_pallas()`` decides whether hot ops lower through Pallas/Mosaic
(TPU) or the pure-XLA fallback.  Overridable with GENPC_IMPL=xla|pallas,
which the test suite uses to pin kernels to the CPU path while the same
process also owns a real TPU backend.
"""

from __future__ import annotations

import os

import jax

def _enable_compilation_cache():
    """Persistent XLA compilation cache — kills cross-process recompiles."""
    import jax
    try:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                   "/root/repo/.jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()


def use_pallas() -> bool:
    """Kernel dispatch, read at TRACE time of each jitted program.

    Process-wide only (GENPC_IMPL env var): a scoped override would be
    unsound because jit caches don't key on it — a same-shape executable
    traced before the override would be silently reused (ADVICE r2 #3;
    the old ``force_impl`` context manager was removed for this reason).
    """
    impl = os.environ.get("GENPC_IMPL", "auto")
    if impl == "xla":
        return False
    if impl == "pallas":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def cpu_mesh_devices(n: int):
    """n CPU devices for virtual-mesh tests (requires the host-count flag)."""
    devs = jax.devices("cpu")
    if len(devs) < n:
        raise RuntimeError(
            f"need {n} cpu devices; run with "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n}")
    return devs[:n]
