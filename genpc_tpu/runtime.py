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


_FORCED_IMPL: str | None = None


class force_impl:
    """Trace-time impl override: ``with force_impl('xla'): jitted(...)``.

    Kernel dispatch (use_pallas) is read while a jitted function TRACES,
    so wrapping every call site of a jit keeps the choice in force across
    retraces.  Used by the pose optimizer: its 52-way-vmapped chamfer
    loss faults the Mosaic kernel, and at 2k×2k the dense XLA expansion
    is the better MXU program anyway.
    """

    def __init__(self, impl: str):
        self.impl = impl

    def __enter__(self):
        global _FORCED_IMPL
        self._prev = _FORCED_IMPL
        _FORCED_IMPL = self.impl
        return self

    def __exit__(self, *exc):
        global _FORCED_IMPL
        _FORCED_IMPL = self._prev
        return False


def use_pallas() -> bool:
    impl = _FORCED_IMPL or os.environ.get("GENPC_IMPL", "auto")
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
