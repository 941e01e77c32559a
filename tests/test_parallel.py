"""Multi-device tests on the virtual 8-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genpc_tpu.parallel.mesh import make_mesh, sharded_chamfer_l1
from genpc_tpu.metrics.losses import chamfer_l1


def _cpu_devices(n):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} cpu devices")
    return devs


def test_make_mesh_shapes():
    devs = _cpu_devices(8)
    mesh = make_mesh({"dp": 4, "sp": 2}, devices=devs)
    assert mesh.axis_names == ("dp", "sp")
    assert mesh.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh({"dp": 64}, devices=devs)


def test_sharded_chamfer_matches_single_device(rng):
    devs = _cpu_devices(8)
    mesh = make_mesh({"dp": 4, "sp": 2}, devices=devs)
    x = jnp.asarray(rng.random((512, 3)), jnp.float32)
    y = jnp.asarray(rng.random((512, 3)), jnp.float32)
    sharded = float(sharded_chamfer_l1(x, y, mesh, axis="sp"))
    single = float(chamfer_l1(x, y))
    assert abs(sharded - single) < 1e-5


def test_batched_pose_step_runs_on_mesh():
    from genpc_tpu.parallel.mesh import batched_pose_step
    devs = _cpu_devices(8)
    mesh = make_mesh({"dp": 4, "sp": 2}, devices=devs)
    step, make_example, shardings = batched_pose_step(mesh)
    params, opt_state, comp, comp_col, partial, render_size = make_example(
        batch=8, n_complete=128, n_partial=64, render_size=16)
    args = shardings(params, opt_state, comp, comp_col, partial)
    jitted = jax.jit(lambda p, o, c, cc, pa: step(
        p, o, c, cc, pa, jnp.float32(0.05), 16))
    with mesh:
        out_params, out_state, losses = jitted(*args)
    losses = np.asarray(losses)
    assert losses.shape == (8,)
    assert np.isfinite(losses).all()
    # params actually moved
    d = np.abs(np.asarray(out_params["rot6d"]) - np.asarray(params["rot6d"]))
    assert d.max() > 0
