"""Multi-chip execution: object data-parallelism + point-dim sharding.

The reference is a single-GPU per-object pipeline (SURVEY §2.3: the only
multi-GPU construct is a pass-through DataParallel wrapper).  The natural
TPU scaling story is:
  * **dp** — objects are embarrassingly parallel: shard the object batch
    across chips over ICI (13 redwood / ~110 waymo objects on a v5e-8);
  * **sp** — large-N pairwise ops (Chamfer/EMD/ICP correspondences) shard
    the point dimension: each chip owns a row slice of cloud A and the
    full cloud B, so d1 needs no collective and d2 reduces with a
    min-all-gather — the honest "sequence parallel" for this workload.

Everything here is standard jax.sharding + shard_map; XLA inserts the ICI
collectives.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from genpc_tpu.ops.chamfer import _nn_xla


def make_mesh(shape: Dict[str, int], devices=None) -> Mesh:
    """Create a named mesh, e.g. make_mesh({'dp': 4, 'sp': 2})."""
    devices = devices if devices is not None else jax.devices()
    n = int(np.prod(list(shape.values())))
    if len(devices) < n:
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(tuple(shape.values()))
    return Mesh(arr, tuple(shape.keys()))


def get_mesh(cfg) -> Optional[Mesh]:
    """Build the device mesh from cfg.mesh_shape (None -> single device).

    cfg.mesh_shape is e.g. {'dp': 8} (object data-parallelism) — the
    production integration point for multi-chip runs (drivers honor it via
    parallel/batched_runner.py).
    """
    shape = cfg.get("mesh_shape") if hasattr(cfg, "get") else None
    if not shape:
        return None
    return make_mesh(dict(shape))


def dp_size(mesh: Optional[Mesh]) -> int:
    """Size of the object-parallel axis (1 without a mesh)."""
    if mesh is None or "dp" not in mesh.axis_names:
        return 1
    return mesh.shape["dp"]


def dp_sharded(mesh: Optional[Mesh], *arrays):
    """device_put arrays with the batch axis sharded over dp.

    Inputs sharded this way make every downstream jitted vmapped program
    (pose optimization, ICP sweeps, metrics) partition its object axis
    across chips — XLA GSPMD handles the rest; no per-program changes.
    """
    if mesh is None:
        return arrays if len(arrays) > 1 else arrays[0]
    spec = NamedSharding(mesh, P("dp"))
    out = tuple(jax.device_put(a, spec) for a in arrays)
    return out if len(out) > 1 else out[0]


def sharded_chamfer_l1(x: jnp.ndarray, y: jnp.ndarray, mesh: Mesh,
                       axis: str = "sp") -> jnp.ndarray:
    """Chamfer-L1 with cloud rows sharded over ``axis``.

    x [N,3], y [M,3], N and M divisible by the axis size.  Each device
    scans the full opposite cloud against its row shard; the two one-sided
    means are psum-reduced.  No N×M tensor ever exists.
    """
    def local(xs, ys):
        # xs: [N/s, 3] shard, ys: [M/s, 3] shard
        x_full = jax.lax.all_gather(xs, axis, tiled=True)
        y_full = jax.lax.all_gather(ys, axis, tiled=True)
        d1, _ = _nn_xla(xs[None], y_full[None])
        d2, _ = _nn_xla(ys[None], x_full[None])
        s1 = jax.lax.psum(jnp.sqrt(jnp.maximum(d1[0], 0.0)).sum(), axis)
        s2 = jax.lax.psum(jnp.sqrt(jnp.maximum(d2[0], 0.0)).sum(), axis)
        return s1, s2

    other = tuple(a for a in mesh.axis_names if a != axis)
    s1, s2 = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=(P(), P()),
        check_rep=False,
    )(x, y)
    n, m = x.shape[0], y.shape[0]
    return (s1 / n + s2 / m) / 2.0


def tp_sharded_dit_forward(mesh: Mesh, tp_axis: str = "tp"):
    """Run one MMDiT forward with its wide kernels tensor-parallel.

    This is the sharding FLUX.1-Depth-dev (12B) and Qwen-Image (20B)
    need to fit v5e chips at all (16 GB HBM vs 24/40 GB bf16 weights —
    see bench_neural.memory_notes): models/layers.py:tp_dense annotates
    every attention/MLP kernel with logical axes ("embed","tp"); here
    the logical "tp" axis maps onto the mesh axis, flax materializes the
    PartitionSpecs, and XLA GSPMD inserts the ICI collectives.  Returns
    (output, n_sharded_params) for validation.
    """
    import flax.linen as nn
    from genpc_tpu.models.dit import DiTConfig, MMDiT

    cfg = DiTConfig.preset("tiny")
    model = MMDiT(cfg)
    lat = jnp.zeros((1, 8, 8, cfg.in_channels))
    cond = jnp.zeros((1, 8, 8, cfg.cond_channels))
    txt = jnp.zeros((1, 16, cfg.text_dim))
    pooled = jnp.zeros((1, cfg.pooled_dim))
    t = jnp.full((1,), 0.5)
    g = jnp.ones((1,))

    rules = (("embed", None), ("tp", tp_axis))
    abstract = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), lat, t, txt, pooled=pooled,
        cond_latents=cond, guidance=g))
    specs = nn.get_partition_spec(abstract)
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, nn.logical_to_mesh_axes(s, rules)),
        specs, is_leaf=lambda x: isinstance(x, P))
    with mesh:
        params = jax.jit(
            lambda: nn.meta.unbox(model.init(
                jax.random.PRNGKey(0), lat, t, txt, pooled=pooled,
                cond_latents=cond, guidance=g)),
            out_shardings=nn.meta.unbox(shardings))()
        out = jax.jit(lambda p: model.apply(
            p, lat, t, txt, pooled=pooled, cond_latents=cond,
            guidance=g))(params)
        jax.block_until_ready(out)
    n_sharded = sum(
        1 for leaf in jax.tree.leaves(params)
        if hasattr(leaf, "sharding")
        and f"'{tp_axis}'" in str(leaf.sharding.spec))
    return out, n_sharded


def batched_pose_step(mesh: Mesh, batch_axis: str = "dp"):
    """Build a jitted, dp-sharded batched pose-optimization step.

    Returns (step_fn, make_example) where step_fn(params, clouds) performs
    one Adam step of the Stage-3 pose optimization for a BATCH of objects,
    the batch dimension sharded over ``batch_axis``.  This is the
    framework's "training step": render + loss + grad + update, vmapped
    over objects, partitioned over chips.
    """
    import optax
    from genpc_tpu.registration.pose_optim import pose_loss
    from genpc_tpu.render.point_renderer import RenderCamera

    tx = optax.adam(1e-2)

    def single(params, opt_state, comp, comp_col, partial, radius, render_size):
        camera = RenderCamera.default(render_size)
        from genpc_tpu.render.point_renderer import render_points, hard_mask
        ref_img = render_points(partial, jnp.full_like(partial, 0.7),
                                radius, camera)
        ref_mask = hard_mask(ref_img)
        center = comp.mean(axis=0)
        loss, grads = jax.value_and_grad(pose_loss)(
            params, comp, comp_col, center, partial, ref_img, ref_mask,
            camera, radius)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def step(params, opt_state, comp, comp_col, partial, radius, render_size):
        return jax.vmap(
            lambda p, o, c, cc, pa: single(p, o, c, cc, pa, radius,
                                           render_size)
        )(params, opt_state, comp, comp_col, partial)

    def make_example(batch: int, n_complete: int = 256, n_partial: int = 128,
                     render_size: int = 32):
        from genpc_tpu.geometry.transforms import rot6d_from_axis_angle
        rng = np.random.default_rng(0)
        params = {
            "rot6d": jnp.tile(rot6d_from_axis_angle("y", 0.0)[None], (batch, 1)),
            "trans": jnp.zeros((batch, 3), jnp.float32),
            "log_scale": jnp.tile(jnp.log(jnp.full((1, 1), 0.75, jnp.float32)),
                                  (batch, 1)),
        }
        opt_state = jax.vmap(tx.init)(params)
        comp = jnp.asarray(rng.normal(size=(batch, n_complete, 3)) * 0.3,
                           jnp.float32)
        comp_col = jnp.full((batch, n_complete, 3), 0.6, jnp.float32)
        partial = jnp.asarray(rng.normal(size=(batch, n_partial, 3)) * 0.3,
                              jnp.float32)
        return params, opt_state, comp, comp_col, partial, render_size

    def shardings(params, opt_state, comp, comp_col, partial):
        dp = NamedSharding(mesh, P(batch_axis))
        dp_pts = NamedSharding(mesh, P(batch_axis, "sp", None)) \
            if "sp" in mesh.axis_names else NamedSharding(mesh, P(batch_axis))
        rep = NamedSharding(mesh, P())
        put = lambda t, s: jax.tree.map(lambda a: jax.device_put(a, s), t)
        return (put(params, dp), put(opt_state, dp), put(comp, dp_pts),
                put(comp_col, dp_pts), put(partial, dp_pts))

    return step, make_example, shardings
