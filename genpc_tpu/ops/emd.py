"""Approximate Earth Mover's Distance via the auction algorithm, in XLA.

TPU-native redesign of the reference CUDA extension
``loss_functions/emd/emd_cuda.cu`` (Bertsekas auction: per iteration each
unassigned source point bids best-minus-second-best+eps for its most
valuable target; per target the highest bid wins and evicts the previous
assignee; the final iteration force-assigns all remaining bidders).

The CUDA version's irregular machinery (prefix-sum compaction of
unassigned indices, shared-memory tiling, atomicMax tie-breaks) maps to
dense masked XLA ops:
  * the Bid phase is a row-tiled value computation (3 − ‖x−y‖ − price) with
    a top-2 reduction (lax.top_k) — computed for all rows, masked to the
    unassigned ones (static shapes; on TPU the tile streams through VMEM);
  * GetMax/atomicMax becomes scatter-max over target bins;
  * Assign/eviction becomes two scatters (evictees to −1, winners set).

Contracts preserved from the reference (emd_module.py:1-19):
  inputs [B,N,3] with equal N, coordinates ideally in [0,1] (the value
  offset 3.0 assumes diameter ≤ 3), returns (squared_dists [B,N],
  assignment [B,N] int32); gradient flows to xyz1 only
  (emd_cuda.cu:284-316).  Unlike the CUDA kernel we do not require
  N % 256 == 0 or B ≤ 512.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _bid_phase(x1: jnp.ndarray, x2: jnp.ndarray, price: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """For every source row: (best_target, best_value, second_value).

    Row-tiled so no N² matrix hits HBM; distances via the |x|²+|y|²−2x·y
    expansion so the inner product rides the MXU; best/second-best via two
    masked max passes (lax.top_k sorts and is far slower on TPU).
    """
    n = x1.shape[0]
    m = x2.shape[0]
    tx = min(_round_up(n, 8), 1024)
    n_pad = _round_up(n, tx)
    xp = jnp.pad(x1, ((0, n_pad - n), (0, 0)))
    xt = xp.reshape(n_pad // tx, tx, 3)
    y2 = jnp.sum(x2 * x2, axis=-1)
    cols = jnp.arange(m, dtype=jnp.int32)

    def one_tile(x_tile):
        x2sum = jnp.sum(x_tile * x_tile, axis=-1)
        cross = jnp.dot(x_tile, x2.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        d2 = x2sum[:, None] + y2[None, :] - 2.0 * cross
        v = 3.0 - jnp.sqrt(jnp.maximum(d2, 0.0)) - price[None, :]
        best = jnp.max(v, axis=1)
        bid = jnp.argmax(v, axis=1).astype(jnp.int32)
        masked = jnp.where(cols[None, :] == bid[:, None], -jnp.inf, v)
        better = jnp.max(masked, axis=1)
        return bid, best, better

    bid, best, better = jax.lax.map(one_tile, xt)
    return (bid.reshape(-1)[:n], best.reshape(-1)[:n], better.reshape(-1)[:n])


def _bid_phase_batched(x1: jnp.ndarray, x2: jnp.ndarray,
                       price: jnp.ndarray):
    """[B,n,3]/[B,m,3]/[B,m] -> (bid, best, better) each [B,n].

    On TPU the bid phase runs as a Pallas kernel with VMEM-resident
    value tiles (ops/emd_kernel.py) — measured ~6x over the row-tiled
    XLA version, which streams the [rows, m] value matrix through HBM
    several times per auction iteration."""
    from genpc_tpu.runtime import use_pallas
    if use_pallas():
        from genpc_tpu.ops.emd_kernel import bid_pallas, bid_supported
        if bid_supported(x1.shape[1], x2.shape[1]):
            return bid_pallas(x1, x2, price)
    return jax.vmap(_bid_phase)(x1, x2, price)


def _assign_phase(bid, inc, is_last, state):
    """One object's GetMax/Assign phases (reference emd_cuda.cu:181-215).

    bid/inc [n]; state = (assignment, assignment_inv, price), each [n]."""
    assignment, assignment_inv, price = state
    n = assignment.shape[0]
    rows = jnp.arange(n, dtype=jnp.int32)
    neg_inf = jnp.float32(-1e30)
    unass = assignment == -1
    inc_masked = jnp.where(unass, inc, neg_inf)

    # GetMax: per-target max increment and (a) max bidder
    max_inc = jnp.full((n,), neg_inf, jnp.float32).at[bid].max(inc_masked)
    is_winner = unass & (inc_masked >= max_inc[bid] - 1e-6)
    # deterministic tie-break: highest row index wins
    win_row = jnp.full((n,), -1, jnp.int32).at[bid].max(
        jnp.where(is_winner, rows, -1))
    wins = unass & (is_last | (win_row[bid] == rows))

    # Assign: evict previous holders (except on the last iteration)
    evictee = jnp.where(wins & ~is_last, assignment_inv[bid], -1)
    safe_evictee = jnp.where(evictee >= 0, evictee, n)  # n = dropped
    assignment = jnp.pad(assignment, (0, 1)).at[safe_evictee].set(-1)[:n]
    safe_bid = jnp.where(wins, bid, n)
    assignment_inv = jnp.pad(assignment_inv, (0, 1)).at[safe_bid].set(rows)[:n]
    assignment = jnp.where(wins, bid, assignment)
    price = jnp.pad(price, (0, 1)).at[safe_bid].add(
        jnp.where(wins, inc, 0.0))[:n]
    return assignment, assignment_inv, price


def _emd_batched(x1: jnp.ndarray, x2: jnp.ndarray, eps: float, iters: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched auction: [B,n,3] x [B,n,3] -> (sq_dists [B,n], assignment
    [B,n]).  The bid phase runs natively batched (Pallas kernel on TPU);
    the scatter-based assign phase is vmapped."""
    B, n = x1.shape[0], x1.shape[1]
    x1 = x1.astype(jnp.float32)
    x2 = x2.astype(jnp.float32)

    def body(i, state):
        is_last = i == iters - 1
        bid, best, better = _bid_phase_batched(x1, x2, state[2])
        inc = best - better + eps
        return jax.vmap(_assign_phase, in_axes=(0, 0, None, 0))(
            bid, inc, is_last, state)

    state = (jnp.full((B, n), -1, jnp.int32),
             jnp.full((B, n), -1, jnp.int32),
             jnp.zeros((B, n), jnp.float32))
    assignment, _, _ = jax.lax.fori_loop(0, iters, body, state)

    matched = jnp.take_along_axis(
        x2, jnp.maximum(assignment, 0)[..., None], axis=1)
    dist = jnp.sum((x1 - matched) ** 2, axis=-1)
    return dist, assignment


@functools.lru_cache(maxsize=None)
def _emd_core(eps: float, iters: int):
    """Jitted batched auction for a given (eps, iters) envelope.

    eps/iters close over the custom_vjp instead of riding as operands:
    non-array custom_vjp args re-enter tracing machinery on every shape
    retrace, and an inner per-sample jit's cache-equality check on
    sharding metadata raised spuriously when the same envelope was
    reused across differently-shaped callers.  One top-level jit, array
    operands only.
    """

    @jax.custom_vjp
    def core(x1, x2):
        return _emd_batched(x1, x2, eps, iters)

    def fwd(x1, x2):
        dist, assignment = core(x1, x2)
        return (dist, assignment), (x1, x2, assignment)

    def bwd(res, cot):
        x1, x2, assignment = res
        g = cot[0]
        matched = jnp.take_along_axis(
            x2.astype(jnp.float32),
            jnp.maximum(assignment, 0)[..., None], axis=1)
        # reference emd_cuda.cu:284-300: grad wrt xyz1 only
        gx1 = 2.0 * g[..., None] * (x1.astype(jnp.float32) - matched)
        return gx1, jnp.zeros_like(x2)

    core.defvjp(fwd, bwd)
    return jax.jit(core)


def emd_auction(xyz1, xyz2, eps: float = 0.005, iters: int = 50
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Auction EMD. xyz1/xyz2: [B,N,3] or [N,3]; returns (sq_dists, assignment).

    Reference call signature/usage: ``emdModule()(p1, p2, eps=0.005,
    iters=50)`` then ``sqrt(d).mean()`` (reference: utils/loss_util.py:45-49).
    """
    x1 = jnp.asarray(xyz1)
    x2 = jnp.asarray(xyz2)
    squeeze = x1.ndim == 2
    if squeeze:
        x1, x2 = x1[None], x2[None]
    if x1.shape[1] != x2.shape[1]:
        raise ValueError("EMD requires equally sized point clouds")
    dist, assignment = _emd_core(float(eps), int(iters))(x1, x2)
    if squeeze:
        return dist[0], assignment[0]
    return dist, assignment
