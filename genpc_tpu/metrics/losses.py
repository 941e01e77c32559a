"""Completion losses: Chamfer-L1/L2, one-sided Chamfer, auction EMD.

Equivalent of the reference's ``Completionloss`` facade
(reference: utils/loss_util.py:8-53):
  chamfer_l1  = (mean sqrt(d1) + mean sqrt(d2)) / 2
  chamfer_l2  = mean d1 + mean d2
  chamfer_partial_l1/l2 = one-sided variants
  emd_loss    = mean sqrt(auction_dist), eps=0.005, iters=50

All functions accept [N,3] or [B,N,3] and are differentiable (chamfer via
the custom-VJP NN kernel; EMD w.r.t. the first argument only, like the
CUDA extension).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from genpc_tpu.ops.chamfer import chamfer_distances
from genpc_tpu.ops.emd import emd_auction


def chamfer_l1(p1, p2):
    d1, d2, _, _ = chamfer_distances(p1, p2)
    return (jnp.mean(jnp.sqrt(jnp.maximum(d1, 0.0)))
            + jnp.mean(jnp.sqrt(jnp.maximum(d2, 0.0)))) / 2.0


def chamfer_l2(p1, p2):
    d1, d2, _, _ = chamfer_distances(p1, p2)
    return jnp.mean(d1) + jnp.mean(d2)


def chamfer_partial_l1(p1, p2):
    d1, _, _, _ = chamfer_distances(p1, p2)
    return jnp.mean(jnp.sqrt(jnp.maximum(d1, 0.0)))


def chamfer_partial_l2(p1, p2):
    d1, _, _, _ = chamfer_distances(p1, p2)
    return jnp.mean(d1)


def emd_loss(p1, p2, eps: float = 0.005, iters: int = 50):
    d, _ = emd_auction(p1, p2, eps=eps, iters=iters)
    return jnp.sqrt(jnp.maximum(d, 0.0)).mean()


def apml_loss(p1, p2, temperature: float = 0.05):
    """Approximate point-matching loss (soft, fully differentiable).

    A smooth alternative to the auction EMD for training-time gradients
    (APML, arXiv:2512.19743 — see PAPERS.md): a doubly-soft assignment
    built from row- and column-softmaxes of the negative distance matrix
    (one Sinkhorn-style balancing step), contracted against the squared
    distances.  O(N·M) MXU-friendly, no iteration count, gradients flow
    to both clouds.  Approaches one-sided-NN Chamfer as temperature -> 0
    and a uniform coupling as temperature -> inf.
    """
    a = jnp.asarray(p1, jnp.float32)
    b = jnp.asarray(p2, jnp.float32)
    if a.ndim == 2:
        a, b = a[None], b[None]
    a2 = jnp.sum(a * a, axis=-1)
    b2 = jnp.sum(b * b, axis=-1)
    cross = jnp.einsum("bnd,bmd->bnm", a, b,
                       precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(a2[..., :, None] + b2[..., None, :] - 2 * cross, 0.0)
    logits = -d2 / temperature
    # geometric mean of row/column softmaxes ~ one balanced coupling step
    log_r = jax.nn.log_softmax(logits, axis=-1)
    log_c = jax.nn.log_softmax(logits, axis=-2)
    coupling = jnp.exp(0.5 * (log_r + log_c))
    coupling = coupling / jnp.maximum(
        coupling.sum(axis=(-2, -1), keepdims=True), 1e-12)
    return jnp.sum(coupling * d2, axis=(-2, -1)).mean()


class CompletionLoss:
    """Drop-in for the reference's Completionloss(loss_func=...)."""

    def __init__(self, loss_func: str = "cd_l1",
                 emd_eps: float = 0.005, emd_iters: int = 50):
        self.loss_func = loss_func
        self.emd_eps = emd_eps
        self.emd_iters = emd_iters
        if loss_func == "cd_l1":
            self.metric = chamfer_l1
            self.partial_matching = chamfer_partial_l1
        elif loss_func == "cd_l2":
            self.metric = chamfer_l2
            self.partial_matching = chamfer_partial_l2
        elif loss_func == "emd":
            self.metric = lambda p1, p2: emd_loss(
                p1, p2, eps=self.emd_eps, iters=self.emd_iters)
        else:
            raise ValueError(f"loss function {loss_func} not supported")

    chamfer_l1 = staticmethod(chamfer_l1)
    chamfer_l2 = staticmethod(chamfer_l2)
    chamfer_partial_l1 = staticmethod(chamfer_partial_l1)
    chamfer_partial_l2 = staticmethod(chamfer_partial_l2)

    def emd_loss(self, p1, p2):
        return emd_loss(p1, p2, eps=self.emd_eps, iters=self.emd_iters)

    def get_loss(self, gen, gt):
        return self.metric(gen, gt)
