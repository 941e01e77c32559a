"""DDNM null-space diffusion inpainting (reference's 'DDNM' inpainter).

The reference offers a DDNM-based depth inpainter backend
(reference: DepthPrompting.py:25-28 loads models/DDNM — an external
checkout).  DDNM (Denoising Diffusion Null-space Models) inpaints by
running a plain diffusion sampler while projecting each x0 estimate onto
the data-consistency manifold: known pixels are pasted back, the model
only invents the null space (the hole).

Implemented over our pixel-space UNet with DDIM steps, jit-compiled as one
fori_loop.  With pretrained weights (cfg.weights_dir) it is a faithful
DDNM; at random init it still honors data consistency (known pixels exact)
and fills holes with prior noise — the 'jax' diffusion fill remains the
model-free default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from genpc_tpu.models.schedulers import DDIM
from genpc_tpu.models.unet import UNet2DCondition, UNetConfig


class DDNMInpainter:
    def __init__(self, cfg=None, steps: int = 50, seed: int = 0):
        self.cfg = cfg or {}
        size = (cfg.get("model_size", "tiny") if cfg else "tiny")
        # pixel-space UNet, unconditional (context = zeros)
        self.unet_cfg = UNetConfig.preset("tiny" if size != "full" else "base")
        self.unet_cfg = UNetConfig(
            in_channels=3, out_channels=3,
            block_out_channels=self.unet_cfg.block_out_channels,
            layers_per_block=self.unet_cfg.layers_per_block,
            transformer_depths=self.unet_cfg.transformer_depths,
            context_dim=self.unet_cfg.context_dim,
            attention_head_dim=self.unet_cfg.attention_head_dim)
        self.unet = UNet2DCondition(self.unet_cfg)
        self.steps = steps
        self.rng = jax.random.PRNGKey(seed)
        self._params = None
        self._hw = None

    def _init_params(self, hw: int):
        rng = jax.random.PRNGKey(0)
        lat = jnp.zeros((1, hw, hw, 3))
        ctx = jnp.zeros((1, 1, self.unet_cfg.context_dim))
        params = self.unet.init(rng, lat, jnp.zeros((1,)), ctx)
        weights_dir = self.cfg.get("weights_dir") if self.cfg else None
        if weights_dir:
            from genpc_tpu.models.weights import load_dit
            params = {"dit": params}
            params = load_dit(weights_dir, params, "ddnm")["dit"]
        return params

    @functools.partial(jax.jit, static_argnames=("self", "steps"))
    def _sample(self, params, known, mask, rng, steps: int):
        """known [1,H,W,3] in [-1,1]; mask [1,H,W,1] 1=known pixel."""
        sched = DDIM(steps)
        ctx = jnp.zeros((1, 1, self.unet_cfg.context_dim))
        x = jax.random.normal(rng, known.shape)

        def body(i, x):
            t = sched.timesteps[i]
            a_t = sched.alphas_cum[t]
            eps = self.unet.apply(params, x, jnp.full((1,), t, jnp.float32),
                                  ctx)
            x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
            # DDNM data-consistency projection: range space from the
            # measurement, null space from the model
            x0 = mask * known + (1.0 - mask) * x0
            eps_hat = (x - jnp.sqrt(a_t) * x0) / jnp.sqrt(
                jnp.maximum(1 - a_t, 1e-12))
            return sched.step(eps_hat, i, x)

        x = jax.lax.fori_loop(0, steps, body, x)
        return mask * known + (1.0 - mask) * x

    def inpaint(self, img: np.ndarray, hole_mask: np.ndarray) -> np.ndarray:
        """img [C,H,W] float in [0,1]; hole_mask [H,W] (or [C,H,W])."""
        x = np.asarray(img, np.float32)
        chw = x.ndim == 3 and x.shape[0] in (1, 3)
        if chw:
            x = x.transpose(1, 2, 0)
        m = np.asarray(hole_mask, np.float32)
        if m.ndim == 3:
            m = m.max(axis=0) if m.shape[0] in (1, 3) else m.max(axis=-1)
        hw = x.shape[0]
        if self._params is None or self._hw != hw:
            self._hw = hw
            self._params = self._init_params(hw)
        known = jnp.asarray(x * 2 - 1)[None]
        mask = jnp.asarray(1.0 - (m > 0.5))[None, :, :, None].astype(
            jnp.float32)
        self.rng, k = jax.random.split(self.rng)
        out = self._sample(self._params, known, mask, k, self.steps)
        out = np.asarray(jnp.clip(out[0] / 2 + 0.5, 0, 1))
        return out.transpose(2, 0, 1) if chw else out
