"""Depth-conditioned SDXL-class generation pipeline (ControlNet / Adapter).

Rebuild of the reference's diffusers pipelines
(reference: tools/controlnet_depth.py:17-111 — xinsir depth ControlNet +
SDXL base + EulerAncestral, 30 steps, the "A photo of {category}, 3d
model, ..." product prompt; tools/adapter_depth.py — the T2I-adapter
variant, which conditions by adding features instead of residual taps).

TPU-native: the entire denoise loop (UNet + ControlNet + CFG + scheduler
step) is one jitted lax.fori_loop; images are NHWC; weights load from
safetensors when cfg.weights_dir provides them, otherwise the architecture
initializes randomly at cfg.model_size ("tiny" for tests; random-weight
output is noise — the synthetic backend is the model-free default).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from genpc_tpu.models.schedulers import EulerAncestral, cfg_combine
from genpc_tpu.models.text_encoder import PromptEncoder
from genpc_tpu.models.unet import ControlNet, UNet2DCondition, UNetConfig
from genpc_tpu.models.vae import AutoencoderKL, VAEConfig

POSITIVE_TEMPLATE = ("A photo of {category}, 3d model, high resolution,"
                     "high quality,highly detailed,highly realistic,"
                     "clean look,no shadow,")
NEGATIVE_PROMPT = ("longbody, lowres, bad anatomy, bad hands, missing "
                   "fingers, extra digit, fewer digits, cropped, worst "
                   "quality, low quality")


class ControlNetDepth:
    """depth image -> RGB image; .generate mirrors the reference contract."""

    def __init__(self, cfg=None, adapter: bool = False, seed: int = 0):
        self.cfg = cfg or {}
        size = (cfg.get("model_size", "tiny") if cfg else "tiny")
        self.size = size
        self.adapter = adapter
        self.unet_cfg = UNetConfig.preset("sdxl" if size == "full" else size)
        self.vae_cfg = VAEConfig.preset("tiny" if size != "full" else "full")
        self.factor = self.vae_cfg.spatial_factor
        cond_ch = (16, 32, 96, 256)[: int(math.log2(self.factor)) + 1]
        self.unet = UNet2DCondition(self.unet_cfg)
        if adapter:
            from genpc_tpu.models.adapter import T2IAdapter
            # each level's additive feature must match the level's INPUT
            # width: the downsample keeps the previous level's channels
            boc = self.unet_cfg.block_out_channels
            self.controlnet = T2IAdapter((boc[0],) + boc[:-1],
                                         downscale=self.factor)
        else:
            self.controlnet = ControlNet(self.unet_cfg,
                                         cond_channels=cond_ch)
        self.vae = AutoencoderKL(self.vae_cfg)
        self.prompt_encoder = PromptEncoder(
            "tiny" if size != "full" else "full",
            weights_dir=(cfg.get("weights_dir") if cfg else None))
        if size == "full":
            # bf16 towers: 3.3 GB fp32 -> 1.65 GB (the UNet, ControlNet,
            # VAE, towers and denoise activations all share one 16 GB
            # chip; reference runs the whole stack fp16,
            # tools/controlnet_depth.py:17-52)
            cast = lambda t: jax.tree.map(  # noqa: E731
                lambda x: x.astype(jnp.bfloat16), t)
            self.prompt_encoder.params_l = cast(self.prompt_encoder.params_l)
            self.prompt_encoder.params_g = cast(self.prompt_encoder.params_g)
        self.rng = jax.random.PRNGKey(seed)
        self._params = None
        self._latent_hw = None

    # ------------------------------------------------------------------
    def _init_params(self, latent_hw: int):
        def build():
            rng = jax.random.PRNGKey(0)
            ctx_dim = self.unet_cfg.context_dim
            lat = jnp.zeros((1, latent_hw, latent_hw,
                             self.unet_cfg.in_channels))
            ctx = jnp.zeros((1, 77, ctx_dim))
            t = jnp.zeros((1,))
            added = (jnp.zeros((1, self.unet_cfg.addition_embed_dim))
                     if self.unet_cfg.addition_embed_dim else None)
            side = latent_hw * self.factor
            cond_img = jnp.zeros((1, side, side, 3))
            if self.adapter:
                cn_params = self.controlnet.init(
                    jax.random.fold_in(rng, 1), cond_img)
            else:
                cn_params = self.controlnet.init(
                    jax.random.fold_in(rng, 1), lat, t, ctx, cond_img,
                    added_cond=added)
            return {
                "unet": self.unet.init(rng, lat, t, ctx, added_cond=added),
                "controlnet": cn_params,
                "vae": self.vae.init(jax.random.fold_in(rng, 2),
                                     jnp.zeros((1, side, side, 3))),
            }

        if self.size == "full":
            # never materialize the 15.6 GB fp32 tree (weights.py:
            # random_bf16_params) — a real checkpoint grafts into the
            # bf16 template (graft_weights casts to the template dtype)
            from genpc_tpu.models.weights import random_bf16_params
            params = random_bf16_params(jax.eval_shape(build))
        else:
            params = build()
        weights_dir = self.cfg.get("weights_dir") if self.cfg else None
        if weights_dir:
            from genpc_tpu.models.weights import load_sdxl_controlnet
            params = load_sdxl_controlnet(weights_dir, params)
        return params

    # ------------------------------------------------------------------
    def _added_cond(self, pooled, size: int):
        """SDXL micro-conditioning vector (diffusers _get_add_time_ids):
        concat(pooled_text_embeds, sinusoidal(time_ids).flatten) with
        time_ids = (orig_h, orig_w, crop_top, crop_left, tgt_h, tgt_w)."""
        from genpc_tpu.models.layers import timestep_embedding
        time_ids = jnp.asarray([size, size, 0, 0, size, size], jnp.float32)
        time_emb = timestep_embedding(time_ids, 256).reshape(1, -1)
        return jnp.concatenate([pooled, time_emb], axis=-1)

    def _loop_body(self, params, cond_img, context, context_neg,
                   added_cond, added_cond_neg, sched,
                   guidance, control_scale, adapter_feats, noise_keys):
        lat_shape_tail = (self.unet_cfg.in_channels,)

        def body(i, latents):
            t = jnp.full((1,), sched.timesteps[i])
            x_in = sched.scale_model_input(latents, i)
            if self.adapter:
                eps_c = self.unet.apply(params["unet"], x_in, t, context,
                                        added_cond=added_cond,
                                        adapter_features=adapter_feats)
            else:
                mid_c, down_c = self.controlnet.apply(
                    params["controlnet"], x_in, t, context, cond_img,
                    added_cond=added_cond,
                    conditioning_scale=control_scale)
                eps_c = self.unet.apply(params["unet"], x_in, t, context,
                                        added_cond=added_cond,
                                        control_residuals=(mid_c, down_c))
            eps_u = self.unet.apply(params["unet"], x_in, t, context_neg,
                                    added_cond=added_cond_neg)
            eps = cfg_combine(eps_u, eps_c, guidance)
            noise = jax.random.normal(noise_keys[i], latents.shape)
            return sched.step(eps, i, latents, noise)

        return body

    @functools.partial(jax.jit, static_argnames=("self", "steps"))
    def _denoise(self, params, cond_img, context, context_neg,
                 added_cond, added_cond_neg, rng,
                 steps: int = 30, guidance: float = 5.0,
                 control_scale: float = 1.0):
        sched = EulerAncestral(steps)
        h = cond_img.shape[1] // self.factor
        lat_shape = (1, h, h, self.unet_cfg.in_channels)
        rng, k = jax.random.split(rng)
        latents = jax.random.normal(k, lat_shape) * sched.init_noise_sigma
        noise_keys = jax.random.split(rng, steps)

        if self.adapter:
            adapter_feats = [f * control_scale for f in self.controlnet.apply(
                params["controlnet"], cond_img)]
        else:
            adapter_feats = None

        body = self._loop_body(params, cond_img, context, context_neg,
                               added_cond, added_cond_neg, sched,
                               guidance, control_scale, adapter_feats,
                               noise_keys)
        latents = jax.lax.fori_loop(0, steps, body, latents)
        img = self.vae.apply(params["vae"], latents,
                             method=AutoencoderKL.decode)
        return jnp.clip(img / 2.0 + 0.5, 0.0, 1.0)

    # --- host-chunked variant (full-scale presets: keeps every device
    # execution well under the tunnel watchdog's ~1 min; identical math)
    @functools.partial(jax.jit, static_argnames=("self", "steps"))
    def _denoise_init(self, params, cond_img, rng, steps: int):
        sched = EulerAncestral(steps)
        h = cond_img.shape[1] // self.factor
        lat_shape = (1, h, h, self.unet_cfg.in_channels)
        rng, k = jax.random.split(rng)
        latents = jax.random.normal(k, lat_shape) * sched.init_noise_sigma
        return latents, jax.random.split(rng, steps)

    @functools.partial(jax.jit, static_argnames=("self", "steps"),
                       donate_argnums=(2,))   # donate latents (arg 0=self)
    def _denoise_chunk(self, params, latents, cond_img, context,
                       context_neg, added_cond, added_cond_neg, noise_keys,
                       lo, hi, steps: int,
                       guidance: float = 5.0, control_scale: float = 1.0):
        """lo/hi are TRACED (fori_loop lowers to while_loop): every
        host-chunked segment shares ONE executable instead of compiling
        steps/chunk distinct full-UNet programs."""
        sched = EulerAncestral(steps)
        adapter_feats = ([f * control_scale for f in self.controlnet.apply(
            params["controlnet"], cond_img)] if self.adapter else None)
        body = self._loop_body(params, cond_img, context, context_neg,
                               added_cond, added_cond_neg, sched,
                               guidance, control_scale, adapter_feats,
                               noise_keys)
        return jax.lax.fori_loop(lo, hi, body, latents)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _decode(self, params, latents):
        img = self.vae.apply(params["vae"], latents,
                             method=AutoencoderKL.decode)
        return jnp.clip(img / 2.0 + 0.5, 0.0, 1.0)

    # ------------------------------------------------------------------
    def release(self):
        """Terminally free every device param buffer of this backend.

        The denoise/decode methods are jitted with ``self`` static, so
        the global pjit cache holds a strong reference to this instance
        — and through it to ``self._params`` (9.4 GB at the SDXL full
        preset).  Dropping the backend + ``gc.collect()`` therefore
        never returns the HBM (measured: live_arrays unchanged).
        ``jax.Array.delete()`` frees the device buffers regardless of
        Python references (same protocol as QwenVLEncoder.release).
        The backend is unusable afterwards; ``run_batched`` calls this
        at the generate -> image-to-3D stage boundary, where the
        reference likewise frees the depth2image stack
        (main_lidar.py:12-16, free_memory between stages).
        """
        trees = (self._params, self.prompt_encoder.params_l,
                 self.prompt_encoder.params_g)
        for tree in trees:
            for leaf in jax.tree_util.tree_leaves(tree):
                try:
                    leaf.delete()
                except Exception:
                    pass
        self._params = None
        self.prompt_encoder.params_l = None
        self.prompt_encoder.params_g = None

    # ------------------------------------------------------------------
    def generate(self, depth, category_or_flag: str, size: int = 512,
                 controlnet_conditioning_scale: float = 1.0,
                 num_inference_steps: int = 30) -> np.ndarray:
        """Depth [3,H,W] or [H,W,3] float in [0,1] -> RGB [size,size,3]."""
        from genpc_tpu.categories import get_category
        d = np.asarray(depth, np.float32)
        if d.ndim == 3 and d.shape[0] in (1, 3):
            d = d.transpose(1, 2, 0)
        if d.ndim == 2:
            d = d[..., None]
        if d.shape[-1] == 1:
            d = np.repeat(d, 3, axis=-1)
        if d.shape[0] != size:
            from PIL import Image
            d = np.asarray(Image.fromarray(
                (np.clip(d, 0, 1) * 255).astype(np.uint8)).resize(
                (size, size), Image.LANCZOS), np.float32) / 255.0

        if self._params is None or self._latent_hw != size // self.factor:
            self._latent_hw = size // self.factor
            self._params = self._init_params(self._latent_hw)

        category = get_category(category_or_flag)
        prompt = POSITIVE_TEMPLATE.format(category=category)
        ctx, pooled = self.prompt_encoder.encode(prompt)
        ctx_neg, pooled_neg = self.prompt_encoder.encode(NEGATIVE_PROMPT)
        # project two-tower context to the UNet context width if needed
        if ctx.shape[-1] != self.unet_cfg.context_dim:
            reps = -(-self.unet_cfg.context_dim // ctx.shape[-1])
            ctx = jnp.tile(ctx, (1, 1, reps))[..., :self.unet_cfg.context_dim]
            ctx_neg = jnp.tile(ctx_neg, (1, 1, reps))[
                ..., :self.unet_cfg.context_dim]
        added = self._added_cond(pooled, size)
        added_neg = self._added_cond(pooled_neg, size)

        cond = jnp.asarray(d * 2.0 - 1.0)[None]
        self.rng, k = jax.random.split(self.rng)
        chunk = int(self.cfg.get("denoise_chunk", 0)) if self.cfg else 0
        if chunk:
            latents, noise_keys = self._denoise_init(
                self._params, cond, k, num_inference_steps)
            lo = 0
            while lo < num_inference_steps:
                hi = min(lo + chunk, num_inference_steps)
                latents = self._denoise_chunk(
                    self._params, latents, cond, ctx, ctx_neg, added,
                    added_neg, noise_keys, jnp.int32(lo), jnp.int32(hi),
                    num_inference_steps, guidance=5.0,
                    control_scale=controlnet_conditioning_scale)
                lo = hi
            img = self._decode(self._params, latents)
        else:
            img = self._denoise(self._params, cond, ctx, ctx_neg,
                                added, added_neg, k,
                                steps=num_inference_steps,
                                guidance=5.0,
                                control_scale=controlnet_conditioning_scale)
        return np.asarray(img[0])
