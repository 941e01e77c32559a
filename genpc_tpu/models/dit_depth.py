"""Depth->image generation via MMDiT + rectified flow (FLUX/Qwen variants).

Pipeline rebuild of the reference's two DiT backends:
  * variant="qwen": Qwen-Image-Edit-style edit conditioning — the depth
    map is VAE-encoded and its tokens concatenated to the model input
    along the sequence, and the prompt AND depth image are encoded by
    **Qwen2.5-VL** (models/qwen_vl.py) exactly as the reference pipeline
    does (tools/qwen_depth.py:50-62 QwenImageEditPlusPipeline; :66-108
    8 steps, true CFG 4.0; :110-132 the product-photo prompt);
  * variant="flux": FLUX.1-Depth-dev-style channel concatenation of
    control latents, prompts encoded by **T5-XXL** + CLIP-L pooled
    (models/t5.py; reference tools/flux_depth.py:19-30,48), distilled
    guidance 10.0, 30 steps.

The whole sampler is one jitted lax.fori_loop over the FlowMatchEuler
schedule, OBJECT-BATCHED: generate_batch() denoises B objects in one
device program (SURVEY §2.3 "batch the diffusion denoise loops across
objects"); prompts of different token lengths are padded to a static
budget and masked in the joint attention (the diffusers
prompt_embeds_mask behavior).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from genpc_tpu.models.dit import DiTConfig, MMDiT
from genpc_tpu.models.schedulers import FlowMatchEuler, cfg_combine
from genpc_tpu.models.vae import AutoencoderKL, VAEConfig

QWEN_PROMPT = (
    "A highly realistic {category} with a common, ordinary appearance, "
    "matching typical designs found in everyday life. "
    "Rendered in a professional product photography style with "
    "studio-grade natural lighting, soft and evenly distributed "
    "illumination. Realistic materials and natural textures, without "
    "exaggerated shapes or conceptual designs. Accurate proportions, "
    "reasonable structure, and clearly visible details, shown from a 3/4 "
    "perspective view to present the overall form. A clean white neutral "
    "background with sharp focus. The overall style is realistic, simple, "
    "and practical, making the object look like a real, commonly "
    "available item in everyday use.")

FLUX_PROMPT = (
    "A raw photo of a {category}. no reflections, high quality, rich "
    "details. Shot with a macro lens (f/2.8, 50mm) and a Canon EOSR5")


def _pad_tokens(ctx: np.ndarray, budget: int):
    """[L,D] -> ([budget,D], [budget] bool mask); truncates over-budget."""
    L, D = ctx.shape
    if L >= budget:
        return ctx[:budget], np.ones(budget, bool)
    out = np.zeros((budget, D), ctx.dtype)
    out[:L] = ctx
    mask = np.zeros(budget, bool)
    mask[:L] = True
    return out, mask


def _default_quant_bits(variant: str, full: bool, qb) -> int:
    """Single-chip default for the full presets: int4, exactly the
    reference's Nunchaku deployment for both backends (reference:
    tools/flux_depth.py:12-30, tools/qwen_depth.py:50-62).  FLUX int8
    (~12 GB) compiles but leaves no runtime headroom next to the int4
    T5 (measured RESOURCE_EXHAUSTED on the 16 GB v5e); int4 (~6 GB)
    runs with room for activations.  Pass quant_bits=8 on >=24 GB parts
    or 0 for the bf16 multi-chip tensor-parallel path; tiny/base presets
    default to bf16."""
    if qb is not None:
        return int(qb)
    return 4 if full else 0


class DiTDepthEdit:
    def __init__(self, cfg=None, variant: str = "qwen", seed: int = 0):
        self.cfg = cfg or {}
        self.variant = variant
        size = (cfg.get("model_size", "tiny") if cfg else "tiny")
        self.full = size == "full"
        qb = _default_quant_bits(variant, self.full,
                                 cfg.get("quant_bits") if cfg else None)
        if self.full:
            base = DiTConfig.preset(variant)
        elif size == "base":
            base = DiTConfig.preset(
                "base_qwen" if variant == "qwen" else "base")
        else:
            base = DiTConfig.preset(
                "tiny_qwen" if variant == "qwen" else "tiny")
        import dataclasses
        self.dit_cfg = dataclasses.replace(base, quant_bits=qb)
        self.vae_cfg = VAEConfig.preset("tiny" if not self.full else "flux")
        self.factor = self.vae_cfg.spatial_factor
        self.model = MMDiT(self.dit_cfg)
        self.vae = AutoencoderKL(self.vae_cfg)
        weights_dir = self.cfg.get("weights_dir")
        # towers default to int4 at full size (their ctors decide) so the
        # whole preset shares one chip; override via tower_quant_bits
        tqb = self.cfg.get("tower_quant_bits") if cfg else None
        if variant == "qwen":
            from genpc_tpu.models.qwen_vl import QwenVLEncoder
            self.vl = QwenVLEncoder("full" if self.full else "tiny",
                                    weights_dir=weights_dir,
                                    quant_bits=tqb)
            self.txt_budget = 512 if self.full else 160
        else:
            from genpc_tpu.models.t5 import T5PromptEncoder
            self.t5 = T5PromptEncoder("full" if self.full else "tiny",
                                      weights_dir=weights_dir,
                                      quant_bits=tqb)
            self.txt_budget = None    # T5 encodes at fixed length already
        self.rng = jax.random.PRNGKey(seed)
        # per-OBJECT noise keys (fold_in of a running counter) instead of
        # one per-call key: how objects are grouped into device programs
        # (generate_obj_batch) then cannot change any object's latents
        self._noise_ctr = 0
        # defaults per variant (reference settings)
        self.steps = 8 if variant == "qwen" else 30
        self.guidance = 4.0 if variant == "qwen" else 10.0
        self._params = None
        self._params_host = None
        self._latent_hw = None
        # Sequential-offload analog for the DiT itself (reference:
        # tools/qwen_depth.py:60-62): at full size the int4 20B Qwen
        # transformer (10.46 GB) and the int4 8.3B VL tower (4.2 GB)
        # cannot BOTH be HBM-resident during prompt encoding, so the DiT
        # params live in the TPU host's pinned memory between calls and
        # are materialized only for the denoise+decode window.  FLUX
        # (int4 6 GB + int4 T5 2.4 GB) co-resides fine and stays put.
        do = self.cfg.get("dit_offload") if cfg else None
        self.dit_offload = (variant == "qwen" and self.full) \
            if do is None else bool(do)

    def _init_params(self, latent_hw: int):
        rng = jax.random.PRNGKey(0)
        lat = jnp.zeros((1, latent_hw, latent_hw, self.dit_cfg.in_channels))
        cond = jnp.zeros((1, latent_hw, latent_hw,
                          self.dit_cfg.cond_channels))
        txt = jnp.zeros((1, 77, self.dit_cfg.text_dim))
        pooled = (jnp.zeros((1, self.dit_cfg.pooled_dim))
                  if self.dit_cfg.pooled_dim else None)
        side = latent_hw * self.factor
        params = {
            "dit": self.model.init(rng, lat, jnp.zeros((1,)), txt,
                                   pooled=pooled, cond_latents=cond,
                                   guidance=jnp.ones((1,))),
            "vae": self.vae.init(jax.random.fold_in(rng, 1),
                                 jnp.zeros((1, side, side, 3))),
        }
        weights_dir = self.cfg.get("weights_dir") if self.cfg else None
        if weights_dir:
            from genpc_tpu.models.weights import load_dit
            params = load_dit(weights_dir, params, self.variant,
                              quant_bits=self.dit_cfg.quant_bits)
        return params

    # ------------------------------------------------ param residency
    def set_params(self, params, latent_hw: int):
        """Install a param tree, honoring the offload policy (benches
        install synthetic full-scale params through this)."""
        self._latent_hw = latent_hw
        if self.dit_offload:
            from genpc_tpu.models.qwen_vl import _offload_tree
            self._params_host = _offload_tree(params)
            jax.block_until_ready(self._params_host)
            for leaf in jax.tree_util.tree_leaves(params):
                if hasattr(leaf, "delete"):
                    leaf.delete()
            self._params = None
        else:
            self._params = params

    def _acquire_params(self, latent_hw: int):
        """Device-resident params for one sampling window."""
        fresh = self._latent_hw != latent_hw or (
            self._params is None and self._params_host is None)
        if fresh:
            if self._latent_hw is not None and (
                    self._params is not None
                    or self._params_host is not None):
                import warnings
                warnings.warn(
                    f"DiTDepthEdit: latent_hw changed "
                    f"{self._latent_hw}->{latent_hw}; discarding the "
                    f"installed param tree and re-initializing "
                    f"(random unless weights_dir is set). Call "
                    f"set_params(params, latent_hw) with the new size "
                    f"to keep installed weights.", stacklevel=3)
            self._latent_hw = latent_hw
            params = self._init_params(latent_hw)
            if self.dit_offload:     # keep a host copy for later calls
                from genpc_tpu.models.qwen_vl import _offload_tree
                self._params_host = _offload_tree(params)
                jax.block_until_ready(self._params_host)
            else:
                self._params = params
            return params
        if self._params is not None:
            return self._params
        from genpc_tpu.models.qwen_vl import _compute_device
        dev = _compute_device(self._params_host)
        params = jax.device_put(
            self._params_host, jax.sharding.SingleDeviceSharding(dev))
        jax.block_until_ready(params)
        return params

    def _release_params(self, params):
        """After a sampling window: drop the device copy iff offloaded."""
        if self.dit_offload:
            for leaf in jax.tree_util.tree_leaves(params):
                if hasattr(leaf, "delete"):
                    leaf.delete()

    def release(self):
        """Terminally free all device AND pinned-host param buffers.

        The jitted methods hold ``self`` static, so the pjit cache pins
        this instance; explicit deletion is the only way its HBM (and
        the 10+ GB pinned-host residency copies) come back.  Called by
        ``run_batched`` at the generate -> image-to-3D boundary
        (reference: main_lidar.py:12-16 free_memory between stages)."""
        for tree in (self._params, self._params_host):
            for leaf in jax.tree_util.tree_leaves(tree):
                if hasattr(leaf, "delete"):
                    try:
                        leaf.delete()
                    except Exception:
                        pass
        self._params = None
        self._params_host = None
        if getattr(self, "vl", None) is not None:
            self.vl.release()

    # ------------------------------------------------------------ prompts
    def _encode_prompts(self, categories: Sequence[str],
                        depths01: np.ndarray):
        """-> (txt, mask, txt_neg, mask_neg, pooled) stacked over B."""
        if self.variant == "qwen":
            ctxs, masks, negs, nmasks = [], [], [], []
            try:
                for b, cat in enumerate(categories):
                    pos = np.asarray(self.vl.encode(
                        QWEN_PROMPT.format(category=cat), depths01[b])[0],
                        np.float32)
                    neg = np.asarray(self.vl.encode(" ", depths01[b])[0],
                                     np.float32)
                    c, m = _pad_tokens(pos, self.txt_budget)
                    n, nm = _pad_tokens(neg, self.txt_budget)
                    ctxs.append(c)
                    masks.append(m)
                    negs.append(n)
                    nmasks.append(nm)
            finally:
                # sequential-offload analog: the 8.3B VL tower leaves HBM
                # before the 20B DiT denoises (tools/qwen_depth.py:60-62)
                self.vl.release()
            return (jnp.asarray(np.stack(ctxs)), jnp.asarray(np.stack(masks)),
                    jnp.asarray(np.stack(negs)),
                    jnp.asarray(np.stack(nmasks)), None)
        # flux: T5 context + CLIP-L pooled, no CFG branch needed
        prompts = [FLUX_PROMPT.format(category=c) for c in categories]
        ctx, pooled = self.t5.encode(prompts)
        if self.dit_cfg.pooled_dim and \
                pooled.shape[-1] != self.dit_cfg.pooled_dim:
            pd = self.dit_cfg.pooled_dim
            reps = -(-pd // pooled.shape[-1])
            pooled = jnp.tile(pooled, (1, reps))[..., :pd]
        return ctx, None, None, None, pooled

    # ------------------------------------------------------------ sampler
    def _make_body(self, params, cond_lat, txt, txt_mask, txt_neg,
                   txt_neg_mask, pooled, sched, guidance):
        b = cond_lat.shape[0]
        g = jnp.full((b,), guidance, jnp.float32)

        def body(i, latents):
            t = jnp.full((b,), sched.timesteps[i])
            v_c = self.model.apply(params["dit"], latents, t, txt,
                                   pooled=pooled, cond_latents=cond_lat,
                                   guidance=g, txt_mask=txt_mask)
            if self.variant == "qwen":   # true CFG (reference cfg 4.0)
                v_u = self.model.apply(params["dit"], latents, t, txt_neg,
                                       pooled=pooled, cond_latents=cond_lat,
                                       guidance=g, txt_mask=txt_neg_mask)
                v = cfg_combine(v_u, v_c, guidance)
            else:                        # flux: distilled guidance only
                v = v_c
            return sched.step(v, i, latents)

        return body

    def _cond_latents(self, params, cond_img):
        cond_lat = self.vae.apply(params["vae"], cond_img,
                                  method=AutoencoderKL.encode)
        if cond_lat.shape[-1] != self.dit_cfg.cond_channels:
            reps = -(-self.dit_cfg.cond_channels // cond_lat.shape[-1])
            cond_lat = jnp.tile(cond_lat, (1, 1, 1, reps)
                                )[..., :self.dit_cfg.cond_channels]
        return cond_lat

    @staticmethod
    def _per_object_noise(keys, lat_shape):
        """keys [B] PRNG keys -> [B, H, W, C] per-object latents."""
        return jax.vmap(
            lambda k: jax.random.normal(k, lat_shape[1:]))(keys)

    @functools.partial(jax.jit, static_argnames=("self", "steps"))
    def _sample(self, params, cond_img, txt, txt_mask, txt_neg,
                txt_neg_mask, pooled, keys, steps: int, guidance: float):
        sched = FlowMatchEuler(steps)
        cond_lat = self._cond_latents(params, cond_img)
        lat_shape = cond_lat.shape[:3] + (self.dit_cfg.in_channels,)
        latents = self._per_object_noise(keys, lat_shape)
        body = self._make_body(params, cond_lat, txt, txt_mask, txt_neg,
                               txt_neg_mask, pooled, sched, guidance)
        latents = jax.lax.fori_loop(0, steps, body, latents)
        img = self.vae.apply(params["vae"], latents,
                             method=AutoencoderKL.decode)
        return jnp.clip(img / 2.0 + 0.5, 0.0, 1.0)

    # --- host-chunked variant (full-scale presets: keeps every device
    # execution under the tunnel watchdog's ~1 min; identical math to
    # _sample — same pattern as controlnet_depth._denoise_chunk)
    @functools.partial(jax.jit, static_argnames=("self",))
    def _sample_prep(self, params, cond_img, keys):
        cond_lat = self._cond_latents(params, cond_img)
        lat_shape = cond_lat.shape[:3] + (self.dit_cfg.in_channels,)
        return cond_lat, self._per_object_noise(keys, lat_shape)

    @functools.partial(jax.jit, static_argnames=("self", "steps"),
                       donate_argnums=(2,))   # donate latents (0 = self)
    def _sample_chunk(self, params, latents, cond_lat, txt, txt_mask,
                      txt_neg, txt_neg_mask, pooled, lo, hi, steps: int,
                      guidance: float):
        """lo/hi are TRACED (fori_loop lowers to while_loop): every
        host-chunked segment shares ONE executable."""
        sched = FlowMatchEuler(steps)
        body = self._make_body(params, cond_lat, txt, txt_mask, txt_neg,
                               txt_neg_mask, pooled, sched, guidance)
        return jax.lax.fori_loop(lo, hi, body, latents)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _decode(self, params, latents):
        img = self.vae.apply(params["vae"], latents,
                             method=AutoencoderKL.decode)
        return jnp.clip(img / 2.0 + 0.5, 0.0, 1.0)

    # ------------------------------------------------------------ drivers
    @staticmethod
    def _prep_depth(depth, size: int) -> np.ndarray:
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
                (size, size), Image.BILINEAR), np.float32) / 255.0
        return d

    def generate_batch(self, depths, categories_or_flags: Sequence[str],
                       size: int = 512,
                       num_inference_steps: Optional[int] = None
                       ) -> np.ndarray:
        """Denoise B objects in ONE device program -> [B,size,size,3]."""
        from genpc_tpu.categories import get_category
        depths01 = np.stack([self._prep_depth(d, size) for d in depths])
        latent_hw = size // self.factor
        cats = [get_category(f) for f in categories_or_flags]
        # encode BEFORE materializing DiT params: the conditioning tower
        # then never shares HBM with an offloaded DiT at all
        txt, mask, neg, nmask, pooled = self._encode_prompts(cats, depths01)
        params = self._acquire_params(latent_hw)
        try:
            steps = num_inference_steps or self.steps
            b = len(depths01)
            k = jnp.stack([jax.random.fold_in(self.rng, self._noise_ctr + i)
                           for i in range(b)])
            self._noise_ctr += b
            cond = jnp.asarray(depths01 * 2 - 1)
            chunk = int(self.cfg.get("denoise_chunk", 0) or 0) if self.cfg \
                else 0
            if chunk:
                cond_lat, latents = self._sample_prep(params, cond, k)
                lo = 0
                while lo < steps:
                    hi = min(lo + chunk, steps)
                    latents = self._sample_chunk(
                        params, latents, cond_lat, txt, mask, neg,
                        nmask, pooled, jnp.int32(lo), jnp.int32(hi), steps,
                        self.guidance)
                    lo = hi
                img = self._decode(params, latents)
            else:
                img = self._sample(params, cond, txt, mask, neg, nmask,
                                   pooled, k, steps, self.guidance)
            img = np.asarray(img)
        finally:
            self._release_params(params)
        return img

    def generate(self, depth, category_or_flag: str, size: int = 512,
                 num_inference_steps: int | None = None) -> np.ndarray:
        return self.generate_batch([depth], [category_or_flag], size,
                                   num_inference_steps)[0]


class FluxInpainter:
    """FLUX-based image inpainting (the reference's 'flux' depth inpainter).

    Mirrors tools/painting_flux1dev.Painting_Flux.paint(image, mask, prompt,
    size) (reference: DepthPrompting.py:21-24, 201-209): run the FLUX
    rectified-flow sampler while compositing the known region back at each
    step — re-noise the known latents to the current flow time and paste
    them outside the hole (RePaint-style data consistency for flow models).
    """

    def __init__(self, cfg=None, seed: int = 0):
        self.backend = DiTDepthEdit(cfg, variant="flux", seed=seed)

    @functools.partial(jax.jit, static_argnames=("self", "steps"))
    def _sample(self, params, known_img, mask_img, txt, pooled, rng,
                steps: int, guidance: float):
        be = self.backend
        sched = FlowMatchEuler(steps)
        known_lat = be.vae.apply(params["vae"], known_img,
                                 method=AutoencoderKL.encode)
        cond_lat = known_lat
        if cond_lat.shape[-1] != be.dit_cfg.cond_channels:
            reps = -(-be.dit_cfg.cond_channels // cond_lat.shape[-1])
            cond_lat = jnp.tile(cond_lat, (1, 1, 1, reps)
                                )[..., :be.dit_cfg.cond_channels]
        # latent-resolution hole mask: any hole pixel in the patch -> hole
        f = be.factor
        m = mask_img[0, :, :, 0]
        h, w = m.shape
        m_lat = m.reshape(h // f, f, w // f, f).max(axis=(1, 3))
        m_lat = m_lat[None, :, :, None]
        lat_shape = known_lat.shape[:3] + (be.dit_cfg.in_channels,)
        rng, k = jax.random.split(rng)
        noise = jax.random.normal(k, lat_shape)
        latents = noise
        g = jnp.full((1,), guidance, jnp.float32)
        known_c = jnp.tile(known_lat, (1, 1, 1, -(-lat_shape[-1]
                                                  // known_lat.shape[-1])
                                       ))[..., :lat_shape[-1]]

        def body(i, latents):
            t = jnp.full((1,), sched.timesteps[i])
            v = be.model.apply(params["dit"], latents, t, txt,
                               pooled=pooled, cond_latents=cond_lat,
                               guidance=g)
            latents = sched.step(v, i, latents)
            # composite: outside the hole, keep the known latents re-noised
            # to the NEXT step's time (x_t = (1-t)*x0 + t*noise for RF)
            t_next = sched.t_next(i)
            known_t = (1.0 - t_next) * known_c + t_next * noise
            return jnp.where(m_lat > 0.5, latents, known_t)

        latents = jax.lax.fori_loop(0, steps, body, latents)
        img = be.vae.apply(params["vae"], latents,
                           method=AutoencoderKL.decode)
        img = jnp.clip(img / 2.0 + 0.5, 0.0, 1.0)
        return jnp.where(mask_img > 0.5, img, known_img / 2.0 + 0.5)

    def paint(self, image, mask, prompt: str = "complete the depth map. ",
              size: int = 256, steps: int = 30) -> np.ndarray:
        """image [C,H,W] or [H,W,C] in [0,1]; mask [H,W]-ish, 1=hole."""
        be = self.backend
        x = np.asarray(image, np.float32)
        chw = x.ndim == 3 and x.shape[0] in (1, 3)
        if chw:
            x = x.transpose(1, 2, 0)
        m = np.asarray(mask, np.float32)
        if m.ndim == 3:
            m = m.max(axis=0) if m.shape[0] in (1, 3) else m.max(axis=-1)
        hw = x.shape[0]
        latent_hw = hw // be.factor
        txt, pooled = be.t5.encode(prompt)
        if be.dit_cfg.pooled_dim and \
                pooled.shape[-1] != be.dit_cfg.pooled_dim:
            pd = be.dit_cfg.pooled_dim
            reps = -(-pd // pooled.shape[-1])
            pooled = jnp.tile(pooled, (1, reps))[..., :pd]
        be.rng, k = jax.random.split(be.rng)
        params = be._acquire_params(latent_hw)
        try:
            out = self._sample(params, jnp.asarray(x * 2 - 1)[None],
                               jnp.asarray(m)[None, :, :, None], txt,
                               pooled, k, steps, be.guidance)
            out = np.asarray(out[0])
        finally:
            be._release_params(params)
        return out.transpose(2, 0, 1) if chw else out
