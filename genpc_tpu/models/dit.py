"""MMDiT (multimodal diffusion transformer), FLUX/Qwen-Image class, in flax.

The reference's preferred depth->image backends are DiT-family models
driven through diffusers: Qwen-Image-Edit (reference: tools/qwen_depth.py —
int4 transformer, 8-step lightning sampling, cfg 4.0) and FLUX.1-Depth-dev
(reference: tools/flux_depth.py — guidance 10, 30 steps).  Both share the
MMDiT shape: patchified image latents + text tokens, joint attention with
per-stream adaptive layer-norm modulation ("double" blocks) followed by
fused single-stream blocks, rectified-flow objective.

TPU-first: one token stream per modality, RoPE-free learned/sincos
positions (static shapes), bf16 matmuls with fp32 norms, whole sampler a
lax.fori_loop.  Depth conditioning follows the FLUX-Depth convention:
control latents concatenated along channels with the noisy latents.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from genpc_tpu.models.layers import timestep_embedding, tp_dense


@dataclass(frozen=True)
class DiTConfig:
    hidden_dim: int = 3072
    num_heads: int = 24
    double_blocks: int = 19
    single_blocks: int = 38
    patch_size: int = 2
    in_channels: int = 4          # latent channels
    cond_channels: int = 4        # control latent channels (0 = none)
    text_dim: int = 4096
    guidance_embed: bool = True   # FLUX distilled guidance conditioning

    @classmethod
    def preset(cls, name: str) -> "DiTConfig":
        if name == "tiny":
            return cls(hidden_dim=64, num_heads=4, double_blocks=2,
                       single_blocks=2, text_dim=64)
        if name == "flux":
            return cls()
        if name == "qwen":
            return cls(hidden_dim=3072, num_heads=24, double_blocks=60,
                       single_blocks=0, text_dim=3584, guidance_embed=False)
        raise ValueError(name)


class Modulation(nn.Module):
    """AdaLN modulation: vec -> (shift, scale, gate) per sub-layer."""
    dim: int
    n: int

    @nn.compact
    def __call__(self, vec):
        # trained checkpoints use adaLN-zero; a small random init keeps the
        # randomly-initialized architecture exercisable (gates nonzero)
        out = nn.Dense(self.dim * 3 * self.n, dtype=jnp.bfloat16,
                       kernel_init=nn.initializers.normal(0.02),
                       name="lin")(nn.silu(vec))
        return jnp.split(out[:, None, :], 3 * self.n, axis=-1)


def _attn(q, k, v, heads):
    dh = q.shape[-1] // heads
    split = lambda a: a.reshape(*a.shape[:-1], heads, dh)
    out = jax.nn.dot_product_attention(split(q), split(k), split(v))
    return out.reshape(*q.shape)


def _qknorm(q, k, dh):
    """RMS-normalize q/k per head (FLUX/Qwen stabilization)."""
    def rms(a):
        a2 = a.reshape(*a.shape[:-1], -1, dh)
        n = jax.lax.rsqrt(jnp.mean(a2.astype(jnp.float32) ** 2, -1,
                                   keepdims=True) + 1e-6)
        return (a2 * n).reshape(*a.shape).astype(a.dtype)
    return rms(q), rms(k)


class DoubleBlock(nn.Module):
    """Two-stream MMDiT block: separate img/txt params, joint attention."""
    cfg: DiTConfig

    @nn.compact
    def __call__(self, img, txt, vec):
        cfg = self.cfg
        d = cfg.hidden_dim
        (i_s1, i_sc1, i_g1, i_s2, i_sc2, i_g2) = Modulation(
            d, 2, name="img_mod")(vec)
        (t_s1, t_sc1, t_g1, t_s2, t_sc2, t_g2) = Modulation(
            d, 2, name="txt_mod")(vec)

        def ln(x):
            return nn.LayerNorm(use_bias=False, use_scale=False,
                                dtype=jnp.float32)(x)

        img_n = ln(img) * (1 + i_sc1) + i_s1
        txt_n = ln(txt) * (1 + t_sc1) + t_s1
        qi = tp_dense(d, name="img_q")(img_n)
        ki = tp_dense(d, name="img_k")(img_n)
        vi = tp_dense(d, name="img_v")(img_n)
        qt = tp_dense(d, name="txt_q")(txt_n)
        kt = tp_dense(d, name="txt_k")(txt_n)
        vt = tp_dense(d, name="txt_v")(txt_n)
        dh = d // cfg.num_heads
        qi, ki = _qknorm(qi, ki, dh)
        qt, kt = _qknorm(qt, kt, dh)
        q = jnp.concatenate([qt, qi], axis=1)
        k = jnp.concatenate([kt, ki], axis=1)
        v = jnp.concatenate([vt, vi], axis=1)
        att = _attn(q, k, v, cfg.num_heads)
        att_t, att_i = att[:, :txt.shape[1]], att[:, txt.shape[1]:]
        img = img + i_g1 * tp_dense(d, name="img_proj", shard="in")(att_i)
        txt = txt + t_g1 * tp_dense(d, name="txt_proj", shard="in")(att_t)

        img_n = ln(img) * (1 + i_sc2) + i_s2
        h = tp_dense(d * 4, name="img_mlp_in")(img_n)
        img = img + i_g2 * tp_dense(d, name="img_mlp_out", shard="in")(
            nn.gelu(h))
        txt_n = ln(txt) * (1 + t_sc2) + t_s2
        h = tp_dense(d * 4, name="txt_mlp_in")(txt_n)
        txt = txt + t_g2 * tp_dense(d, name="txt_mlp_out", shard="in")(
            nn.gelu(h))
        return img, txt


class SingleBlock(nn.Module):
    """Fused single-stream block over the concatenated sequence (FLUX)."""
    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, vec):
        cfg = self.cfg
        d = cfg.hidden_dim
        (s, sc, g) = Modulation(d, 1, name="mod")(vec)
        xn = nn.LayerNorm(use_bias=False, use_scale=False,
                          dtype=jnp.float32)(x) * (1 + sc) + s
        qkv_mlp = tp_dense(d * 3 + d * 4, name="lin1")(xn)
        q, k, v, h = jnp.split(qkv_mlp, [d, 2 * d, 3 * d], axis=-1)
        q, k = _qknorm(q, k, d // cfg.num_heads)
        att = _attn(q, k, v, cfg.num_heads)
        out = tp_dense(d, name="lin2", shard="in")(
            jnp.concatenate([att, nn.gelu(h)], axis=-1))
        return x + g * out


class MMDiT(nn.Module):
    cfg: DiTConfig

    @nn.compact
    def __call__(self, latents, t, txt, pooled=None, cond_latents=None,
                 guidance=None):
        """latents [B,H,W,C]; t [B] in [0,1]; txt [B,L,text_dim].

        Returns the predicted velocity with the latents' shape.
        """
        cfg = self.cfg
        b, h, w, c = latents.shape
        p = cfg.patch_size
        x = latents
        if cond_latents is not None:
            x = jnp.concatenate([x, cond_latents], axis=-1)
        # patchify
        x = x.reshape(b, h // p, p, w // p, p, x.shape[-1])
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, (h // p) * (w // p), p * p * x.shape[-1])
        img = tp_dense(cfg.hidden_dim, name="img_in")(x)
        pos = self.param("img_pos", nn.initializers.normal(0.02),
                         (1, img.shape[1], cfg.hidden_dim))
        img = img + pos
        txt_tok = tp_dense(cfg.hidden_dim, name="txt_in")(txt)

        vec = nn.Dense(cfg.hidden_dim, dtype=jnp.bfloat16, name="time_in")(
            timestep_embedding(t * 1000.0, 256))
        if pooled is not None:
            vec = vec + nn.Dense(cfg.hidden_dim, dtype=jnp.bfloat16,
                                 name="vector_in")(pooled)
        if cfg.guidance_embed and guidance is not None:
            vec = vec + nn.Dense(cfg.hidden_dim, dtype=jnp.bfloat16,
                                 name="guidance_in")(
                timestep_embedding(guidance * 1000.0, 256))

        for i in range(cfg.double_blocks):
            img, txt_tok = DoubleBlock(cfg, name=f"double_{i}")(img, txt_tok,
                                                                vec)
        if cfg.single_blocks:
            seq = jnp.concatenate([txt_tok, img], axis=1)
            for i in range(cfg.single_blocks):
                seq = SingleBlock(cfg, name=f"single_{i}")(seq, vec)
            img = seq[:, txt_tok.shape[1]:]

        img = nn.LayerNorm(use_bias=False, use_scale=False,
                           dtype=jnp.float32, name="norm_out")(img)
        (s, sc, _) = Modulation(cfg.hidden_dim, 1, name="mod_out")(vec)
        img = img * (1 + sc) + s
        out = nn.Dense(p * p * cfg.in_channels, dtype=jnp.float32,
                       name="proj_out")(img)
        out = out.reshape(b, h // p, w // p, p, p, cfg.in_channels)
        return out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w,
                                                       cfg.in_channels)
