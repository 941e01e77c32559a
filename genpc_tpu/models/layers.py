"""Shared neural building blocks (flax.linen) for the generative backends.

These implement the standard latent-diffusion component set the reference
drives through HF diffusers (reference: tools/controlnet_depth.py,
tools/adapter_depth.py, tools/qwen_depth.py, tools/flux_depth.py):
timestep embeddings, ResNet blocks, self/cross attention, and transformer
blocks — written TPU-first: bf16-friendly matmuls with fp32 accumulation,
static shapes, no data-dependent control flow, and logical sharding
annotations ("tp" on the wide dense kernels) so the same modules run
tensor-parallel under a mesh.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def timestep_embedding(t: jnp.ndarray, dim: int,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding [B] -> [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def tp_dense(features: int, name: str | None = None, use_bias: bool = True,
             shard: str = "out") -> nn.Dense:
    """Dense whose kernel is annotated for tensor-parallel sharding."""
    axes = ("embed", "tp") if shard == "out" else ("tp", "embed")
    return nn.Dense(
        features, use_bias=use_bias, name=name,
        dtype=jnp.bfloat16, param_dtype=jnp.float32,
        kernel_init=nn.with_logical_partitioning(
            nn.initializers.lecun_normal(), axes))


class TimestepEmbed(nn.Module):
    """MLP over the sinusoidal embedding (diffusers TimestepEmbedding)."""
    dim: int

    @nn.compact
    def __call__(self, t_emb):
        x = nn.Dense(self.dim, dtype=jnp.bfloat16, name="linear_1")(t_emb)
        x = nn.silu(x)
        return nn.Dense(self.dim, dtype=jnp.bfloat16, name="linear_2")(x)


class Attention(nn.Module):
    """Multi-head attention; cross-attention when context is given."""
    dim: int
    heads: int
    dim_head: Optional[int] = None

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        dh = self.dim_head or self.dim // self.heads
        inner = dh * self.heads
        q = tp_dense(inner, name="to_q", use_bias=False)(x)
        k = tp_dense(inner, name="to_k", use_bias=False)(context)
        v = tp_dense(inner, name="to_v", use_bias=False)(context)

        def split(a):
            return a.reshape(*a.shape[:-1], self.heads, dh)

        q, k, v = split(q), split(k), split(v)
        out = jax.nn.dot_product_attention(q, k, v)
        out = out.reshape(*out.shape[:-2], inner)
        return tp_dense(self.dim, name="to_out", shard="in")(out)


class FeedForward(nn.Module):
    """GEGLU feed-forward (diffusers convention)."""
    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = tp_dense(inner * 2, name="proj_in")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate)
        return tp_dense(self.dim, name="proj_out", shard="in")(h)


class RefBank:
    """Reference-attention token store (zero123plus conditioning).

    The zero123plus pipeline runs the UNet twice per step: a WRITE pass
    on the noised condition latents records every self-attention's
    post-norm hidden states; the READ pass on the sample concatenates
    the recorded tokens into each attn1's key/value sequence
    (reference: tools/instantmesh.py:83-86 — the custom zero123plus
    pipeline's ReferenceOnlyAttnProc).  Both passes traverse the UNet in
    the same order, so a positional bank replaces the name-keyed dict.
    """

    def __init__(self, mode: str, tokens=None):
        assert mode in ("w", "r")
        self.mode = mode
        self.tokens = [] if tokens is None else list(tokens)
        self._i = 0

    def visit(self, h):
        """WRITE: record h, return None.  READ: return the recorded
        tokens for this attention site."""
        if self.mode == "w":
            self.tokens.append(h)
            return None
        t = self.tokens[self._i]
        self._i += 1
        return t


class TransformerBlock(nn.Module):
    """Self-attn + cross-attn + FF, pre-LayerNorm (BasicTransformerBlock)."""
    dim: int
    heads: int
    context_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, context=None, ref: Optional[RefBank] = None):
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        ctx1 = None
        if ref is not None:
            r = ref.visit(h)
            if r is not None:
                ctx1 = jnp.concatenate([h, r.astype(h.dtype)], axis=1)
        x = x + Attention(self.dim, self.heads, name="attn1")(h, ctx1)
        x = x + Attention(self.dim, self.heads, name="attn2")(
            nn.LayerNorm(dtype=jnp.float32, name="norm2")(x), context)
        x = x + FeedForward(self.dim, name="ff")(
            nn.LayerNorm(dtype=jnp.float32, name="norm3")(x))
        return x


class SpatialTransformer(nn.Module):
    """Project NCHW features to tokens, run transformer blocks, project back."""
    dim: int
    heads: int
    depth: int = 1
    context_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, context=None, ref: Optional[RefBank] = None):
        b, h, w, c = x.shape
        residual = x
        x = nn.GroupNorm(num_groups=32, dtype=jnp.float32, name="norm")(x)
        x = nn.Dense(self.dim, dtype=jnp.bfloat16, name="proj_in")(x)
        x = x.reshape(b, h * w, self.dim)
        for i in range(self.depth):
            x = TransformerBlock(self.dim, self.heads,
                                 context_dim=self.context_dim,
                                 name=f"blocks_{i}")(x, context, ref)
        x = x.reshape(b, h, w, self.dim)
        x = nn.Dense(c, dtype=jnp.bfloat16, name="proj_out")(x)
        return x + residual


class ResnetBlock(nn.Module):
    """GroupNorm-SiLU-Conv ×2 with timestep injection (diffusers ResnetBlock2D)."""
    out_channels: int
    temb_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, temb=None):
        residual = x
        h = nn.GroupNorm(num_groups=32, dtype=jnp.float32, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1,
                    dtype=jnp.bfloat16, name="conv1")(h)
        if temb is not None and self.temb_dim is not None:
            t = nn.Dense(self.out_channels, dtype=jnp.bfloat16,
                         name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=32, dtype=jnp.float32, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1,
                    dtype=jnp.bfloat16, name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1),
                               dtype=jnp.bfloat16, name="conv_shortcut")(residual)
        return (h + residual) / 1.0


class Downsample(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=1,
                       dtype=jnp.bfloat16, name="conv")(x)


class Upsample(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1,
                       dtype=jnp.bfloat16, name="conv")(x)
