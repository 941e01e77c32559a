"""Conditional latent-diffusion UNet + ControlNet, flax/TPU-native.

Architecture-compatible with the SDXL-class UNet2DConditionModel the
reference drives through diffusers (reference: tools/controlnet_depth.py
:17-52 loads xinsir/controlnet-depth-sdxl-1.0 + stabilityai SDXL base;
tools/adapter_depth.py uses the T2I-adapter variant).  Written TPU-first:
NHWC layout, bf16 compute with fp32 norms, static shapes, the whole
denoise loop jit-compiled (models/controlnet_depth.py drives it with
lax.fori_loop).

Size presets let tests run the genuine architecture at toy width; the
"sdxl" preset matches the checkpoint dimensions so safetensors weights
convert directly (genpc_tpu/models/weights.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from genpc_tpu.models.layers import (
    Downsample, RefBank, ResnetBlock, SpatialTransformer, TimestepEmbed,
    Upsample, timestep_embedding)


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280)
    layers_per_block: int = 2
    transformer_depths: Tuple[int, ...] = (0, 2, 10)   # per resolution level
    context_dim: int = 2048
    attention_head_dim: int = 64
    addition_embed_dim: int = 0      # SDXL micro-conditioning (2816)
    time_embed_dim: Optional[int] = None
    mid_depth: Optional[int] = None  # None -> transformer_depths[-1]

    @property
    def temb_dim(self) -> int:
        return self.time_embed_dim or self.block_out_channels[0] * 4

    @classmethod
    def preset(cls, name: str) -> "UNetConfig":
        if name == "tiny":
            # addition_embed_dim = tiny pooled (64) + 6 x 256 time-id
            # sinusoids, so tiny tests exercise the SDXL micro-conditioning
            return cls(block_out_channels=(32, 64),
                       layers_per_block=1, transformer_depths=(0, 1),
                       context_dim=64, attention_head_dim=16,
                       addition_embed_dim=64 + 6 * 256)
        if name == "base":   # SD-1.5 class
            return cls(block_out_channels=(320, 640, 1280, 1280),
                       layers_per_block=2,
                       transformer_depths=(1, 1, 1, 0),
                       context_dim=768, attention_head_dim=8)
        if name == "sdxl":
            return cls(block_out_channels=(320, 640, 1280),
                       layers_per_block=2, transformer_depths=(0, 2, 10),
                       context_dim=2048, attention_head_dim=64,
                       addition_embed_dim=2816)
        if name == "sd2":
            # zero123plus v1.2 backbone (SD-2.1 class): 4 levels, last
            # down block attention-free, attention mid block, 1024-d
            # context (reference: tools/instantmesh.py:83-98 loads the
            # InstantMesh white-background UNet into this layout)
            return cls(block_out_channels=(320, 640, 1280, 1280),
                       layers_per_block=2,
                       transformer_depths=(1, 1, 1, 0), mid_depth=1,
                       context_dim=1024, attention_head_dim=64)
        raise ValueError(name)


class CrossAttnDownBlock(nn.Module):
    cfg: UNetConfig
    out_channels: int
    tf_depth: int
    add_downsample: bool

    @nn.compact
    def __call__(self, x, temb, context, ref=None):
        skips = []
        for i in range(self.cfg.layers_per_block):
            x = ResnetBlock(self.out_channels, self.cfg.temb_dim,
                            name=f"resnets_{i}")(x, temb)
            if self.tf_depth > 0:
                heads = self.out_channels // self.cfg.attention_head_dim
                x = SpatialTransformer(self.out_channels, heads,
                                       depth=self.tf_depth,
                                       context_dim=self.cfg.context_dim,
                                       name=f"attentions_{i}")(x, context,
                                                               ref)
            skips.append(x)
        if self.add_downsample:
            x = Downsample(self.out_channels, name="downsample")(x)
            skips.append(x)
        return x, skips


class CrossAttnUpBlock(nn.Module):
    cfg: UNetConfig
    out_channels: int
    tf_depth: int
    add_upsample: bool

    @nn.compact
    def __call__(self, x, skips, temb, context, ref=None):
        for i in range(self.cfg.layers_per_block + 1):
            skip = skips.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = ResnetBlock(self.out_channels, self.cfg.temb_dim,
                            name=f"resnets_{i}")(x, temb)
            if self.tf_depth > 0:
                heads = self.out_channels // self.cfg.attention_head_dim
                x = SpatialTransformer(self.out_channels, heads,
                                       depth=self.tf_depth,
                                       context_dim=self.cfg.context_dim,
                                       name=f"attentions_{i}")(x, context,
                                                               ref)
        if self.add_upsample:
            x = Upsample(self.out_channels, name="upsample")(x)
        return x


class MidBlock(nn.Module):
    cfg: UNetConfig
    channels: int
    tf_depth: int

    @nn.compact
    def __call__(self, x, temb, context, ref=None):
        x = ResnetBlock(self.channels, self.cfg.temb_dim, name="resnets_0")(x, temb)
        if self.tf_depth > 0:
            heads = self.channels // self.cfg.attention_head_dim
            x = SpatialTransformer(self.channels, heads, depth=self.tf_depth,
                                   context_dim=self.cfg.context_dim,
                                   name="attentions_0")(x, context, ref)
        x = ResnetBlock(self.channels, self.cfg.temb_dim, name="resnets_1")(x, temb)
        return x


class UNetCore(nn.Module):
    """Shared down+mid trunk (the full UNet and ControlNet both use it)."""
    cfg: UNetConfig

    @nn.compact
    def __call__(self, latents, temb, context,
                 cond_residual: Optional[jnp.ndarray] = None,
                 adapter_features=None, ref: Optional[RefBank] = None):
        cfg = self.cfg
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=jnp.bfloat16, name="conv_in")(latents)
        if cond_residual is not None:
            x = x + cond_residual
        skips = [x]
        for level, ch in enumerate(cfg.block_out_channels):
            last = level == len(cfg.block_out_channels) - 1
            if adapter_features is not None and level < len(adapter_features):
                x = x + adapter_features[level]   # T2I-adapter injection
            x, s = CrossAttnDownBlock(
                cfg, ch, cfg.transformer_depths[level],
                add_downsample=not last, name=f"down_{level}")(
                x, temb, context, ref)
            skips += s
        mid_depth = (cfg.mid_depth if cfg.mid_depth is not None
                     else cfg.transformer_depths[-1])
        x = MidBlock(cfg, cfg.block_out_channels[-1],
                     mid_depth, name="mid")(x, temb, context, ref)
        return x, skips


class UNet2DCondition(nn.Module):
    """Full UNet: core + up path; accepts ControlNet residuals."""
    cfg: UNetConfig

    def time_context(self, t, added_cond=None):
        cfg = self.cfg
        temb = timestep_embedding(t, cfg.block_out_channels[0])
        return temb

    @nn.compact
    def __call__(self, latents, t, context, added_cond=None,
                 control_residuals=None, cond_residual=None,
                 adapter_features=None, ref: Optional[RefBank] = None):
        cfg = self.cfg
        temb = timestep_embedding(t, cfg.block_out_channels[0])
        temb = TimestepEmbed(cfg.temb_dim, name="time_embedding")(temb)
        if cfg.addition_embed_dim and added_cond is not None:
            temb = temb + TimestepEmbed(cfg.temb_dim,
                                        name="add_embedding")(added_cond)
        temb = nn.silu(temb)

        x, skips = UNetCore(cfg, name="core")(latents, temb, context,
                                              cond_residual,
                                              adapter_features, ref)
        if control_residuals is not None:
            mid_res, down_res = control_residuals
            x = x + mid_res
            skips = [s + r for s, r in zip(skips, down_res)]

        for level in reversed(range(len(cfg.block_out_channels))):
            ch = cfg.block_out_channels[level]
            x = CrossAttnUpBlock(
                cfg, ch, cfg.transformer_depths[level],
                add_upsample=level > 0, name=f"up_{level}")(
                x, skips, temb, context, ref)
        x = nn.GroupNorm(num_groups=32, dtype=jnp.float32,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1,
                       dtype=jnp.float32, name="conv_out")(x)


class ControlNetConditioningEmbedding(nn.Module):
    """Depth image -> latent-resolution conditioning features.

    len(channels)-1 stride-2 convs: match it to the VAE spatial factor
    (SDXL: (16,32,96,256) -> ÷8)."""
    out_channels: int
    channels: Sequence[int] = (16, 32, 96, 256)

    @nn.compact
    def __call__(self, cond_image):
        x = nn.Conv(self.channels[0], (3, 3), padding=1,
                    dtype=jnp.bfloat16, name="conv_in")(cond_image)
        x = nn.silu(x)
        for i in range(len(self.channels) - 1):
            x = nn.Conv(self.channels[i], (3, 3), padding=1,
                        dtype=jnp.bfloat16, name=f"blocks_{2*i}")(x)
            x = nn.silu(x)
            x = nn.Conv(self.channels[i + 1], (3, 3), strides=(2, 2),
                        padding=1, dtype=jnp.bfloat16,
                        name=f"blocks_{2*i+1}")(x)
            x = nn.silu(x)
        # diffusers zero_module(Conv2d(..., kernel_size=3)) — 3x3, zeroed
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       dtype=jnp.float32, kernel_init=nn.initializers.zeros,
                       name="conv_out")(x)


class ZeroConv(nn.Module):
    """Zero-initialized 1x1 conv (ControlNet residual gates)."""
    channels: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (1, 1), dtype=jnp.float32,
                       kernel_init=nn.initializers.zeros,
                       name="conv")(x)


class ControlNet(nn.Module):
    """ControlNet: UNet trunk + zero-conv residual taps.

    Returns (mid_residual, [down_residuals]) shaped to add onto the full
    UNet's skip stack (reference behavior of diffusers ControlNetModel).
    """
    cfg: UNetConfig
    cond_channels: Sequence[int] = (16, 32, 96, 256)

    @nn.compact
    def __call__(self, latents, t, context, cond_image, added_cond=None,
                 conditioning_scale: float = 1.0):
        cfg = self.cfg
        temb = timestep_embedding(t, cfg.block_out_channels[0])
        temb = TimestepEmbed(cfg.temb_dim, name="time_embedding")(temb)
        if cfg.addition_embed_dim and added_cond is not None:
            temb = temb + TimestepEmbed(cfg.temb_dim,
                                        name="add_embedding")(added_cond)
        temb = nn.silu(temb)

        cond = ControlNetConditioningEmbedding(
            cfg.block_out_channels[0], channels=self.cond_channels,
            name="cond_embedding")(cond_image)
        x, skips = UNetCore(cfg, name="core")(latents, temb, context,
                                              cond_residual=cond)
        down_res = []
        for i, s in enumerate(skips):
            down_res.append(
                ZeroConv(s.shape[-1], name=f"zero_down_{i}")(s)
                * conditioning_scale)
        mid_res = ZeroConv(x.shape[-1], name="zero_mid")(x) * conditioning_scale
        return mid_res, down_res
