"""AutoencoderKL (SDXL-class VAE) in flax.

The reference decodes SDXL latents with the fp16-fix VAE
(reference: tools/controlnet_depth.py:23-27 madebyollin/sdxl-vae-fp16-fix).
NHWC, attention mid-block, 8x spatial factor, scaling_factor 0.13025
(SDXL).  Size presets for tests.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from genpc_tpu.models.layers import Attention, Downsample, ResnetBlock, Upsample


@dataclass(frozen=True)
class VAEConfig:
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = 0.13025

    @property
    def spatial_factor(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    @classmethod
    def preset(cls, name: str) -> "VAEConfig":
        if name == "tiny":
            # keep the real ÷8 spatial factor: at generate_res 512 a ÷2
            # factor would give 65k-token attention maps (HBM OOM)
            return cls(block_out_channels=(32, 32, 64, 64),
                       layers_per_block=1, scaling_factor=0.13025)
        if name == "flux":
            # FLUX/Qwen-family 16-channel VAE
            return cls(latent_channels=16, scaling_factor=0.3611)
        return cls()


class VAEAttnBlock(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(num_groups=32, dtype=jnp.float32, name="norm")(x)
        x = x.reshape(b, h * w, c)
        x = Attention(c, heads=1, name="attn")(x)
        return res + x.reshape(b, h, w, c)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, img):
        cfg = self.cfg
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=jnp.bfloat16, name="conv_in")(img)
        for level, ch in enumerate(cfg.block_out_channels):
            for i in range(cfg.layers_per_block):
                x = ResnetBlock(ch, name=f"down_{level}_res_{i}")(x)
            if level < len(cfg.block_out_channels) - 1:
                x = Downsample(ch, name=f"down_{level}_ds")(x)
        ch = cfg.block_out_channels[-1]
        x = ResnetBlock(ch, name="mid_res_0")(x)
        x = VAEAttnBlock(ch, name="mid_attn")(x)
        x = ResnetBlock(ch, name="mid_res_1")(x)
        x = nn.GroupNorm(num_groups=32, dtype=jnp.float32, name="norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                       dtype=jnp.float32, name="conv_out")(x)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        ch = cfg.block_out_channels[-1]
        x = nn.Conv(ch, (3, 3), padding=1, dtype=jnp.bfloat16,
                    name="conv_in")(z)
        x = ResnetBlock(ch, name="mid_res_0")(x)
        x = VAEAttnBlock(ch, name="mid_attn")(x)
        x = ResnetBlock(ch, name="mid_res_1")(x)
        for level in reversed(range(len(cfg.block_out_channels))):
            ch = cfg.block_out_channels[level]
            for i in range(cfg.layers_per_block + 1):
                x = ResnetBlock(ch, name=f"up_{level}_res_{i}")(x)
            if level > 0:
                x = Upsample(ch, name=f"up_{level}_us")(x)
        x = nn.GroupNorm(num_groups=32, dtype=jnp.float32, name="norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(3, (3, 3), padding=1, dtype=jnp.float32,
                       name="conv_out")(x)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg, name="encoder")
        self.decoder = Decoder(self.cfg, name="decoder")
        # the 1x1 moment/latent convs diffusers checkpoints carry
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1),
                                  dtype=jnp.float32, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1),
                                       dtype=jnp.float32,
                                       name="post_quant_conv")

    def encode(self, img, rng=None):
        """img [B,H,W,3] in [-1,1] -> scaled latents (mode if rng None)."""
        moments = self.quant_conv(self.encoder(img))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if rng is not None:
            std = jnp.exp(0.5 * jnp.clip(logvar, -30, 20))
            mean = mean + std * jax.random.normal(rng, mean.shape)
        return mean * self.cfg.scaling_factor

    def decode(self, latents):
        """scaled latents -> image [B,H,W,3] in [-1,1]."""
        return self.decoder(
            self.post_quant_conv(latents / self.cfg.scaling_factor))

    def __call__(self, img, rng=None):
        return self.decode(self.encode(img, rng))
