"""T2I-Adapter conditioning (reference: tools/adapter_depth.py).

The adapter variant conditions the UNet by *adding* a pyramid of features
extracted from the depth map to the down-path activations (one tensor per
resolution level), instead of ControlNet's full-trunk residual taps — a
~10x smaller conditioning network (TencentARC t2i-adapter-depth-zoe-sdxl
in the reference, tools/adapter_depth.py:19-58).
"""

from __future__ import annotations

from typing import List, Sequence

import flax.linen as nn
import jax.numpy as jnp


class AdapterResBlock(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=jnp.bfloat16,
                    name="conv1")(nn.relu(x))
        h = nn.Conv(self.channels, (3, 3), padding=1, dtype=jnp.bfloat16,
                    name="conv2")(nn.relu(h))
        if x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1, 1), dtype=jnp.bfloat16,
                        name="skip")(x)
        return x + h


class T2IAdapter(nn.Module):
    """Depth image -> one additive feature map per UNet resolution level.

    channels should mirror the UNet's block_out_channels; the first level
    feature lands at the latent resolution (image downscaled by the VAE
    factor via pixel-unshuffle + conv).
    """
    channels: Sequence[int]
    downscale: int = 8

    @nn.compact
    def __call__(self, cond_image) -> List[jnp.ndarray]:
        b, h, w, c = cond_image.shape
        f = self.downscale
        # pixel-unshuffle to latent resolution
        x = cond_image.reshape(b, h // f, f, w // f, f, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // f, w // f,
                                                  f * f * c)
        x = nn.Conv(self.channels[0], (3, 3), padding=1,
                    dtype=jnp.bfloat16, name="conv_in")(x)
        feats = []
        for i, ch in enumerate(self.channels):
            if i > 0:
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1,
                            dtype=jnp.bfloat16, name=f"down_{i}")(x)
            x = AdapterResBlock(ch, name=f"res_{i}a")(x)
            x = AdapterResBlock(ch, name=f"res_{i}b")(x)
            feats.append(x.astype(jnp.float32))
        return feats
