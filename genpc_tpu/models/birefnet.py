"""BiRefNet-class matting network (RMBG-2.0) in flax.

The reference removes backgrounds with RMBG-2.0 (reference:
tools/RMBG.py:10-13 — transformers AutoModelForImageSegmentation with
trust_remote_code; the remote code is BiRefNet: a Swin-v1-Large backbone
feeding a progressive bilateral-reference decoder; 1024² input, sigmoid
matte output from the last decoder stage, reference RMBG.py:52).

Parameter layout mirrors the public BiRefNet implementation
(checkpoint_specs.spec_birefnet): the Swin backbone under ``bb`` (the
original Microsoft Swin-Transformer dense-prediction variant: per-stage
out-norms, fused qkv, relative-position bias tables), `squeeze_module`,
`decoder_block4..1` (BasicDecBlk: conv_in/bn_in/conv_out/bn_out),
`lateral_block4..2` (1x1 lateral convs), the `gdt_convs` guidance branch
and `conv_out1`.  The backbone inventory is exact; the decoder block
internals are reconstructed from the public source (zero-egress container
— shape-verified by tests/test_checkpoints.py; a real checkpoint either
grafts 100% or raises with the precise missing keys).

TPU-first: NHWC, window attention as static reshapes + one batched
attention over all windows (no data-dependent control flow), BatchNorm in
inference mode from checkpoint running stats.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class BiRefNetConfig:
    embed_dim: int = 192                    # swin_v1_large
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (6, 12, 24, 48)
    window: int = 12
    patch: int = 4
    img_size: int = 1024
    dec_inter: int = 64                     # BasicDecBlk hidden width
    gdt_ch: int = 64                        # guidance branch width

    @property
    def channels(self) -> Tuple[int, ...]:
        d = self.embed_dim
        return (d, 2 * d, 4 * d, 8 * d)

    @classmethod
    def preset(cls, name: str) -> "BiRefNetConfig":
        if name == "tiny":
            return cls(embed_dim=16, depths=(1, 1, 1, 1),
                       num_heads=(2, 2, 2, 2), window=4, patch=4,
                       img_size=64, dec_inter=8, gdt_ch=8)
        return cls()


# ------------------------------------------------------------------ Swin

def window_partition(x, w):
    """[B,H,W,C] -> [B*nw, w*w, C] (row-major windows)."""
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def window_reverse(x, w, h, wd):
    b = x.shape[0] // ((h // w) * (wd // w))
    x = x.reshape(b, h // w, wd // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, wd, -1)


def relative_position_index(w: int) -> np.ndarray:
    """The Swin (2w-1)^2 bias-table index for a w*w window."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij"))            # [2,w,w]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]                # [2,T,T]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    heads: int
    window: int

    @nn.compact
    def __call__(self, x, mask=None):
        """x [nW, T, C]; mask [nw_per_img, T, T] additive or None."""
        nw, t, c = x.shape
        qkv = nn.Dense(3 * c, dtype=jnp.bfloat16, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = c // self.heads
        split = lambda a: a.reshape(nw, t, self.heads, hd)
        table = self.param("relative_position_bias_table",
                           nn.initializers.normal(0.02),
                           ((2 * self.window - 1) ** 2, self.heads))
        idx = jnp.asarray(relative_position_index(self.window))
        bias = table[idx.reshape(-1)].reshape(t, t, self.heads)
        bias = bias.transpose(2, 0, 1)[None]                 # [1,h,T,T]
        if mask is not None:
            # additive window masks: tile over batch images
            m = jnp.tile(mask[:, None], (nw // mask.shape[0], 1, 1, 1))
            bias = bias + m
        att = jax.nn.dot_product_attention(
            split(q), split(k), split(v),
            bias=jnp.broadcast_to(bias, (nw, self.heads, t, t)))
        att = att.reshape(nw, t, c)
        return nn.Dense(c, dtype=jnp.bfloat16, name="proj")(att)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int
    shift: int

    @nn.compact
    def __call__(self, x):
        """x [B,H,W,C]; pads H,W up to window multiples (swin forward pad)."""
        b, h0, w0, c = x.shape
        ws = self.window
        res = x
        x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        pad_h = (-h0) % ws
        pad_w = (-w0) % ws
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        h, w = h0 + pad_h, w0 + pad_w
        if self.shift:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
        wins = window_partition(x, ws)
        mask = None
        if self.shift:
            # standard swin attention mask for shifted windows
            img_mask = np.zeros((1, h, w, 1), np.float32)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -self.shift),
                       slice(-self.shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -self.shift),
                            slice(-self.shift, None)):
                    img_mask[:, hs, wsl, :] = cnt
                    cnt += 1
            mw = window_partition(jnp.asarray(img_mask), ws)[..., 0]
            diff = mw[:, None, :] - mw[:, :, None]
            mask = jnp.where(diff != 0, -1e9, 0.0)
        wins = WindowAttention(self.dim, self.heads, ws,
                               name="attn")(wins, mask)
        x = window_reverse(wins, ws, h, w)
        if self.shift:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = res + x[:, :h0, :w0]
        h2 = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        h2 = nn.gelu(nn.Dense(4 * c, dtype=jnp.bfloat16, name="fc1")(h2))
        return x + nn.Dense(c, dtype=jnp.bfloat16, name="fc2")(h2)


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        # swin concat order: x0=(0,0) x1=(1,0) x2=(0,1) x3=(1,1)
        x0 = x[:, :, 0, :, 0]
        x1 = x[:, :, 1, :, 0]
        x2 = x[:, :, 0, :, 1]
        x3 = x[:, :, 1, :, 1]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=jnp.bfloat16,
                        name="reduction")(x)


class SwinBackbone(nn.Module):
    """Microsoft Swin-v1 dense-prediction backbone (BiRefNet's ``bb``)."""
    cfg: BiRefNetConfig

    @nn.compact
    def __call__(self, img):
        cfg = self.cfg
        x = nn.Conv(cfg.embed_dim, (cfg.patch, cfg.patch),
                    strides=(cfg.patch, cfg.patch), dtype=jnp.bfloat16,
                    name="patch_embed_proj")(img)
        x = nn.LayerNorm(dtype=jnp.float32, name="patch_embed_norm")(x)
        outs = []
        for l, depth in enumerate(cfg.depths):
            dim = cfg.channels[l]
            for bidx in range(depth):
                shift = 0 if bidx % 2 == 0 else cfg.window // 2
                x = SwinBlock(dim, cfg.num_heads[l], cfg.window, shift,
                              name=f"layer_{l}_block_{bidx}")(x)
            out = nn.LayerNorm(dtype=jnp.float32, name=f"out_norm_{l}")(x)
            outs.append(out)
            if l < len(cfg.depths) - 1:
                x = PatchMerging(dim, name=f"downsample_{l}")(x)
        return outs      # strides 4, 8, 16, 32


# --------------------------------------------------------------- decoder

class BatchNorm2dInference(nn.Module):
    """Inference-mode BatchNorm fed from checkpoint running stats."""
    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros(self.features))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones(self.features))
        inv = jax.lax.rsqrt(var.value + 1e-5)
        return (x - mean.value) * inv * scale + bias


class BasicDecBlk(nn.Module):
    """BiRefNet BasicDecBlk: conv_in -> bn_in -> relu -> conv_out -> bn_out."""
    out_channels: int
    inter: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.inter, (3, 3), padding=1, dtype=jnp.bfloat16,
                    name="conv_in")(x)
        x = BatchNorm2dInference(self.inter, name="bn_in")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1,
                    dtype=jnp.bfloat16, name="conv_out")(x)
        return BatchNorm2dInference(self.out_channels, name="bn_out")(x)


class BasicLatBlk(nn.Module):
    """BiRefNet lateral block: a 1x1 conv."""
    out_channels: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.out_channels, (1, 1), dtype=jnp.bfloat16,
                       name="conv")(x)


def _up2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), "bilinear")


class BiRefNet(nn.Module):
    """Backbone + progressive decoder; returns the final sigmoid matte."""
    cfg: BiRefNetConfig

    @nn.compact
    def __call__(self, img):
        """img [B,H,W,3] normalized (x-0.5); returns matte [B,H,W,1]."""
        cfg = self.cfg
        ch = cfg.channels
        feats = SwinBackbone(cfg, name="bb")(img)     # strides 4,8,16,32
        x4 = BasicDecBlk(ch[3], cfg.dec_inter,
                         name="squeeze_module_0")(feats[3])

        def gdt(x, tag):
            g = nn.Conv(cfg.gdt_ch, (3, 3), padding=1, dtype=jnp.bfloat16,
                        name=f"gdt_convs_{tag}_conv")(x)
            g = BatchNorm2dInference(cfg.gdt_ch,
                                     name=f"gdt_convs_{tag}_bn")(g)
            g = nn.relu(g)
            attn = nn.Conv(1, (1, 1), dtype=jnp.float32,
                           name=f"gdt_convs_attn_{tag}")(g)
            pred = nn.Conv(1, (1, 1), dtype=jnp.float32,
                           name=f"gdt_convs_pred_{tag}")(g)
            return x * jax.nn.sigmoid(attn), pred

        p4 = BasicDecBlk(ch[2], cfg.dec_inter, name="decoder_block4")(x4)
        p4, _ = gdt(p4, "4")
        p4 = _up2(p4)
        x3 = p4 + BasicLatBlk(ch[2], name="lateral_block4")(feats[2])

        p3 = BasicDecBlk(ch[1], cfg.dec_inter, name="decoder_block3")(x3)
        p3, _ = gdt(p3, "3")
        p3 = _up2(p3)
        x2 = p3 + BasicLatBlk(ch[1], name="lateral_block3")(feats[1])

        p2 = BasicDecBlk(ch[0], cfg.dec_inter, name="decoder_block2")(x2)
        p2, _ = gdt(p2, "2")
        p2 = _up2(p2)
        x1 = p2 + BasicLatBlk(ch[0], name="lateral_block2")(feats[0])

        p1 = BasicDecBlk(ch[0] // 2, cfg.dec_inter,
                         name="decoder_block1")(x1)
        b, h, w, c = p1.shape
        p1 = jax.image.resize(p1, (b, cfg.patch * h, cfg.patch * w, c),
                              "bilinear")
        out = nn.Conv(1, (1, 1), dtype=jnp.float32, name="conv_out1")(p1)
        return jax.nn.sigmoid(out)
