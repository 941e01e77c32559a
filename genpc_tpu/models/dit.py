"""MMDiT (multimodal diffusion transformer), FLUX/Qwen-Image class, in flax.

The reference's preferred depth->image backends are DiT-family models
driven through diffusers: Qwen-Image-Edit (reference: tools/qwen_depth.py —
int4 transformer, 8-step lightning sampling, cfg 4.0) and FLUX.1-Depth-dev
(reference: tools/flux_depth.py — guidance 10, 30 steps).

The parameter tree here is ISOMORPHIC to the public diffusers
implementations (FluxTransformer2DModel / QwenImageTransformer2DModel), so
real checkpoints graft tensor-for-tensor (genpc_tpu/models/weights.py
:convert_flux / :convert_qwen; the exact name inventory lives in
genpc_tpu/models/checkpoint_specs.py and is round-trip-tested):
  * double-stream blocks: separate img/txt QKV + output projections,
    joint attention, AdaLN-zero modulation per stream (6 chunks), GELU-tanh
    MLPs;
  * FLUX additionally: 38 fused single-stream blocks (3-chunk AdaLN,
    fused attention+MLP with proj_mlp/proj_out), distilled-guidance and
    pooled-text embedders;
  * Qwen additionally: RMS text-input norm, edit-image latents joined
    along the token SEQUENCE (not channels);
  * 3-axis RoPE on q/k per head (axes_dim summing to head_dim), learned
    per-head-dim RMS q/k norms.

TPU-first: bf16 matmuls with fp32 norms/modulation, static shapes, RoPE
tables computed once per call from static token grids, whole sampler a
lax.fori_loop (models/dit_depth.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from genpc_tpu.models.layers import timestep_embedding


@dataclass(frozen=True)
class DiTConfig:
    hidden_dim: int = 3072
    num_heads: int = 24
    double_blocks: int = 19
    single_blocks: int = 38
    patch_size: int = 2
    in_channels: int = 16         # latent channels (FLUX VAE: 16)
    cond_channels: int = 16       # control latent channels (0 = none)
    text_dim: int = 4096          # T5-XXL (flux) / Qwen2.5-VL (3584)
    pooled_dim: int = 768         # CLIP-L pooled (flux only)
    guidance_embed: bool = True   # FLUX distilled guidance conditioning
    txt_input_norm: bool = False  # Qwen RMS-norms text features on input
    cond_mode: str = "channels"   # 'channels' (flux) | 'sequence' (qwen)
    axes_dim: Tuple[int, int, int] = (16, 56, 56)  # RoPE dims per axis
    theta: int = 10000
    # weight-only quantization of every block matmul: 0 = bf16, 8 = int8
    # (FLUX-12B fits one 16 GB v5e), 4 = int4 (Qwen-20B fits) — the TPU
    # equivalent of the reference's Nunchaku int4 single-GPU deployment
    # (reference: tools/qwen_depth.py:50-62, tools/flux_depth.py:12-30)
    quant_bits: int = 0

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.num_heads

    @classmethod
    def preset(cls, name: str) -> "DiTConfig":
        if name == "tiny":
            return cls(hidden_dim=64, num_heads=4, double_blocks=2,
                       single_blocks=2, in_channels=4, cond_channels=4,
                       text_dim=64, pooled_dim=32, axes_dim=(4, 6, 6))
        if name == "tiny_qwen":
            return cls(hidden_dim=64, num_heads=4, double_blocks=2,
                       single_blocks=0, in_channels=4, cond_channels=4,
                       text_dim=64, pooled_dim=0, guidance_embed=False,
                       txt_input_norm=True, cond_mode="sequence",
                       axes_dim=(4, 6, 6))
        if name == "base":
            # mid-size A/B scale: real enough width (768/12-head) for
            # quantization-noise averaging, small enough to run anywhere
            return cls(hidden_dim=768, num_heads=12, double_blocks=4,
                       single_blocks=8, in_channels=4, cond_channels=4,
                       text_dim=64, pooled_dim=64, axes_dim=(16, 24, 24))
        if name == "base_qwen":
            return cls(hidden_dim=768, num_heads=12, double_blocks=8,
                       single_blocks=0, in_channels=4, cond_channels=4,
                       text_dim=64, pooled_dim=0, guidance_embed=False,
                       txt_input_norm=True, cond_mode="sequence",
                       axes_dim=(16, 24, 24))
        if name == "flux":
            # FLUX.1-Depth-dev: x_embedder in = 2*2*(16+16) = 128
            return cls()
        if name == "qwen":
            # Qwen-Image-Edit: 60 double blocks, no single stream
            return cls(hidden_dim=3072, num_heads=24, double_blocks=60,
                       single_blocks=0, text_dim=3584, pooled_dim=0,
                       guidance_embed=False, txt_input_norm=True,
                       cond_mode="sequence")
        raise ValueError(name)


class TimestepEmbedder(nn.Module):
    """diffusers TimestepEmbedding: linear_1 -> silu -> linear_2."""
    dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim, dtype=jnp.bfloat16, name="linear_1")(x)
        return nn.Dense(self.dim, dtype=jnp.bfloat16,
                        name="linear_2")(nn.silu(x))


class RMSNorm(nn.Module):
    """RMS norm with a learned scale (diffusers RMSNorm / qk-norm)."""
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        n = jax.lax.rsqrt(jnp.mean(
            x.astype(jnp.float32) ** 2, -1, keepdims=True) + self.eps)
        return (x.astype(jnp.float32) * n * scale).astype(x.dtype)


# ----------------------------------------------------------------- RoPE

def rope_table(ids: jnp.ndarray, axes_dim: Tuple[int, ...], theta: int
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ids [T,3] -> (cos, sin) each [T, head_dim//2] (pairwise rotation).

    The FLUX-family 3-axis rotary embedding: each position axis gets
    axes_dim[a]//2 frequencies, concatenated along the feature dim.
    """
    cos_parts, sin_parts = [], []
    for a, d in enumerate(axes_dim):
        half = d // 2
        freqs = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32)
                                 * 2.0 / d))
        ang = ids[:, a:a + 1].astype(jnp.float32) * freqs[None, :]
        cos_parts.append(jnp.cos(ang))
        sin_parts.append(jnp.sin(ang))
    return jnp.concatenate(cos_parts, -1), jnp.concatenate(sin_parts, -1)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
               ) -> jnp.ndarray:
    """x [B,T,H,D] with D even; rotate consecutive pairs by (cos,sin) [T,D/2]."""
    xf = x.astype(jnp.float32)
    x1 = xf[..., 0::2]
    x2 = xf[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    r1 = x1 * c - x2 * s
    r2 = x1 * s + x2 * c
    out = jnp.stack([r1, r2], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


# Above this joint-sequence length the full [T,T] f32 logits matrix is
# switched for query-chunked exact attention: at the 1024² presets
# T=4608 and [heads,T,T] f32 is ~1.9 GB live TWICE (logits + softmax) —
# the allocation that OOMed the int8 FLUX preset on one 16 GB v5e chip.
_ATTN_CHUNK_MIN_T = 2048
_ATTN_Q_CHUNK = 512


def _chunked_attention(q, k, v, mask=None, chunk=_ATTN_Q_CHUNK):
    """Exact attention scanned over query chunks (q/k/v [B,T,H,dh]).

    Softmax is per-query-row, so chunking queries is mathematically
    identical to the unchunked product while the live f32 logits buffer
    shrinks from [B,H,T,T] to [B,H,chunk,T] (~0.2 GB at the FLUX 1024²
    preset vs ~1.9 GB).  Keys/values stay whole and resident — no online
    softmax rescaling needed.  mask [B,T] marks valid KEY tokens.
    """
    b, t, h, dh = q.shape
    n = -(-t // chunk)
    tp = n * chunk
    qp = jnp.pad(q, ((0, 0), (0, tp - t), (0, 0), (0, 0)))
    qs = qp.reshape(b, n, chunk, h, dh).transpose(1, 0, 2, 3, 4)
    scale = 1.0 / np.sqrt(dh)
    bias = (None if mask is None else
            jnp.where(mask, 0.0, jnp.finfo(jnp.float32).min)
            [:, None, None, :])

    def body(_, qc):
        logits = jnp.einsum("bqhd,bkhd->bhqk", qc, k,
                            preferred_element_type=jnp.float32) * scale
        if bias is not None:
            logits = logits + bias
        w = jax.nn.softmax(logits, axis=-1)
        oc = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v)
        return None, oc

    _, outs = jax.lax.scan(body, None, qs)
    return outs.transpose(1, 0, 2, 3, 4).reshape(b, tp, h, dh)[:, :t]


def _attention(q, k, v, heads, cos, sin, mask=None):
    """q/k/v [B,T,dim] -> joint attention with RoPE; returns [B,T,dim].

    mask [B,T] bool marks valid KEY tokens (padded text excluded, the
    diffusers QwenImage prompt_embeds_mask behavior); None = all valid.
    """
    b, t, d = q.shape
    dh = d // heads
    split = lambda a: a.reshape(b, t, heads, dh)
    q, k, v = split(q), split(k), split(v)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    if t > _ATTN_CHUNK_MIN_T:
        return _chunked_attention(q, k, v, mask).reshape(b, t, d)
    m = None if mask is None else mask[:, None, None, :]
    out = jax.nn.dot_product_attention(q, k, v, mask=m)
    return out.reshape(b, t, d)


def _gelu_tanh(x):
    return nn.gelu(x, approximate=True)


def _tp_dense(features: int, name: str, shard: str = "out",
              quant: int = 0, dtype=jnp.bfloat16) -> nn.Module:
    """Wide-kernel Dense with logical tp annotation: the 12B/20B presets
    only fit v5e chips tensor-parallel (bench_neural.memory_notes), so
    every attention/MLP kernel carries ("embed","tp") / ("tp","embed")
    axes that map onto a mesh via nn.logical_axis_rules
    (parallel/mesh.py tp_sharded_dit_forward).  quant > 0 swaps in the
    weight-only int8/int4 kernel (models/quant.py QuantDense), the
    single-chip deployment path for the 12B/20B presets."""
    if quant:
        from genpc_tpu.models.quant import QuantDense
        return QuantDense(features, bits=quant, name=name, shard=shard,
                          dtype=dtype)
    axes = ("embed", "tp") if shard == "out" else ("tp", "embed")
    return nn.Dense(
        features, dtype=dtype, param_dtype=jnp.float32, name=name,
        kernel_init=nn.with_logical_partitioning(
            nn.initializers.lecun_normal(), axes))


class DoubleBlock(nn.Module):
    """Two-stream MMDiT block (diffusers FluxTransformerBlock /
    QwenImageTransformerBlock): joint attention over [txt, img], AdaLN-zero
    per stream."""
    cfg: DiTConfig

    @nn.compact
    def __call__(self, img, txt, vec, cos, sin, mask=None):
        cfg = self.cfg
        d = cfg.hidden_dim
        dh = cfg.head_dim

        def modulation(name):
            out = _tp_dense(6 * d, name, quant=cfg.quant_bits,
                            dtype=jnp.float32)(
                nn.silu(vec.astype(jnp.float32)))
            return jnp.split(out[:, None, :], 6, axis=-1)

        (i_shift, i_scale, i_gate,
         i_shift2, i_scale2, i_gate2) = modulation("img_mod")
        (t_shift, t_scale, t_gate,
         t_shift2, t_scale2, t_gate2) = modulation("txt_mod")

        def ln(x):
            return nn.LayerNorm(use_bias=False, use_scale=False,
                                dtype=jnp.float32)(x)

        img_n = ln(img) * (1 + i_scale) + i_shift
        txt_n = ln(txt) * (1 + t_scale) + t_shift
        dense = lambda n: _tp_dense(d, n, quant=cfg.quant_bits)
        qi = dense("attn_img_q")(img_n)
        ki = dense("attn_img_k")(img_n)
        vi = dense("attn_img_v")(img_n)
        qt = dense("attn_txt_q")(txt_n)
        kt = dense("attn_txt_k")(txt_n)
        vt = dense("attn_txt_v")(txt_n)

        def headnorm(x, name):
            b, t, _ = x.shape
            h = x.reshape(b, t, cfg.num_heads, dh)
            h = RMSNorm(dh, name=name)(h)
            return h.reshape(b, t, d)

        qi = headnorm(qi, "attn_norm_q")
        ki = headnorm(ki, "attn_norm_k")
        qt = headnorm(qt, "attn_norm_added_q")
        kt = headnorm(kt, "attn_norm_added_k")

        lt = txt.shape[1]
        q = jnp.concatenate([qt, qi], axis=1)
        k = jnp.concatenate([kt, ki], axis=1)
        v = jnp.concatenate([vt, vi], axis=1)
        att = _attention(q, k, v, cfg.num_heads, cos, sin, mask)
        att_t, att_i = att[:, :lt], att[:, lt:]
        img = img + i_gate * _tp_dense(
            d, "attn_img_out", "in", quant=cfg.quant_bits)(att_i)
        txt = txt + t_gate * _tp_dense(
            d, "attn_txt_out", "in", quant=cfg.quant_bits)(att_t)

        img_n = ln(img) * (1 + i_scale2) + i_shift2
        h = _tp_dense(4 * d, "img_mlp_in", quant=cfg.quant_bits)(img_n)
        img = img + i_gate2 * _tp_dense(
            d, "img_mlp_out", "in", quant=cfg.quant_bits)(_gelu_tanh(h))
        txt_n = ln(txt) * (1 + t_scale2) + t_shift2
        h = _tp_dense(4 * d, "txt_mlp_in", quant=cfg.quant_bits)(txt_n)
        txt = txt + t_gate2 * _tp_dense(
            d, "txt_mlp_out", "in", quant=cfg.quant_bits)(_gelu_tanh(h))
        return img, txt


class SingleBlock(nn.Module):
    """Fused single-stream block (diffusers FluxSingleTransformerBlock):
    parallel attention + MLP, one output projection, 3-chunk AdaLN."""
    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, vec, cos, sin, mask=None):
        cfg = self.cfg
        d = cfg.hidden_dim
        mod = _tp_dense(3 * d, "mod", quant=cfg.quant_bits,
                        dtype=jnp.float32)(
            nn.silu(vec.astype(jnp.float32)))
        shift, scale, gate = jnp.split(mod[:, None, :], 3, axis=-1)
        xn = nn.LayerNorm(use_bias=False, use_scale=False,
                          dtype=jnp.float32)(x) * (1 + scale) + shift
        q = _tp_dense(d, "to_q", quant=cfg.quant_bits)(xn)
        k = _tp_dense(d, "to_k", quant=cfg.quant_bits)(xn)
        v = _tp_dense(d, "to_v", quant=cfg.quant_bits)(xn)
        dh = cfg.head_dim
        b, t, _ = q.shape

        def headnorm(a, name):
            h = a.reshape(b, t, cfg.num_heads, dh)
            return RMSNorm(dh, name=name)(h).reshape(b, t, d)

        q = headnorm(q, "norm_q")
        k = headnorm(k, "norm_k")
        att = _attention(q, k, v, cfg.num_heads, cos, sin, mask)
        mlp = _gelu_tanh(_tp_dense(4 * d, "proj_mlp",
                                   quant=cfg.quant_bits)(xn))
        out = _tp_dense(d, "proj_out", "in", quant=cfg.quant_bits)(
            jnp.concatenate([att, mlp], axis=-1))
        return x + gate * out


class MMDiT(nn.Module):
    cfg: DiTConfig

    @nn.compact
    def __call__(self, latents, t, txt, pooled=None, cond_latents=None,
                 guidance=None, txt_mask=None):
        """latents [B,H,W,C]; t [B] in [0,1]; txt [B,L,text_dim];
        txt_mask [B,L] bool marks real (non-pad) prompt tokens.

        cond_latents [B,H,W,Cc] join per cfg.cond_mode: 'channels'
        (FLUX-Depth channel concat) or 'sequence' (Qwen-Image-Edit token
        concat).  Returns the predicted velocity with latents' shape.
        """
        cfg = self.cfg
        b, h, w, c = latents.shape
        p = cfg.patch_size

        def patchify(x):
            ch = x.shape[-1]
            x = x.reshape(b, h // p, p, w // p, p, ch)
            return x.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, (h // p) * (w // p), p * p * ch)

        x = latents
        seq_cond = None
        if cond_latents is not None:
            if cfg.cond_mode == "channels":
                x = jnp.concatenate([x, cond_latents], axis=-1)
            else:
                seq_cond = patchify(cond_latents)
        x = patchify(x)
        n_img = x.shape[1]
        if seq_cond is not None:
            x = jnp.concatenate([x, seq_cond], axis=1)
        img = nn.Dense(cfg.hidden_dim, dtype=jnp.bfloat16, name="img_in")(x)

        if cfg.txt_input_norm:
            txt = RMSNorm(cfg.text_dim, name="txt_norm")(txt)
        txt_tok = nn.Dense(cfg.hidden_dim, dtype=jnp.bfloat16,
                           name="txt_in")(txt)

        vec = TimestepEmbedder(cfg.hidden_dim, name="time_embed")(
            timestep_embedding(t * 1000.0, 256))
        if pooled is not None and cfg.pooled_dim:
            vec = vec + TimestepEmbedder(cfg.hidden_dim,
                                         name="pooled_embed")(pooled)
        if cfg.guidance_embed and guidance is not None:
            vec = vec + TimestepEmbedder(cfg.hidden_dim,
                                         name="guidance_embed")(
                timestep_embedding(guidance * 1000.0, 256))

        # RoPE ids: text at axis-0 positions (0 for flux, sequence index
        # for qwen), image patches at (y, x); sequence-joined edit tokens
        # reuse the image grid positions
        gy, gx = jnp.meshgrid(jnp.arange(h // p), jnp.arange(w // p),
                              indexing="ij")
        img_ids = jnp.stack([jnp.zeros_like(gy).ravel(), gy.ravel(),
                             gx.ravel()], axis=-1)
        if seq_cond is not None:
            img_ids = jnp.concatenate([img_ids, img_ids], axis=0)
        lt = txt_tok.shape[1]
        t_axis0 = (jnp.arange(lt) if cfg.cond_mode == "sequence"
                   else jnp.zeros(lt, jnp.int32))
        txt_ids = jnp.stack([t_axis0, jnp.zeros(lt, jnp.int32),
                             jnp.zeros(lt, jnp.int32)], axis=-1)
        ids = jnp.concatenate([txt_ids, img_ids], axis=0)
        cos, sin = rope_table(ids, cfg.axes_dim, cfg.theta)

        mask = None
        if txt_mask is not None:
            mask = jnp.concatenate(
                [txt_mask.astype(bool),
                 jnp.ones((b, img.shape[1]), bool)], axis=1)

        for i in range(cfg.double_blocks):
            img, txt_tok = DoubleBlock(cfg, name=f"double_{i}")(
                img, txt_tok, vec, cos, sin, mask)
        if cfg.single_blocks:
            seq = jnp.concatenate([txt_tok, img], axis=1)
            for i in range(cfg.single_blocks):
                seq = SingleBlock(cfg, name=f"single_{i}")(seq, vec, cos,
                                                           sin, mask)
            img = seq[:, lt:]

        img = img[:, :n_img]
        img = nn.LayerNorm(use_bias=False, use_scale=False,
                           dtype=jnp.float32, name="norm_out")(img)
        # AdaLayerNormContinuous: linear -> (scale, shift) 2 chunks
        mod = nn.Dense(2 * cfg.hidden_dim, dtype=jnp.float32,
                       name="norm_out_mod")(nn.silu(vec.astype(jnp.float32)))
        scale, shift = jnp.split(mod[:, None, :], 2, axis=-1)
        img = img * (1 + scale) + shift
        out = nn.Dense(p * p * cfg.in_channels, dtype=jnp.float32,
                       name="proj_out")(img)
        out = out.reshape(b, h // p, w // p, p, p, cfg.in_channels)
        return out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w,
                                                       cfg.in_channels)
