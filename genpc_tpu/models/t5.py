"""T5 v1.1 encoder (flax) — the FLUX.1 text tower, HF-isomorphic.

FLUX.1-Depth-dev encodes prompts with T5-XXL (reference:
tools/flux_depth.py:19-30 loads an int4 T5 as `text_encoder_2` of
FluxControlPipeline and samples with max_sequence_length=512); the
4096-d per-token hidden states are the transformer's `txt` context,
while the pooled vector comes from the CLIP-L tower.

Parameter tree is isomorphic to HF T5EncoderModel (google/t5-v1_1-xxl
class: gated-gelu feed-forward, pre-RMSNorm, relative-position-bucket
attention bias held by block 0 and shared by all layers, NO q·k scaling
— T5 folds the 1/sqrt(d) into init).  Exact key inventory:
checkpoint_specs.spec_t5_encoder; converter weights.convert_t5.

Tokenization: FLUX ships `tokenizer_2/tokenizer.json` (HF fast
tokenizer); when present we load it via the `tokenizers` library —
identical ids to T5TokenizerFast.  Without it a stable hashing
tokenizer keeps random-init runs deterministic.

TPU notes: bf16 matmuls, fp32 RMSNorm/bias, static shapes; the
position-bias table is computed once per sequence length from a static
bucket map (no data-dependent control flow).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    num_heads: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    rel_buckets: int = 32
    rel_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    # weight-only quantization of the block matmuls (q/k/v/o, wi/wo):
    # the reference runs the FLUX T5 int4 on one GPU
    # (tools/flux_depth.py:21-27); int4 (~2.4 GB) lets T5-XXL share one
    # 16 GB v5e with the int8 FLUX transformer
    quant_bits: int = 0

    @classmethod
    def preset(cls, name: str) -> "T5Config":
        if name == "tiny":
            return cls(vocab_size=256, d_model=64, d_kv=16, num_heads=4,
                       d_ff=128, num_layers=2)
        if name == "xxl":
            return cls()
        raise ValueError(name)


class T5LayerNorm(nn.Module):
    """T5 RMSNorm: no mean subtraction, no bias, scale applied in input
    dtype after an fp32 variance (matches HF T5LayerNorm)."""
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return (x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
                * scale).astype(jnp.float32)


def t5_relative_buckets(qlen: int, klen: int, num_buckets: int,
                        max_distance: int) -> np.ndarray:
    """Bidirectional T5 relative-position bucket map [qlen, klen] (static;
    mirrors HF T5Attention._relative_position_bucket)."""
    ctx = np.arange(qlen)[:, None]
    mem = np.arange(klen)[None, :]
    rel = mem - ctx
    nb = num_buckets // 2
    out = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact)
        / np.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    out += np.where(is_small, rel, large)
    return out


def _t5_dense(cfg: "T5Config", features: int, name: str) -> nn.Module:
    """Block matmul: bf16 Dense, or weight-only int8/int4 QuantDense."""
    if cfg.quant_bits:
        from genpc_tpu.models.quant import QuantDense
        return QuantDense(features, bits=cfg.quant_bits, use_bias=False,
                          name=name, dtype=jnp.bfloat16)
    return nn.Dense(features, use_bias=False, dtype=jnp.bfloat16, name=name)


class T5SelfAttention(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, pos_bias, mask):
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        q = _t5_dense(cfg, inner, "q")(x)
        k = _t5_dense(cfg, inner, "k")(x)
        v = _t5_dense(cfg, inner, "v")(x)
        b, L, _ = x.shape
        split = lambda a: a.reshape(b, L, cfg.num_heads, cfg.d_kv
                                    ).transpose(0, 2, 1, 3)
        # T5: NO 1/sqrt(d) scaling; additive position bias pre-softmax.
        scores = jnp.einsum("bhqd,bhkd->bhqk", split(q).astype(jnp.float32),
                            split(k).astype(jnp.float32))
        scores = scores + pos_bias
        scores = jnp.where(mask[:, None, None, :], scores, -1e9)
        att = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", att.astype(jnp.bfloat16),
                         split(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, L, inner)
        return _t5_dense(cfg, cfg.d_model, "o")(out)


class T5Block(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, pos_bias, mask):
        cfg = self.cfg
        h = T5LayerNorm(cfg.d_model, cfg.layer_norm_eps,
                        name="attn_norm")(x)
        x = x + T5SelfAttention(cfg, name="attn")(h, pos_bias, mask)
        h = T5LayerNorm(cfg.d_model, cfg.layer_norm_eps, name="ff_norm")(x)
        # v1.1 gated-gelu: wo(gelu_new(wi_0(h)) * wi_1(h))
        g = _t5_dense(cfg, cfg.d_ff, "wi_0")(h)
        u = _t5_dense(cfg, cfg.d_ff, "wi_1")(h)
        h = nn.gelu(g, approximate=True) * u
        return x + _t5_dense(cfg, cfg.d_model, "wo")(h)


class T5Encoder(nn.Module):
    """HF T5EncoderModel: returns final per-token hidden states [B,L,D]."""
    cfg: T5Config

    @nn.compact
    def __call__(self, ids, mask=None):
        cfg = self.cfg
        if mask is None:
            mask = jnp.ones(ids.shape, bool)
        x = nn.Embed(cfg.vocab_size, cfg.d_model, name="shared")(ids)
        L = ids.shape[1]
        buckets = jnp.asarray(t5_relative_buckets(
            L, L, cfg.rel_buckets, cfg.rel_max_distance))
        # block 0 owns the bias embedding; every layer reuses it (HF
        # has_relative_attention_bias only on layer 0).
        bias_table = self.param(
            "rel_bias", nn.initializers.normal(0.02),
            (cfg.rel_buckets, cfg.num_heads))
        pos_bias = bias_table[buckets].transpose(2, 0, 1)[None]  # [1,H,L,L]
        for i in range(cfg.num_layers):
            x = T5Block(cfg, name=f"block_{i}")(x, pos_bias, mask)
        x = T5LayerNorm(cfg.d_model, cfg.layer_norm_eps,
                        name="final_layer_norm")(x)
        return x * mask[..., None]


class T5Tokenizer:
    """HF fast-tokenizer wrapper (tokenizer.json) with T5 padding."""

    def __init__(self, tok, max_len: int = 512):
        self.tok = tok
        self.max_len = max_len
        self.eos = tok.token_to_id("</s>")
        self.pad = tok.token_to_id("<pad>") or 0

    @classmethod
    def from_dir(cls, path: str, max_len: int = 512):
        from tokenizers import Tokenizer
        return cls(Tokenizer.from_file(os.path.join(
            path, "tokenizer.json")), max_len)

    def __call__(self, text: str) -> Tuple[np.ndarray, np.ndarray]:
        ids = self.tok.encode(text, add_special_tokens=False).ids
        ids = ids[: self.max_len - 1] + [self.eos]
        mask = [1] * len(ids) + [0] * (self.max_len - len(ids))
        ids = ids + [self.pad] * (self.max_len - len(ids))
        return (np.asarray(ids, np.int32),
                np.asarray(mask, np.int32).astype(bool))


class T5HashTokenizer:
    """Deterministic fallback (no tokenizer.json present)."""

    def __init__(self, vocab_size: int, max_len: int = 512):
        import hashlib
        self._sha1 = hashlib.sha1
        self.vocab_size = vocab_size
        self.max_len = max_len

    def __call__(self, text: str) -> Tuple[np.ndarray, np.ndarray]:
        words = text.lower().split()[: self.max_len - 1]
        ids = [int(self._sha1(w.encode()).hexdigest()[:8], 16)
               % (self.vocab_size - 2) + 2 for w in words] + [1]  # 1 = </s>
        mask = [1] * len(ids) + [0] * (self.max_len - len(ids))
        ids += [0] * (self.max_len - len(ids))
        return (np.asarray(ids, np.int32),
                np.asarray(mask, np.int32).astype(bool))


class T5PromptEncoder:
    """FLUX text path: T5 per-token context + CLIP-L pooled vector.

    encode(prompts) -> (context [B,512,4096], pooled [B,768]) — the
    prompt_embeds / pooled_prompt_embeds FluxControlPipeline feeds the
    transformer (reference: tools/flux_depth.py:52-58,
    max_sequence_length=512).
    """

    def __init__(self, size: str = "tiny", rng_seed: int = 0,
                 weights_dir: Optional[str] = None, max_len: int = 512,
                 quant_bits: Optional[int] = None):
        from genpc_tpu.models.text_encoder import (CLIPTextConfig,
                                                   CLIPTextModel,
                                                   make_tokenizer)
        import dataclasses
        if quant_bits is None:
            # full-size default int4 (~2.4 GB): T5-XXL must share one
            # 16 GB v5e with the int8 FLUX transformer; the reference
            # runs this tower int4 too (tools/flux_depth.py:21-27)
            quant_bits = 4 if size == "full" else 0
        self.cfg = dataclasses.replace(
            T5Config.preset("xxl" if size == "full" else "tiny"),
            quant_bits=int(quant_bits))
        self.cfg_l = CLIPTextConfig.preset(
            "clip_l" if size == "full" else "tiny")
        self.max_len = max_len if size == "full" else 32
        tok_dir = (os.path.join(weights_dir, "tokenizer_2")
                   if weights_dir else "")
        if os.path.exists(os.path.join(tok_dir, "tokenizer.json")):
            self.tok = T5Tokenizer.from_dir(tok_dir, self.max_len)
        else:
            self.tok = T5HashTokenizer(self.cfg.vocab_size, self.max_len)
        self.tok_l = make_tokenizer(weights_dir, self.cfg_l.vocab_size,
                                    self.cfg_l.max_len)
        self.model = T5Encoder(self.cfg)
        self.model_l = CLIPTextModel(self.cfg_l)
        rng = jax.random.PRNGKey(rng_seed)
        dummy = jnp.zeros((1, self.max_len), jnp.int32)
        self.params = self.model.init(rng, dummy)
        self.params_l = self.model_l.init(
            jax.random.fold_in(rng, 1),
            jnp.zeros((1, self.cfg_l.max_len), jnp.int32))
        if weights_dir:
            from genpc_tpu.models.weights import load_t5_and_clip_l
            self.params, self.params_l = load_t5_and_clip_l(
                weights_dir, self.params, self.params_l,
                quant_bits=self.cfg.quant_bits)
        # params as arguments (closures bake ~9.6 GB of T5-XXL weights
        # into the executable as constants at full scale)
        self._encode = jax.jit(self._encode_impl)

    def _encode_impl(self, params, params_l, ids, mask, ids_l):
        ctx = self.model.apply(params, ids, mask)
        _, _, pooled = self.model_l.apply(params_l, ids_l)
        return ctx, pooled

    def encode(self, prompts) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if isinstance(prompts, str):
            prompts = [prompts]
        ids, masks = zip(*[self.tok(p) for p in prompts])
        ids_l = np.stack([self.tok_l(p) for p in prompts])
        return self._encode(self.params, self.params_l,
                            jnp.asarray(np.stack(ids)),
                            jnp.asarray(np.stack(masks)),
                            jnp.asarray(ids_l))
