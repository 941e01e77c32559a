"""CLIP text towers (flax) with HF-isomorphic parameters + CLIP BPE.

SDXL conditions on two CLIP text towers (reference:
tools/controlnet_depth.py loads the SDXL base pipeline whose text_encoder
(CLIP-L, quick-gelu) / text_encoder_2 (OpenCLIP-G, gelu, with
text_projection) produce the 2048-d context + 1280-d pooled embedding).
The parameter tree here is isomorphic to HF CLIPTextModel /
CLIPTextModelWithProjection so real checkpoints graft tensor-for-tensor
(weights.py:convert_clip_text; inventory in checkpoint_specs.py).

SDXL protocol details preserved: the context embedding is the PENULTIMATE
layer's hidden states (diffusers passes output_hidden_states and takes
hidden_states[-2]); the pooled vector is the EOS-token hidden state after
the final layer norm, projected by text_projection on the G tower.

Tokenization: the real CLIP byte-pair encoding (lowercase + whitespace
clean, bytes-to-unicode, merges with the '</w>' end-of-word marker) loads
vocab.json/merges.txt from <weights_dir>/tokenizer when present — the
vocabulary ships with the checkpoint exactly like the weights do.  Without
the files a stable hashing tokenizer keeps random-init tests and synthetic
runs deterministic.
"""

from __future__ import annotations

import functools
import gzip
import hashlib
import html
import json
import os
import re
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

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
    act: str = "quick_gelu"      # clip-l: quick_gelu; openclip-g: gelu
    proj_dim: int = 0            # text_projection width (0 = absent)

    @classmethod
    def preset(cls, name: str) -> "CLIPTextConfig":
        if name == "tiny":
            return cls(vocab_size=1024, hidden_dim=64, num_layers=2,
                       num_heads=4, max_len=77)
        if name == "tiny_g":
            return cls(vocab_size=1024, hidden_dim=64, num_layers=2,
                       num_heads=4, max_len=77, act="gelu", proj_dim=64)
        if name == "clip_l":
            return cls(hidden_dim=768, num_layers=12, num_heads=12,
                       act="quick_gelu")
        if name == "clip_g":
            return cls(hidden_dim=1280, num_layers=32, num_heads=20,
                       act="gelu", proj_dim=1280)
        if name == "clip_sd2":
            # SD2.1 / zero123plus text tower: OpenCLIP-H text, already
            # truncated to 23 layers in the diffusers conversion
            return cls(hidden_dim=1024, num_layers=23, num_heads=16,
                       act="gelu")
        raise ValueError(name)


@dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_dim: int = 1280
    num_layers: int = 32
    num_heads: int = 16
    patch: int = 14
    image_size: int = 224
    act: str = "gelu"
    proj_dim: int = 1024

    @classmethod
    def preset(cls, name: str) -> "CLIPVisionConfig":
        if name == "tiny":
            # proj matches the tiny text width (ramped into text context)
            return cls(hidden_dim=64, num_layers=2, num_heads=4, patch=8,
                       image_size=32, proj_dim=64)
        if name == "vit_h":
            # the zero123plus/SD2.1-unclip image encoder (OpenCLIP ViT-H,
            # projection to the 1024-d text width; reference conditioning:
            # tools/instantmesh.py:83-86 via the zero123plus pipeline's
            # vision_encoder)
            return cls()
        raise ValueError(name)


class CLIPBlock(nn.Module):
    """HF CLIPEncoderLayer: pre-LN attention + MLP."""
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        d = cfg.hidden_dim
        h = nn.LayerNorm(dtype=jnp.float32, name="layer_norm1")(x)
        q = nn.Dense(d, dtype=jnp.bfloat16, name="q_proj")(h)
        k = nn.Dense(d, dtype=jnp.bfloat16, name="k_proj")(h)
        v = nn.Dense(d, dtype=jnp.bfloat16, name="v_proj")(h)
        hd = d // cfg.num_heads
        split = lambda a: a.reshape(*a.shape[:-1], cfg.num_heads, hd)
        att = jax.nn.dot_product_attention(split(q), split(k), split(v),
                                           mask=mask)
        att = att.reshape(*x.shape[:-1], d)
        x = x + nn.Dense(d, dtype=jnp.bfloat16, name="out_proj")(att)
        h = nn.LayerNorm(dtype=jnp.float32, name="layer_norm2")(x)
        h = nn.Dense(d * 4, dtype=jnp.bfloat16, name="fc1")(h)
        if cfg.act == "quick_gelu":
            h = h * jax.nn.sigmoid(1.702 * h)
        else:
            h = nn.gelu(h)
        return x + nn.Dense(d, dtype=jnp.bfloat16, name="fc2")(h)


class CLIPTextModel(nn.Module):
    """Returns (last_hidden, penultimate_hidden, pooled)."""
    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, ids) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_dim,
                       name="token_embedding")(ids)
        pos = nn.Embed(cfg.max_len, cfg.hidden_dim,
                       name="position_embedding")(
            jnp.arange(ids.shape[1]))
        x = tok + pos[None]
        L = ids.shape[1]
        causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
        penult = x
        for i in range(cfg.num_layers):
            if i == cfg.num_layers - 1:
                penult = x          # hidden_states[-2] (SDXL context)
            x = CLIPBlock(cfg, name=f"layers_{i}")(x, causal)
        x = nn.LayerNorm(dtype=jnp.float32, name="final_layer_norm")(x)
        eos = jnp.argmax(ids, axis=1)   # CLIP convention: highest id = EOT
        pooled = x[jnp.arange(x.shape[0]), eos]
        if cfg.proj_dim:
            pooled = nn.Dense(cfg.proj_dim, use_bias=False,
                              dtype=jnp.float32,
                              name="text_projection")(pooled)
        return x, penult, pooled


class CLIPVisionModel(nn.Module):
    """HF CLIPVisionModelWithProjection: returns (tokens, image_embeds).

    image_embeds = visual_projection(post_layernorm(cls token)) — the
    1024-d global embedding zero123plus ramps into its text context.
    Bidirectional attention (no causal mask), pre-layernorm after the
    embeddings (HF's misspelled `pre_layrnorm`).
    """
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, imgs):
        cfg = self.cfg
        b = imgs.shape[0]
        x = nn.Conv(cfg.hidden_dim, (cfg.patch, cfg.patch),
                    strides=(cfg.patch, cfg.patch), use_bias=False,
                    dtype=jnp.bfloat16, name="patch_embedding")(imgs)
        t = x.shape[1] * x.shape[2]
        x = x.reshape(b, t, cfg.hidden_dim)
        cls_emb = self.param("class_embedding",
                             nn.initializers.normal(0.02),
                             (cfg.hidden_dim,))
        x = jnp.concatenate(
            [jnp.tile(cls_emb[None, None], (b, 1, 1)), x], axis=1)
        pos = nn.Embed(1 + (cfg.image_size // cfg.patch) ** 2,
                       cfg.hidden_dim, name="position_embedding")(
            jnp.arange(1 + t))
        x = x + pos[None]
        x = nn.LayerNorm(dtype=jnp.float32, name="pre_layrnorm")(x)
        text_cfg = CLIPTextConfig(hidden_dim=cfg.hidden_dim,
                                  num_heads=cfg.num_heads, act=cfg.act)
        for i in range(cfg.num_layers):
            x = CLIPBlock(text_cfg, name=f"layers_{i}")(x, None)
        pooled = nn.LayerNorm(dtype=jnp.float32,
                              name="post_layernorm")(x[:, 0])
        emb = nn.Dense(cfg.proj_dim, use_bias=False, dtype=jnp.float32,
                       name="visual_projection")(pooled)
        return x, emb


CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_preprocess(img: np.ndarray, size: int) -> np.ndarray:
    """[H,W,3] in [0,1] -> CLIP-normalized [1,size,size,3]."""
    from PIL import Image
    x = np.asarray(Image.fromarray(
        (np.clip(img, 0, 1) * 255).astype(np.uint8)).resize(
        (size, size), Image.BICUBIC), np.float32) / 255.0
    return ((x - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD)[None]


# ------------------------------------------------------------- tokenizers

def _bytes_to_unicode() -> Dict[int, str]:
    """The GPT-2/CLIP reversible byte<->unicode table."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


import regex as _regex  # the CLIP pattern needs \p{L}/\p{N} classes

_WORD_PAT = _regex.compile(
    r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
    r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
    _regex.IGNORECASE)


def _basic_clean(text: str) -> str:
    return html.unescape(html.unescape(text)).strip()


def _whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


class CLIPTokenizer:
    """The CLIP byte-pair encoder (openai simple_tokenizer algorithm).

    vocab: token string -> id; merges: ranked list of BPE pairs.  Word
    tokens end with '</w>'.  Loads the checkpoint's vocab.json +
    merges.txt; numerically identical ids to the HF CLIPTokenizer for the
    same files.
    """

    def __init__(self, vocab: Dict[str, int], merges: List[Tuple[str, str]],
                 max_len: int = 77):
        self.encoder = vocab
        self.bpe_ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.byte_encoder = _bytes_to_unicode()
        self.max_len = max_len
        self.bos = vocab.get("<|startoftext|>", len(vocab) - 2)
        self.eos = vocab.get("<|endoftext|>", len(vocab) - 1)
        self.vocab_size = max(len(vocab), self.eos + 1)
        self.cache: Dict[str, str] = {}

    @classmethod
    def from_dir(cls, path: str, max_len: int = 77) -> "CLIPTokenizer":
        with open(os.path.join(path, "vocab.json")) as f:
            vocab = json.load(f)
        merges_path = os.path.join(path, "merges.txt")
        opener = gzip.open if merges_path.endswith(".gz") else open
        with opener(merges_path, "rt") as f:
            lines = f.read().split("\n")
        merges = [tuple(l.split()) for l in lines
                  if l and not l.startswith("#") and len(l.split()) == 2]
        return cls(vocab, merges, max_len)

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            bigram = min(pairs,
                         key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        text = _whitespace_clean(_basic_clean(text)).lower()
        ids: List[int] = []
        for tok in _WORD_PAT.findall(text):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            for piece in self._bpe(tok).split(" "):
                ids.append(self.encoder.get(piece, self.eos))
        return ids

    def __call__(self, text: str) -> np.ndarray:
        ids = [self.bos] + self.encode(text)[: self.max_len - 2] + [self.eos]
        ids += [self.eos] * (self.max_len - len(ids))   # CLIP pads with EOT
        return np.asarray(ids[: self.max_len], np.int32)


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


def make_tokenizer(weights_dir: Optional[str], vocab_size: int,
                   max_len: int = 77):
    """Real CLIP BPE when the checkpoint's vocab ships; hash otherwise."""
    if weights_dir:
        tok_dir = os.path.join(weights_dir, "tokenizer")
        if os.path.exists(os.path.join(tok_dir, "vocab.json")):
            return CLIPTokenizer.from_dir(tok_dir, max_len)
    return HashTokenizer(vocab_size, max_len)


class PromptEncoder:
    """Two-tower SDXL prompt encoding.

    encode() returns (context [B,77,D_l+D_g] from the PENULTIMATE layers,
    pooled [B, proj_g] from the projected G tower) — the exact tensors
    diffusers feeds the SDXL UNet (prompt_embeds / pooled_prompt_embeds).
    """

    def __init__(self, size: str = "tiny", rng_seed: int = 0,
                 weights_dir: Optional[str] = None):
        if size == "tiny":
            self.cfg_l = CLIPTextConfig.preset("tiny")
            self.cfg_g = CLIPTextConfig.preset("tiny_g")
        else:
            self.cfg_l = CLIPTextConfig.preset("clip_l")
            self.cfg_g = CLIPTextConfig.preset("clip_g")
        self.tok = make_tokenizer(weights_dir, self.cfg_l.vocab_size,
                                  self.cfg_l.max_len)
        self.model_l = CLIPTextModel(self.cfg_l)
        self.model_g = CLIPTextModel(self.cfg_g)
        rng = jax.random.PRNGKey(rng_seed)
        dummy = jnp.zeros((1, self.cfg_l.max_len), jnp.int32)
        self.params_l = self.model_l.init(rng, dummy)
        self.params_g = self.model_g.init(jax.random.fold_in(rng, 1), dummy)
        if weights_dir:
            from genpc_tpu.models.weights import load_clip_towers
            self.params_l, self.params_g = load_clip_towers(
                weights_dir, self.params_l, self.params_g)
        # params are ARGUMENTS, not closure constants: closing over them
        # bakes multi-GB weight tensors into the executable at full scale
        self._encode = jax.jit(self._encode_impl)

    def _encode_impl(self, params_l, params_g, ids):
        _, pen_l, _ = self.model_l.apply(params_l, ids)
        _, pen_g, pooled = self.model_g.apply(params_g, ids)
        context = jnp.concatenate([pen_l, pen_g], axis=-1)
        return context, pooled

    def encode(self, prompts) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if isinstance(prompts, str):
            prompts = [prompts]
        ids = jnp.asarray(np.stack([self.tok(p) for p in prompts]))
        return self._encode(self.params_l, self.params_g, ids)
