"""Qwen2.5-VL (flax) — the Qwen-Image-Edit conditioning tower.

The reference's default depth->image backend encodes its prompt AND the
depth image with Qwen2.5-VL (reference: tools/qwen_depth.py:50-62 loads
QwenImageEditPlusPipeline whose `text_encoder` is
Qwen2_5_VLForConditionalGeneration; :110-132 builds the product-photo
prompt).  The pipeline renders a chat template around the prompt, feeds
the image through the ViT (whose merged tokens replace the
`<|image_pad|>` slot), takes the LAST hidden state after the final RMS
norm, and drops the template-prefix tokens — those 3584-d per-token
features are the MMDiT's `txt` context.

Both towers are parameter-isomorphic to the HF release
(transformers>=4.52 layout: `model.language_model.*` / `model.visual.*`;
the converter also accepts the pre-4.52 `model.*` / `visual.*` keys):

* **Text tower** (Qwen2 decoder): GQA attention (28 q / 4 kv heads,
  q/k/v biased, o unbiased), SwiGLU MLP, pre-RMSNorm, causal mask, and
  3-axis M-RoPE — frequency sections (16,24,24) take positions from the
  (temporal, height, width) id planes; for pure text all three planes
  are equal and it reduces to 1-D RoPE.
* **Vision tower** (Qwen2.5 ViT): Conv3D patch embed over 2 duplicated
  temporal frames, 2-D rotary positions in pre-merge patch units,
  window attention (112px windows; full attention in blocks 7/15/23/31),
  biased gated MLP, and the 2x2 `merger` that maps 4 patch features to
  one 3584-d token.  TPU-first: grids are constrained to whole windows
  so the window reorder is a pure reshape/permute and every attention
  is a dense batched call — no ragged cu_seqlens.

Key inventories: checkpoint_specs.spec_qwen_vl_text /
spec_qwen_vl_vision; converter weights.convert_qwen_vl.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from genpc_tpu.models.t5 import T5LayerNorm as RMSNorm  # same numerics


@dataclass(frozen=True)
class QwenVLConfig:
    # text tower
    vocab_size: int = 152064
    hidden: int = 3584
    layers: int = 28
    heads: int = 28
    kv_heads: int = 4
    head_dim: int = 128
    intermediate: int = 18944
    eps: float = 1e-6
    theta: float = 1_000_000.0
    mrope_section: Tuple[int, int, int] = (16, 24, 24)
    # vision tower
    vit_depth: int = 32
    vit_dim: int = 1280
    vit_heads: int = 16
    vit_ffn: int = 3420
    patch: int = 14
    temporal_patch: int = 2
    merge: int = 2
    window: int = 112            # pixels; window cells = window/merge/patch
    fullatt_blocks: Tuple[int, ...] = (7, 15, 23, 31)
    vit_theta: float = 10000.0
    # weight-only quantization of the text/vision block matmuls: the
    # 8.3B tower must share one 16 GB v5e with the int4 20B DiT
    # (int4 ~4.2 GB; the reference offloads the whole pipeline to one
    # GPU via Nunchaku int4 + sequential offload, tools/qwen_depth.py)
    quant_bits: int = 0

    @property
    def window_cells(self) -> int:
        return self.window // (self.merge * self.patch)

    @classmethod
    def preset(cls, name: str) -> "QwenVLConfig":
        if name == "tiny":
            return cls(vocab_size=512, hidden=64, layers=2, heads=4,
                       kv_heads=2, head_dim=16, intermediate=128,
                       mrope_section=(4, 2, 2),
                       vit_depth=2, vit_dim=32, vit_heads=2, vit_ffn=64,
                       patch=4, merge=2, window=16, fullatt_blocks=(1,))
        if name == "full":
            return cls()
        raise ValueError(name)


def _vl_dense(cfg: "QwenVLConfig", features: int, name: str,
              use_bias: bool = True) -> nn.Module:
    """Block matmul: bf16 Dense, or weight-only int8/int4 QuantDense."""
    if cfg.quant_bits:
        from genpc_tpu.models.quant import QuantDense
        return QuantDense(features, bits=cfg.quant_bits, use_bias=use_bias,
                          name=name, dtype=jnp.bfloat16)
    return nn.Dense(features, use_bias=use_bias, dtype=jnp.bfloat16,
                    name=name)


# --------------------------------------------------------------- M-RoPE

def mrope_cos_sin(pos_ids: jnp.ndarray, cfg: QwenVLConfig
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """pos_ids [3, B, L] (t/h/w planes) -> cos, sin [B, L, head_dim].

    Section s of the head_dim//2 frequencies reads its positions from
    plane s (the HF mrope_section split); the table is then duplicated
    rotate-half style.
    """
    half = cfg.head_dim // 2
    inv_freq = 1.0 / (cfg.theta ** (np.arange(0, half) / half))
    freqs = pos_ids[..., None].astype(jnp.float32) * inv_freq  # [3,B,L,half]
    parts = []
    start = 0
    for i, width in enumerate(cfg.mrope_section):
        parts.append(freqs[i, :, :, start:start + width])
        start += width
    picked = jnp.concatenate(parts, axis=-1)        # [B, L, half]
    emb = jnp.concatenate([picked, picked], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-b, a], axis=-1)


def apply_rope(q, k, cos, sin):
    """q,k [B,L,H,hd]; cos/sin [B,L,hd] (broadcast over heads)."""
    cos = cos[:, :, None, :]
    sin = sin[:, :, None, :]
    return (q * cos + _rotate_half(q) * sin,
            k * cos + _rotate_half(k) * sin)


# ------------------------------------------------------------ text tower

class QwenTextLayer(nn.Module):
    cfg: QwenVLConfig

    @nn.compact
    def __call__(self, x, cos, sin, mask):
        cfg = self.cfg
        hd = cfg.head_dim
        h = RMSNorm(cfg.hidden, cfg.eps, name="attn_norm")(x)
        b, L, _ = x.shape
        q = _vl_dense(cfg, cfg.heads * hd, "q")(h)
        k = _vl_dense(cfg, cfg.kv_heads * hd, "k")(h)
        v = _vl_dense(cfg, cfg.kv_heads * hd, "v")(h)
        q = q.reshape(b, L, cfg.heads, hd)
        k = k.reshape(b, L, cfg.kv_heads, hd)
        v = v.reshape(b, L, cfg.kv_heads, hd)
        q, k = apply_rope(q.astype(jnp.float32), k.astype(jnp.float32),
                          cos, sin)
        rep = cfg.heads // cfg.kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        att = jax.nn.dot_product_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v,
            mask=mask)
        att = att.reshape(b, L, cfg.heads * hd)
        x = x + _vl_dense(cfg, cfg.hidden, "o", use_bias=False)(att)
        h = RMSNorm(cfg.hidden, cfg.eps, name="mlp_norm")(x)
        g = _vl_dense(cfg, cfg.intermediate, "gate", use_bias=False)(h)
        u = _vl_dense(cfg, cfg.intermediate, "up", use_bias=False)(h)
        return x + _vl_dense(cfg, cfg.hidden, "down",
                             use_bias=False)(nn.silu(g) * u)


class QwenVLTextModel(nn.Module):
    """Qwen2.5-VL language tower; returns post-final-norm hidden states
    (== HF hidden_states[-1], what QwenImage pipelines consume)."""
    cfg: QwenVLConfig

    @nn.compact
    def __call__(self, ids, pos_ids, attn_mask=None,
                 inputs_embeds: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        emb = nn.Embed(cfg.vocab_size, cfg.hidden, name="embed_tokens")
        x = emb(ids) if inputs_embeds is None else inputs_embeds
        b, L = x.shape[:2]
        cos, sin = mrope_cos_sin(pos_ids, cfg)
        causal = jnp.tril(jnp.ones((L, L), bool))
        if attn_mask is not None:
            causal = causal[None, None] & attn_mask[:, None, None, :]
        else:
            causal = jnp.broadcast_to(causal[None, None], (b, 1, L, L))
        for i in range(cfg.layers):
            x = QwenTextLayer(cfg, name=f"layers_{i}")(x, cos, sin, causal)
        return RMSNorm(cfg.hidden, cfg.eps, name="norm")(x)


# ---------------------------------------------------------- vision tower

def vision_rope(grid: int, cfg: QwenVLConfig) -> np.ndarray:
    """Rotary table [S, head_dim//2] for a square grid of `grid` patches,
    in the base grouped order (each 2x2 merged cell's 4 patches
    consecutive, cells raster) — mirrors Qwen2_5_VisionTransformer
    .rot_pos_emb."""
    m = cfg.merge
    hd = cfg.vit_dim // cfg.vit_heads
    quarter = hd // 4
    inv_freq = 1.0 / (cfg.vit_theta ** (np.arange(quarter) * 2.0 / (hd // 2)))
    g = grid
    rows = np.arange(g)[:, None].repeat(g, 1)
    cols = np.arange(g)[None, :].repeat(g, 0)

    def group(a):   # raster patch grid -> grouped (cell-major) order
        return a.reshape(g // m, m, g // m, m).transpose(0, 2, 1, 3
                                                         ).reshape(-1)

    hpos, wpos = group(rows), group(cols)
    hf = hpos[:, None] * inv_freq[None, :]
    wf = wpos[:, None] * inv_freq[None, :]
    return np.concatenate([hf, wf], axis=1).astype(np.float32)  # [S, hd/2]


def snap_vision_px(px: int, cfg: QwenVLConfig) -> int:
    """Round an image side UP to the next whole-attention-window multiple
    (112 px at patch 14 / merge 2 / 112px windows) — grids must tile into
    whole windows (window_permutation); the real preprocessor instead
    pads ragged windows, same tokens per window either way."""
    wpx = cfg.window_cells * cfg.merge * cfg.patch
    return -(-px // wpx) * wpx


def window_permutation(grid: int, cfg: QwenVLConfig) -> np.ndarray:
    """Permutation taking grouped-order patch tokens into window order.

    grid: patches per side; must make whole windows (grid/merge divisible
    by window_cells) so no padding is needed — callers choose input sizes
    accordingly (the real preprocessor pads ragged windows instead).
    """
    m, wc = cfg.merge, cfg.window_cells
    gc = grid // m                   # merged cells per side
    if gc % wc:
        raise ValueError(f"grid {grid} does not tile into "
                         f"{wc * m}-patch windows")
    cell_idx = np.arange(gc * gc).reshape(gc // wc, wc, gc // wc, wc)
    cell_order = cell_idx.transpose(0, 2, 1, 3).reshape(-1)
    # expand each merged cell to its 4 consecutive patch slots
    return (cell_order[:, None] * (m * m)
            + np.arange(m * m)[None, :]).reshape(-1)


class QwenVisionBlock(nn.Module):
    cfg: QwenVLConfig

    @nn.compact
    def __call__(self, x, cos, sin, window_len: int):
        """x [S, D] in window order; attention within blocks of
        window_len tokens (S for the full-attention layers)."""
        cfg = self.cfg
        d = cfg.vit_dim
        hd = d // cfg.vit_heads
        S = x.shape[0]
        h = RMSNorm(d, cfg.eps, name="norm1")(x)
        qkv = _vl_dense(cfg, 3 * d, "qkv")(h)
        q, k, v = jnp.split(qkv.reshape(S, 3, cfg.vit_heads, hd), 3, axis=1)
        nb = S // window_len
        shape = (nb, window_len, cfg.vit_heads, hd)
        q = q.reshape(1, S, cfg.vit_heads, hd)
        k = k.reshape(1, S, cfg.vit_heads, hd)
        q, k = apply_rope(q.astype(jnp.float32), k.astype(jnp.float32),
                          cos[None], sin[None])
        att = jax.nn.dot_product_attention(
            q.reshape(shape).astype(jnp.bfloat16),
            k.reshape(shape).astype(jnp.bfloat16), v.reshape(shape))
        att = att.reshape(S, d)
        x = x + _vl_dense(cfg, d, "proj")(att)
        h = RMSNorm(d, cfg.eps, name="norm2")(x)
        g = _vl_dense(cfg, cfg.vit_ffn, "gate")(h)
        u = _vl_dense(cfg, cfg.vit_ffn, "up")(h)
        return x + _vl_dense(cfg, d, "down")(nn.silu(g) * u)


class QwenVisionModel(nn.Module):
    """Square-image Qwen2.5 ViT -> merged tokens [G*G/4... , hidden]."""
    cfg: QwenVLConfig

    @nn.compact
    def __call__(self, patches, grid: int):
        """patches [S, C*T*P*P] flattened in torch Conv3D order
        (C-major), S = grid*grid in grouped order."""
        cfg = self.cfg
        x = nn.Dense(cfg.vit_dim, use_bias=False, dtype=jnp.bfloat16,
                     name="patch_proj")(patches)
        rope = vision_rope(grid, cfg)
        perm = window_permutation(grid, cfg)
        x = x[perm]
        rope = jnp.asarray(rope)[perm]
        emb = jnp.concatenate([rope, rope], axis=-1)
        cos, sin = jnp.cos(emb), jnp.sin(emb)
        wlen = (cfg.window_cells * cfg.merge) ** 2
        S = x.shape[0]
        for i in range(cfg.vit_depth):
            full = i in cfg.fullatt_blocks
            x = QwenVisionBlock(cfg, name=f"blocks_{i}")(
                x, cos, sin, S if full else wlen)
        # merger: RMS ln_q, group 4 patches -> one token, 2-layer MLP
        x = RMSNorm(cfg.vit_dim, cfg.eps, name="ln_q")(x)
        mm = cfg.merge * cfg.merge
        x = x.reshape(S // mm, mm * cfg.vit_dim)
        x = nn.Dense(mm * cfg.vit_dim, dtype=jnp.bfloat16,
                     name="merger_0")(x)
        x = nn.Dense(cfg.hidden, dtype=jnp.bfloat16,
                     name="merger_2")(nn.gelu(x, approximate=False))
        # reverse the window shuffle at merged-cell granularity
        cell_perm = perm.reshape(-1, mm)[:, 0] // mm
        inv = np.argsort(cell_perm)
        return x[jnp.asarray(inv)]     # raster merged-cell order


def image_to_patches(img: np.ndarray, cfg: QwenVLConfig) -> np.ndarray:
    """[H,W,3] float image in [0,1] -> [S, C*T*P*P] patch matrix in the
    grouped order + torch Conv3D flatten order, CLIP-normalized."""
    mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
    x = (np.asarray(img, np.float32) - mean) / std
    g = img.shape[0] // cfg.patch
    p, m, t = cfg.patch, cfg.merge, cfg.temporal_patch
    # [H,W,C] -> patch grid [g,g,p,p,C]
    x = x.reshape(g, p, g, p, 3).transpose(0, 2, 1, 3, 4)
    # grouped cell-major order
    x = x.reshape(g // m, m, g // m, m, p, p, 3).transpose(
        0, 2, 1, 3, 4, 5, 6).reshape(g * g, p, p, 3)
    # torch Conv3D weight layout is (C, T, P, P); duplicate the frame
    x = x.transpose(0, 3, 1, 2)                       # [S, C, P, P]
    x = np.repeat(x[:, :, None], t, axis=2)           # [S, C, T, P, P]
    return x.reshape(g * g, -1)


def _compute_device(tree=None):
    """The device compute runs on — i.e. where offloaded params must
    re-materialize.

    `jax.devices()[0]` is wrong whenever it differs from the effective
    default device (ADVICE r4 #1): this container force-registers the
    TPU backend even when tests pin compute to CPU via
    `jax_default_device`, so a hardcoded devices()[0] silently moves the
    offload path onto a different backend than the resident path.
    Resolution order: a device already holding a leaf of `tree`, the
    configured jax_default_device, then jax.devices()[0].
    """
    if tree is not None:
        for leaf in jax.tree_util.tree_leaves(tree):
            try:
                dev = leaf.device
            except Exception:  # noqa: BLE001 — numpy leaf / multi-device
                continue
            if dev is not None and getattr(dev, "platform", None):
                return dev
    dflt = jax.config.jax_default_device
    if dflt is not None and getattr(dflt, "platform", None):
        return dflt
    return jax.devices()[0]


def _offload_tree(tree):
    """Move a param tree to host memory.

    Prefers the compute device's pinned host memory (`memory_kind=
    'pinned_host'`): re-materialization then rides the TPU's PCIe link
    instead of the client connection.  Backends without memory-kind
    support fall back to client RAM (numpy).
    """
    try:
        dev = _compute_device(tree)
        s = jax.sharding.SingleDeviceSharding(dev,
                                              memory_kind="pinned_host")
        out = jax.device_put(tree, s)
        jax.block_until_ready(out)
        return out
    except Exception:  # noqa: BLE001 — no pinned_host on this backend
        return jax.device_get(tree)


# -------------------------------------------------------------- protocol

EDIT_TEMPLATE_PREFIX = (
    "<|im_start|>system\nDescribe the key features of the input image "
    "(color, shape, size, texture, objects, background), then explain "
    "how the user's text instruction should alter or modify the image. "
    "Generate a new image that meets the user's requirements while "
    "maintaining consistency with the original input where appropriate."
    "<|im_end|>\n<|im_start|>user\n")
EDIT_TEMPLATE_SUFFIX = "<|im_end|>\n<|im_start|>assistant\n"
IMAGE_SLOT = "Picture 1: <|vision_start|><|image_pad|><|vision_end|>"


class QwenVLEncoder:
    """Qwen-Image-Edit prompt encoding: template + image tokens -> the
    post-template per-token features the MMDiT conditions on.

    encode(prompt, image) mirrors QwenImageEditPlusPipeline
    ._get_qwen_prompt_embeds: render the chat template, splice the ViT's
    merged tokens over the `<|image_pad|>` slot, run the language tower
    with M-RoPE ids (text counter / image t-h-w planes), take the final
    hidden states, and DROP everything before the user payload.
    """

    def __init__(self, size: str = "tiny", rng_seed: int = 0,
                 weights_dir: Optional[str] = None,
                 vision_px: int = 392,
                 quant_bits: Optional[int] = None,
                 offload: Optional[bool] = None):
        import dataclasses
        if quant_bits is None:
            # full-size default int4 (~4.2 GB): the 8.3B tower must share
            # one 16 GB v5e with the int4 20B DiT — the reference's
            # single-GPU Qwen deployment is likewise fully int4-quantized
            # (tools/qwen_depth.py:50-62)
            quant_bits = 4 if size == "full" else 0
        self.cfg = dataclasses.replace(QwenVLConfig.preset(size),
                                       quant_bits=int(quant_bits))
        # Sequential-offload analog (reference: tools/qwen_depth.py:60-62
        # enable_sequential_cpu_offload): at full size the tower's params
        # live in HOST memory and are materialized into HBM only around
        # prompt encoding, so the denoise loop gets the whole remaining
        # HBM.  Preferred host store is the TPU host's pinned memory
        # (re-materialization rides PCIe, not the client link).
        self.offload = (size == "full") if offload is None else bool(offload)
        self._dev = None
        self.vision_px = snap_vision_px(
            vision_px if size == "full" else 16, self.cfg)
        self.text = QwenVLTextModel(self.cfg)
        self.vision = QwenVisionModel(self.cfg)
        self.tok = None
        if weights_dir:
            tok_dir = os.path.join(weights_dir, "tokenizer")
            if os.path.exists(os.path.join(tok_dir, "tokenizer.json")):
                from tokenizers import Tokenizer
                self.tok = Tokenizer.from_file(
                    os.path.join(tok_dir, "tokenizer.json"))
        rng = jax.random.PRNGKey(rng_seed)
        g = self.vision_px // self.cfg.patch
        dummy_ids = jnp.zeros((1, 8), jnp.int32)
        dummy_pos = jnp.zeros((3, 1, 8), jnp.int32)
        self.params_text = self.text.init(rng, dummy_ids, dummy_pos)
        self.params_vision = self.vision.init(
            jax.random.fold_in(rng, 1),
            jnp.zeros((g * g, 3 * self.cfg.temporal_patch
                       * self.cfg.patch ** 2)), g)
        if weights_dir:
            from genpc_tpu.models.weights import load_qwen_vl
            self.params_text, self.params_vision = load_qwen_vl(
                weights_dir, self.params_text, self.params_vision,
                quant_bits=self.cfg.quant_bits)
        if self.offload:
            self.params_text, self.params_vision = _offload_tree(
                (self.params_text, self.params_vision))
        self._run_text = jax.jit(
            lambda p, emb, pos: self.text.apply(p, None, pos,
                                                inputs_embeds=emb))
        self._run_vision = jax.jit(
            lambda p, patches: self.vision.apply(p, patches, g))

    # -- host offload ----------------------------------------------------
    def _dev_params(self):
        """(text, vision) params resident in device memory."""
        if not self.offload:
            return self.params_text, self.params_vision
        if self._dev is None:
            dev = _compute_device((self.params_text, self.params_vision))
            s = jax.sharding.SingleDeviceSharding(dev)
            self._dev = jax.device_put(
                (self.params_text, self.params_vision), s)
            jax.block_until_ready(self._dev)
        return self._dev

    def release(self):
        """Drop the device copies (no-op unless offloaded + resident)."""
        if self._dev is not None:
            for leaf in jax.tree_util.tree_leaves(self._dev):
                leaf.delete()
            self._dev = None

    # -- tokenization ---------------------------------------------------
    def _ids(self, text: str) -> np.ndarray:
        if self.tok is not None:
            return np.asarray(self.tok.encode(
                text, add_special_tokens=False).ids, np.int32)
        import hashlib
        words = text.replace("<|", " <|").replace("|>", "|> ").split()
        return np.asarray(
            [int(hashlib.sha1(w.encode()).hexdigest()[:8], 16)
             % (self.cfg.vocab_size - 8) + 8 for w in words], np.int32)

    def encode(self, prompt: str, image: Optional[np.ndarray] = None
               ) -> np.ndarray:
        """-> [1, L, hidden] conditioning tokens (template dropped)."""
        prefix = EDIT_TEMPLATE_PREFIX
        user = (IMAGE_SLOT + prompt) if image is not None else prompt
        pre_ids = self._ids(prefix)
        drop = len(pre_ids)           # everything before the user payload
        if image is not None:
            head = np.concatenate([pre_ids, self._ids("Picture 1: "
                                                      "<|vision_start|>")])
            tail = np.concatenate([self._ids("<|vision_end|>" + prompt),
                                   self._ids(EDIT_TEMPLATE_SUFFIX)])
            img_tokens = self._encode_image(image)       # [T_img, hidden]
            n_img = img_tokens.shape[0]
            emb_head = self._token_embed(head)
            emb_tail = self._token_embed(tail)
            embeds = jnp.concatenate(
                [emb_head, img_tokens.astype(emb_head.dtype), emb_tail],
                axis=0)[None]
            pos = self._mrope_positions(len(head), n_img, len(tail))
            hidden = self._run_text(self._dev_params()[0], embeds, pos)
        else:
            ids = np.concatenate([pre_ids, self._ids(prompt),
                                  self._ids(EDIT_TEMPLATE_SUFFIX)])
            L = len(ids)
            pos = jnp.broadcast_to(jnp.arange(L)[None, None], (3, 1, L))
            hidden = self.text.apply(self._dev_params()[0],
                                     jnp.asarray(ids)[None], pos)
        return hidden[:, drop:]

    def _token_embed(self, ids: np.ndarray) -> jnp.ndarray:
        table = self._dev_params()[0]["params"]["embed_tokens"]["embedding"]
        return jnp.asarray(table)[jnp.asarray(ids)]

    def _encode_image(self, image: np.ndarray) -> jnp.ndarray:
        from PIL import Image
        px = self.vision_px
        img = np.asarray(Image.fromarray(
            (np.clip(image, 0, 1) * 255).astype(np.uint8)).resize(
            (px, px), Image.BICUBIC), np.float32) / 255.0
        patches = image_to_patches(img, self.cfg)
        return self._run_vision(self._dev_params()[1],
                                jnp.asarray(patches))

    def _mrope_positions(self, n_head: int, n_img: int, n_tail: int
                         ) -> jnp.ndarray:
        """get_rope_index for [text, image, text]: text advances all
        planes together; image tokens put (t const, row, col) on the
        merged grid; text resumes at base + grid extent."""
        gc = int(round(np.sqrt(n_img)))
        t = list(range(n_head))
        h = list(range(n_head))
        w = list(range(n_head))
        base = n_head
        for i in range(n_img):
            t.append(base)
            h.append(base + i // gc)
            w.append(base + i % gc)
        nxt = base + gc
        for i in range(n_tail):
            t.append(nxt + i)
            h.append(nxt + i)
            w.append(nxt + i)
        return jnp.asarray(np.stack([t, h, w])[:, None, :], jnp.int32)
