"""Real-checkpoint parameter inventories (name -> torch shape).

The reference loads these pretrained models through diffusers/transformers
at runtime (reference: tools/flux_depth.py:12-30, tools/qwen_depth.py
:50-62, tools/controlnet_depth.py:17-52, tools/instantmesh.py:65-113,
tools/RMBG.py:10-13).  This container is zero-egress — no checkpoint can
be downloaded — so each function here enumerates the EXACT state-dict key
inventory and tensor shapes of the public implementation the reference
drives (diffusers FluxTransformer2DModel / QwenImageTransformer2DModel /
UNet2DConditionModel, HF CLIPTextModel(WithProjection), the InstantMesh
release), parameterized by the model config so the same generator covers
the tiny test presets and the full checkpoints.

These inventories serve as the conversion-test oracle
(tests/test_checkpoints.py): a synthetic checkpoint generated from the
spec must graft 100% into the flax parameter tree (values at tiny scale;
shapes at full scale via jax.eval_shape), and every flax parameter must be
covered — so a future real checkpoint either grafts completely or fails
loudly, never silently.

Shapes use the torch conventions: Linear weight (out, in), Conv2d weight
(out, in, kh, kw), ConvTranspose2d (in, out, kh, kw), Embedding
(num, dim), norm weight/bias (dim,).
"""

from __future__ import annotations

from typing import Dict, Tuple

Shape = Tuple[int, ...]
Spec = Dict[str, Shape]


def _linear(spec: Spec, name: str, out_dim: int, in_dim: int,
            bias: bool = True) -> None:
    spec[f"{name}.weight"] = (out_dim, in_dim)
    if bias:
        spec[f"{name}.bias"] = (out_dim,)


def _norm(spec: Spec, name: str, dim: int, bias: bool = True) -> None:
    spec[f"{name}.weight"] = (dim,)
    if bias:
        spec[f"{name}.bias"] = (dim,)


def _conv(spec: Spec, name: str, out_ch: int, in_ch: int, k: int = 3,
          bias: bool = True) -> None:
    spec[f"{name}.weight"] = (out_ch, in_ch, k, k)
    if bias:
        spec[f"{name}.bias"] = (out_ch,)


# ------------------------------------------------------------------ FLUX

def spec_flux_transformer(cfg) -> Spec:
    """diffusers FluxTransformer2DModel (FLUX.1-Depth-dev layout).

    Depth variant: x_embedder takes the channel-concatenated control
    latents, in_features = patch^2 * (in_channels + cond_channels) = 128.
    """
    d = cfg.hidden_dim
    dh = cfg.head_dim
    p = cfg.patch_size
    s: Spec = {}
    _linear(s, "x_embedder", d, p * p * (cfg.in_channels + cfg.cond_channels))
    _linear(s, "context_embedder", d, cfg.text_dim)
    _linear(s, "time_text_embed.timestep_embedder.linear_1", d, 256)
    _linear(s, "time_text_embed.timestep_embedder.linear_2", d, d)
    if cfg.guidance_embed:
        _linear(s, "time_text_embed.guidance_embedder.linear_1", d, 256)
        _linear(s, "time_text_embed.guidance_embedder.linear_2", d, d)
    _linear(s, "time_text_embed.text_embedder.linear_1", d, cfg.pooled_dim)
    _linear(s, "time_text_embed.text_embedder.linear_2", d, d)
    for i in range(cfg.double_blocks):
        b = f"transformer_blocks.{i}"
        _linear(s, f"{b}.norm1.linear", 6 * d, d)
        _linear(s, f"{b}.norm1_context.linear", 6 * d, d)
        for proj in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                     "add_v_proj", "to_out.0", "to_add_out"):
            _linear(s, f"{b}.attn.{proj}", d, d)
        for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            s[f"{b}.attn.{n}.weight"] = (dh,)
        _linear(s, f"{b}.ff.net.0.proj", 4 * d, d)
        _linear(s, f"{b}.ff.net.2", d, 4 * d)
        _linear(s, f"{b}.ff_context.net.0.proj", 4 * d, d)
        _linear(s, f"{b}.ff_context.net.2", d, 4 * d)
    for i in range(cfg.single_blocks):
        b = f"single_transformer_blocks.{i}"
        _linear(s, f"{b}.norm.linear", 3 * d, d)
        for proj in ("to_q", "to_k", "to_v"):
            _linear(s, f"{b}.attn.{proj}", d, d)
        for n in ("norm_q", "norm_k"):
            s[f"{b}.attn.{n}.weight"] = (dh,)
        _linear(s, f"{b}.proj_mlp", 4 * d, d)
        _linear(s, f"{b}.proj_out", d, 5 * d)
    _linear(s, "norm_out.linear", 2 * d, d)
    _linear(s, "proj_out", p * p * cfg.in_channels, d)
    return s


# ------------------------------------------------------------------ Qwen

def spec_qwen_transformer(cfg) -> Spec:
    """diffusers QwenImageTransformer2DModel (Qwen-Image-Edit layout).

    Edit conditioning joins latents along the token sequence, so img_in
    takes only patch^2 * in_channels = 64 features.
    """
    d = cfg.hidden_dim
    dh = cfg.head_dim
    p = cfg.patch_size
    s: Spec = {}
    _linear(s, "img_in", d, p * p * cfg.in_channels)
    _linear(s, "txt_in", d, cfg.text_dim)
    s["txt_norm.weight"] = (cfg.text_dim,)
    _linear(s, "time_text_embed.timestep_embedder.linear_1", d, 256)
    _linear(s, "time_text_embed.timestep_embedder.linear_2", d, d)
    for i in range(cfg.double_blocks):
        b = f"transformer_blocks.{i}"
        _linear(s, f"{b}.img_mod.1", 6 * d, d)
        _linear(s, f"{b}.txt_mod.1", 6 * d, d)
        for proj in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                     "add_v_proj", "to_out.0", "to_add_out"):
            _linear(s, f"{b}.attn.{proj}", d, d)
        for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            s[f"{b}.attn.{n}.weight"] = (dh,)
        _linear(s, f"{b}.img_mlp.net.0.proj", 4 * d, d)
        _linear(s, f"{b}.img_mlp.net.2", d, 4 * d)
        _linear(s, f"{b}.txt_mlp.net.0.proj", 4 * d, d)
        _linear(s, f"{b}.txt_mlp.net.2", d, 4 * d)
    _linear(s, "norm_out.linear", 2 * d, d)
    _linear(s, "proj_out", p * p * cfg.in_channels, d)
    return s


# -------------------------------------------------------------------- T5

def spec_t5_encoder(cfg) -> Spec:
    """HF T5EncoderModel (google/t5-v1_1-xxl class) — FLUX `text_encoder_2`
    (reference: tools/flux_depth.py:19-22 loads the int4 T5-XXL whose
    dequantized state dict has exactly these keys).

    Safetensors serialization drops the tied `encoder.embed_tokens.weight`
    duplicate; only `shared.weight` ships.  All projections bias-free;
    norms are RMS (weight only); the relative-attention bias embedding
    exists on block 0 only and is shared by every layer.
    """
    d = cfg.d_model
    inner = cfg.num_heads * cfg.d_kv
    s: Spec = {}
    s["shared.weight"] = (cfg.vocab_size, d)
    for i in range(cfg.num_layers):
        b = f"encoder.block.{i}"
        for proj, shape in (("q", (inner, d)), ("k", (inner, d)),
                            ("v", (inner, d)), ("o", (d, inner))):
            s[f"{b}.layer.0.SelfAttention.{proj}.weight"] = shape
        if i == 0:
            s[f"{b}.layer.0.SelfAttention.relative_attention_bias"
              ".weight"] = (cfg.rel_buckets, cfg.num_heads)
        s[f"{b}.layer.0.layer_norm.weight"] = (d,)
        s[f"{b}.layer.1.DenseReluDense.wi_0.weight"] = (cfg.d_ff, d)
        s[f"{b}.layer.1.DenseReluDense.wi_1.weight"] = (cfg.d_ff, d)
        s[f"{b}.layer.1.DenseReluDense.wo.weight"] = (d, cfg.d_ff)
        s[f"{b}.layer.1.layer_norm.weight"] = (d,)
    s["encoder.final_layer_norm.weight"] = (d,)
    return s


# ------------------------------------------------------------ Qwen2.5-VL

def spec_qwen_vl_text(cfg) -> Spec:
    """Qwen2.5-VL language tower (Qwen-Image-Edit `text_encoder`;
    reference: tools/qwen_depth.py:50-62).  transformers>=4.52 layout
    (`model.language_model.*`); the converter also accepts the legacy
    `model.*` prefix.  q/k/v biased, o/gate/up/down unbiased, RMS norms.
    The untied `lm_head.weight` ships in the checkpoint but is dropped —
    prompt encoding reads hidden states, never logits.
    """
    d = cfg.hidden
    hd = cfg.head_dim
    s: Spec = {}
    s["model.language_model.embed_tokens.weight"] = (cfg.vocab_size, d)
    for i in range(cfg.layers):
        b = f"model.language_model.layers.{i}"
        _linear(s, f"{b}.self_attn.q_proj", cfg.heads * hd, d)
        _linear(s, f"{b}.self_attn.k_proj", cfg.kv_heads * hd, d)
        _linear(s, f"{b}.self_attn.v_proj", cfg.kv_heads * hd, d)
        _linear(s, f"{b}.self_attn.o_proj", d, cfg.heads * hd, bias=False)
        s[f"{b}.input_layernorm.weight"] = (d,)
        s[f"{b}.post_attention_layernorm.weight"] = (d,)
        _linear(s, f"{b}.mlp.gate_proj", cfg.intermediate, d, bias=False)
        _linear(s, f"{b}.mlp.up_proj", cfg.intermediate, d, bias=False)
        _linear(s, f"{b}.mlp.down_proj", d, cfg.intermediate, bias=False)
    s["model.language_model.norm.weight"] = (d,)
    return s


def spec_qwen_vl_vision(cfg) -> Spec:
    """Qwen2.5-VL vision tower (`model.visual.*`): Conv3D patch embed
    (bias-free), RMS-normed window-attention blocks with fused biased
    qkv and biased gated MLP, and the 2x2 merger MLP."""
    d = cfg.vit_dim
    s: Spec = {}
    s["model.visual.patch_embed.proj.weight"] = \
        (d, 3, cfg.temporal_patch, cfg.patch, cfg.patch)
    for i in range(cfg.vit_depth):
        b = f"model.visual.blocks.{i}"
        s[f"{b}.norm1.weight"] = (d,)
        _linear(s, f"{b}.attn.qkv", 3 * d, d)
        _linear(s, f"{b}.attn.proj", d, d)
        s[f"{b}.norm2.weight"] = (d,)
        _linear(s, f"{b}.mlp.gate_proj", cfg.vit_ffn, d)
        _linear(s, f"{b}.mlp.up_proj", cfg.vit_ffn, d)
        _linear(s, f"{b}.mlp.down_proj", d, cfg.vit_ffn)
    s["model.visual.merger.ln_q.weight"] = (d,)
    mm = cfg.merge ** 2
    _linear(s, "model.visual.merger.mlp.0", mm * d, mm * d)
    _linear(s, "model.visual.merger.mlp.2", cfg.hidden, mm * d)
    return s


# ------------------------------------------------------------------ CLIP

def spec_clip_text(cfg) -> Spec:
    """HF CLIPTextModel / CLIPTextModelWithProjection (SDXL towers)."""
    d = cfg.hidden_dim
    s: Spec = {}
    s["text_model.embeddings.token_embedding.weight"] = (cfg.vocab_size, d)
    s["text_model.embeddings.position_embedding.weight"] = (cfg.max_len, d)
    for i in range(cfg.num_layers):
        b = f"text_model.encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _linear(s, f"{b}.self_attn.{proj}", d, d)
        _norm(s, f"{b}.layer_norm1", d)
        _linear(s, f"{b}.mlp.fc1", 4 * d, d)
        _linear(s, f"{b}.mlp.fc2", d, 4 * d)
        _norm(s, f"{b}.layer_norm2", d)
    _norm(s, "text_model.final_layer_norm", d)
    if cfg.proj_dim:
        _linear(s, "text_projection", cfg.proj_dim, d, bias=False)
    return s


def spec_clip_vision(cfg) -> Spec:
    """HF CLIPVisionModelWithProjection (the zero123plus `vision_encoder`,
    OpenCLIP ViT-H with a 1024-d projection)."""
    d = cfg.hidden_dim
    s: Spec = {}
    s["vision_model.embeddings.class_embedding"] = (d,)
    s["vision_model.embeddings.patch_embedding.weight"] = \
        (d, 3, cfg.patch, cfg.patch)
    s["vision_model.embeddings.position_embedding.weight"] = \
        (1 + (cfg.image_size // cfg.patch) ** 2, d)
    _norm(s, "vision_model.pre_layrnorm", d)     # HF's misspelling
    for i in range(cfg.num_layers):
        b = f"vision_model.encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _linear(s, f"{b}.self_attn.{proj}", d, d)
        _norm(s, f"{b}.layer_norm1", d)
        _linear(s, f"{b}.mlp.fc1", 4 * d, d)
        _linear(s, f"{b}.mlp.fc2", d, 4 * d)
        _norm(s, f"{b}.layer_norm2", d)
    _norm(s, "vision_model.post_layernorm", d)
    _linear(s, "visual_projection", cfg.proj_dim, d, bias=False)
    return s


# ----------------------------------------------------- UNet (SD2 / SDXL)

def spec_unet(cfg) -> Spec:
    """diffusers UNet2DConditionModel for our UNetConfig block structure.

    Covers the SDXL base / zero123plus (SD2-class) layouts: linear
    transformer projections, GEGLU feed-forwards, per-level cross-attn
    down/up blocks, optional SDXL add_embedding.
    """
    s: Spec = {}
    boc = cfg.block_out_channels
    temb = cfg.temb_dim
    ctx = cfg.context_dim

    def resnet(prefix: str, in_ch: int, out_ch: int) -> None:
        _norm(s, f"{prefix}.norm1", in_ch)
        _conv(s, f"{prefix}.conv1", out_ch, in_ch)
        _linear(s, f"{prefix}.time_emb_proj", out_ch, temb)
        _norm(s, f"{prefix}.norm2", out_ch)
        _conv(s, f"{prefix}.conv2", out_ch, out_ch)
        if in_ch != out_ch:
            _conv(s, f"{prefix}.conv_shortcut", out_ch, in_ch, k=1)

    def attention(prefix: str, ch: int, depth: int) -> None:
        _norm(s, f"{prefix}.norm", ch)
        _linear(s, f"{prefix}.proj_in", ch, ch)
        for j in range(depth):
            b = f"{prefix}.transformer_blocks.{j}"
            _norm(s, f"{b}.norm1", ch)
            for proj in ("to_q", "to_k", "to_v"):
                _linear(s, f"{b}.attn1.{proj}", ch, ch, bias=False)
            _linear(s, f"{b}.attn1.to_out.0", ch, ch)
            _norm(s, f"{b}.norm2", ch)
            _linear(s, f"{b}.attn2.to_q", ch, ch, bias=False)
            _linear(s, f"{b}.attn2.to_k", ch, ctx, bias=False)
            _linear(s, f"{b}.attn2.to_v", ch, ctx, bias=False)
            _linear(s, f"{b}.attn2.to_out.0", ch, ch)
            _norm(s, f"{b}.norm3", ch)
            _linear(s, f"{b}.ff.net.0.proj", 8 * ch, ch)   # GEGLU
            _linear(s, f"{b}.ff.net.2", ch, 4 * ch)
        _linear(s, f"{prefix}.proj_out", ch, ch)

    _conv(s, "conv_in", boc[0], cfg.in_channels)
    _linear(s, "time_embedding.linear_1", temb, boc[0])
    _linear(s, "time_embedding.linear_2", temb, temb)
    if cfg.addition_embed_dim:
        _linear(s, "add_embedding.linear_1", temb, cfg.addition_embed_dim)
        _linear(s, "add_embedding.linear_2", temb, temb)

    # down path
    ch_in = boc[0]
    skip_chs = [boc[0]]
    for level, ch in enumerate(boc):
        last = level == len(boc) - 1
        depth = cfg.transformer_depths[level]
        for i in range(cfg.layers_per_block):
            resnet(f"down_blocks.{level}.resnets.{i}", ch_in, ch)
            if depth > 0:
                attention(f"down_blocks.{level}.attentions.{i}", ch, depth)
            ch_in = ch
            skip_chs.append(ch)
        if not last:
            _conv(s, f"down_blocks.{level}.downsamplers.0.conv", ch, ch)
            skip_chs.append(ch)

    # mid
    mid_ch = boc[-1]
    mid_depth = cfg.mid_depth if cfg.mid_depth is not None \
        else cfg.transformer_depths[-1]
    resnet("mid_block.resnets.0", mid_ch, mid_ch)
    if mid_depth > 0:
        attention("mid_block.attentions.0", mid_ch, mid_depth)
    resnet("mid_block.resnets.1", mid_ch, mid_ch)

    # up path: diffusers up_blocks[0] is the DEEPEST level
    x_ch = mid_ch
    for ui, level in enumerate(reversed(range(len(boc)))):
        ch = boc[level]
        depth = cfg.transformer_depths[level]
        for i in range(cfg.layers_per_block + 1):
            skip = skip_chs.pop()
            resnet(f"up_blocks.{ui}.resnets.{i}", x_ch + skip, ch)
            if depth > 0:
                attention(f"up_blocks.{ui}.attentions.{i}", ch, depth)
            x_ch = ch
        if level > 0:
            _conv(s, f"up_blocks.{ui}.upsamplers.0.conv", ch, ch)

    _norm(s, "conv_norm_out", boc[0])
    _conv(s, "conv_out", cfg.out_channels, boc[0])
    return s


# ---------------------------------------------------- RMBG-2.0 (BiRefNet)

def spec_birefnet(cfg) -> Spec:
    """RMBG-2.0 (BiRefNet, Swin-v1-Large backbone) learnable parameters.

    Backbone keys follow the original Microsoft Swin dense-prediction
    implementation BiRefNet vendors (fused qkv, relative-position bias
    tables, per-stage out-norms `bb.norm{i}`); decoder keys follow the
    public BiRefNet module layout (BasicDecBlk / BasicLatBlk / gdt
    guidance branch).  Registered buffers (relative_position_index,
    attn_mask, num_batches_tracked) are excluded — the converter drops
    them; BatchNorm running stats ARE included (inference needs them).
    """
    s: Spec = {}
    d = cfg.embed_dim
    _conv(s, "bb.patch_embed.proj", d, 3, k=cfg.patch)
    _norm(s, "bb.patch_embed.norm", d)
    for l, depth in enumerate(cfg.depths):
        c = cfg.channels[l]
        for b in range(depth):
            p = f"bb.layers.{l}.blocks.{b}"
            _norm(s, f"{p}.norm1", c)
            s[f"{p}.attn.relative_position_bias_table"] = \
                ((2 * cfg.window - 1) ** 2, cfg.num_heads[l])
            _linear(s, f"{p}.attn.qkv", 3 * c, c)
            _linear(s, f"{p}.attn.proj", c, c)
            _norm(s, f"{p}.norm2", c)
            _linear(s, f"{p}.mlp.fc1", 4 * c, c)
            _linear(s, f"{p}.mlp.fc2", c, 4 * c)
        if l < len(cfg.depths) - 1:
            _norm(s, f"bb.layers.{l}.downsample.norm", 4 * c)
            s[f"bb.layers.{l}.downsample.reduction.weight"] = (2 * c, 4 * c)
        _norm(s, f"bb.norm{l}", c)

    def bn(prefix: str, c: int) -> None:
        s[f"{prefix}.weight"] = (c,)
        s[f"{prefix}.bias"] = (c,)
        s[f"{prefix}.running_mean"] = (c,)
        s[f"{prefix}.running_var"] = (c,)

    ch = cfg.channels

    def dec_blk_in(prefix: str, in_c: int, out_c: int) -> None:
        _conv(s, f"{prefix}.conv_in", cfg.dec_inter, in_c)
        bn(f"{prefix}.bn_in", cfg.dec_inter)
        _conv(s, f"{prefix}.conv_out", out_c, cfg.dec_inter)
        bn(f"{prefix}.bn_out", out_c)

    dec_blk_in("squeeze_module.0", ch[3], ch[3])
    dec_blk_in("decoder.decoder_block4", ch[3], ch[2])
    dec_blk_in("decoder.decoder_block3", ch[2], ch[1])
    dec_blk_in("decoder.decoder_block2", ch[1], ch[0])
    dec_blk_in("decoder.decoder_block1", ch[0], ch[0] // 2)
    for tag, c in (("4", ch[2]), ("3", ch[1]), ("2", ch[0])):
        _conv(s, f"decoder.lateral_block{tag}.conv", c, c, k=1)
        _conv(s, f"decoder.gdt_convs_{tag}.0", cfg.gdt_ch, c)
        bn(f"decoder.gdt_convs_{tag}.1", cfg.gdt_ch)
        _conv(s, f"decoder.gdt_convs_attn_{tag}.0", 1, cfg.gdt_ch, k=1)
        _conv(s, f"decoder.gdt_convs_pred_{tag}.0", 1, cfg.gdt_ch, k=1)
    _conv(s, "decoder.conv_out1.0", 1, ch[0] // 2, k=1)
    return s


# ----------------------------------------------------------- InstantMesh

def spec_instantmesh(cfg) -> Spec:
    """TencentARC/InstantMesh lrm checkpoint (instant_mesh_base layout,
    `lrm_generator.` prefix already stripped — reference:
    tools/instantmesh.py:107-109).

    Reconstructed from the public InstantMesh implementation: DinoWrapper
    (HF dino-vitb16 ViT + per-layer adaLN camera modulation + the 16-d
    camera MLP), TriplaneTransformer (torch nn.MultiheadAttention layout:
    fused in_proj for self-attention, separate q/k/v projections for the
    cross-attention whose kdim is the ViT width), and the FlexiCubes OSG
    decoder's four Sequential heads.
    """
    d = cfg.vit_dim
    s: Spec = {}
    t = (cfg.img_size // cfg.patch) ** 2
    s["encoder.model.embeddings.cls_token"] = (1, 1, d)
    s["encoder.model.embeddings.position_embeddings"] = (1, 1 + t, d)
    s["encoder.model.embeddings.patch_embeddings.projection.weight"] = \
        (d, 3, cfg.patch, cfg.patch)
    s["encoder.model.embeddings.patch_embeddings.projection.bias"] = (d,)
    for i in range(cfg.vit_layers):
        b = f"encoder.model.encoder.layer.{i}"
        for proj in ("query", "key", "value"):
            _linear(s, f"{b}.attention.attention.{proj}", d, d)
        _linear(s, f"{b}.attention.output.dense", d, d)
        _linear(s, f"{b}.intermediate.dense", 4 * d, d)
        _linear(s, f"{b}.output.dense", d, 4 * d)
        _norm(s, f"{b}.layernorm_before", d)
        _norm(s, f"{b}.layernorm_after", d)
        _linear(s, f"{b}.adaLN_modulation.1", 4 * d, d)
    _norm(s, "encoder.model.layernorm", d)
    _linear(s, "encoder.model.pooler.dense", d, d)
    _linear(s, "encoder.camera_embedder.0", d, 16)
    _linear(s, "encoder.camera_embedder.2", d, d)

    dd = cfg.dec_dim
    low = cfg.triplane_low_res
    s["transformer.pos_embed"] = (1, 3 * low * low, dd)
    for i in range(cfg.dec_layers):
        b = f"transformer.layers.{i}"
        _norm(s, f"{b}.norm1", dd)
        s[f"{b}.cross_attn.q_proj_weight"] = (dd, dd)
        s[f"{b}.cross_attn.k_proj_weight"] = (dd, d)   # kdim = ViT width
        s[f"{b}.cross_attn.v_proj_weight"] = (dd, d)
        s[f"{b}.cross_attn.in_proj_bias"] = (3 * dd,)
        _linear(s, f"{b}.cross_attn.out_proj", dd, dd)
        _norm(s, f"{b}.norm2", dd)
        s[f"{b}.self_attn.in_proj_weight"] = (3 * dd, dd)
        s[f"{b}.self_attn.in_proj_bias"] = (3 * dd,)
        _linear(s, f"{b}.self_attn.out_proj", dd, dd)
        _norm(s, f"{b}.norm3", dd)
        _linear(s, f"{b}.mlp.0", 4 * dd, dd)
        _linear(s, f"{b}.mlp.2", dd, 4 * dd)
    _norm(s, "transformer.norm", dd)
    # ConvTranspose2d: torch layout (in, out, kh, kw)
    s["transformer.deconv.weight"] = (dd, cfg.triplane_dim, 2, 2)
    s["transformer.deconv.bias"] = (cfg.triplane_dim,)

    for head, out in (("net_sdf", 1), ("net_rgb", 3),
                      ("net_deformation", 3), ("net_weight", 21)):
        in_dim = 3 * cfg.triplane_dim
        for j in range(cfg.mlp_layers - 1):
            _linear(s, f"synthesizer.decoder.{head}.{2 * j}",
                    cfg.mlp_dim, in_dim)
            in_dim = cfg.mlp_dim
        _linear(s, f"synthesizer.decoder.{head}."
                   f"{2 * (cfg.mlp_layers - 1)}", out, in_dim)
    return s


def spec_controlnet(cfg, cond_channels: Tuple[int, ...] = (16, 32, 96, 256)
                    ) -> Spec:
    """diffusers ControlNetModel (xinsir/controlnet-depth-sdxl-1.0 layout):
    the UNet's down+mid trunk, the conditioning embedding, and the
    zero-conv residual taps."""
    s: Spec = {}
    boc = cfg.block_out_channels
    # trunk = down+mid of the unet spec (drop up path + output head)
    for k, v in spec_unet(cfg).items():
        if not (k.startswith("up_blocks.") or k.startswith("conv_norm_out")
                or k.startswith("conv_out")):
            s[k] = v
    _conv(s, "controlnet_cond_embedding.conv_in", cond_channels[0], 3)
    for i in range(len(cond_channels) - 1):
        _conv(s, f"controlnet_cond_embedding.blocks.{2 * i}",
              cond_channels[i], cond_channels[i])
        _conv(s, f"controlnet_cond_embedding.blocks.{2 * i + 1}",
              cond_channels[i + 1], cond_channels[i])
    _conv(s, "controlnet_cond_embedding.conv_out", boc[0],
          cond_channels[-1])
    # zero-conv taps: conv_in skip + per-level (layers + downsample)
    n_skips = 1
    for level in range(len(boc)):
        n_skips += cfg.layers_per_block
        if level < len(boc) - 1:
            n_skips += 1
    skip_chs = [boc[0]]
    for level, ch in enumerate(boc):
        skip_chs += [ch] * cfg.layers_per_block
        if level < len(boc) - 1:
            skip_chs.append(ch)
    assert len(skip_chs) == n_skips
    for i, ch in enumerate(skip_chs):
        _conv(s, f"controlnet_down_blocks.{i}", ch, ch, k=1)
    _conv(s, "controlnet_mid_block", boc[-1], boc[-1], k=1)
    return s
