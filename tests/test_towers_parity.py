"""Numerical parity of the conditioning towers vs the REAL HF modeling code.

The container is zero-egress (no pretrained checkpoints), but torch +
transformers ARE installed — so for every tower we rebuild (T5-XXL,
Qwen2.5-VL text/vision, CLIP) we can instantiate the authentic HF
implementation at tiny scale with random weights, export its state dict,
graft it through our converters, and require the flax forward to match
the torch forward numerically.  This validates the weight-layout mapping,
norm placement, activation choices, RoPE/bias math, and (for the ViT)
the window-attention token ordering — everything a real checkpoint load
depends on.

Tolerances account for our bf16 matmul policy vs torch fp32.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _agree(a, b, tol=0.05, label=""):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    scale = max(np.abs(b).max(), 1e-6)
    rel = np.abs(a - b).max() / scale
    cos = float((a * b).sum() /
                (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    assert rel < tol and cos > 0.999, \
        f"{label}: rel={rel:.4f} cos={cos:.6f}"


def _state_dict_np(model):
    return {k: v.detach().cpu().numpy() for k, v in
            model.state_dict().items()}


# ------------------------------------------------------------------- T5

def test_t5_matches_hf():
    from transformers import T5Config as HFT5Config, T5EncoderModel
    from genpc_tpu.models.t5 import T5Config, T5Encoder
    from genpc_tpu.models.weights import convert_t5, graft_weights

    cfg = T5Config.preset("tiny")
    hf_cfg = HFT5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_kv=cfg.d_kv,
        num_heads=cfg.num_heads, d_ff=cfg.d_ff, num_layers=cfg.num_layers,
        relative_attention_num_buckets=cfg.rel_buckets,
        relative_attention_max_distance=cfg.rel_max_distance,
        feed_forward_proj="gated-gelu", dropout_rate=0.0,
        is_encoder_decoder=False)
    torch.manual_seed(0)
    hf = T5EncoderModel(hf_cfg).eval()

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 24))
    mask = np.ones((2, 24), np.int64)
    mask[1, 17:] = 0
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).last_hidden_state
    ref = ref.numpy() * mask[..., None]

    model = T5Encoder(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids, jnp.int32),
                        jnp.asarray(mask, bool))
    sd = {k: v for k, v in _state_dict_np(hf).items()
          if k != "encoder.embed_tokens.weight"}
    params = graft_weights(params, convert_t5(sd), {}, "t5-parity",
                           strict=True)
    out = model.apply(params, jnp.asarray(ids, jnp.int32),
                      jnp.asarray(mask, bool))
    _agree(out, ref, label="t5")


# ----------------------------------------------------------- Qwen2.5-VL

def _tiny_qwen_hf(cfg):
    from transformers import Qwen2_5_VLConfig
    vis = dict(
        depth=cfg.vit_depth, hidden_size=cfg.vit_dim,
        num_heads=cfg.vit_heads, intermediate_size=cfg.vit_ffn,
        patch_size=cfg.patch, temporal_patch_size=cfg.temporal_patch,
        spatial_merge_size=cfg.merge, window_size=cfg.window,
        fullatt_block_indexes=list(cfg.fullatt_blocks),
        out_hidden_size=cfg.hidden)
    text = dict(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden,
        num_hidden_layers=cfg.layers, num_attention_heads=cfg.heads,
        num_key_value_heads=cfg.kv_heads, head_dim=cfg.head_dim,
        intermediate_size=cfg.intermediate, rms_norm_eps=cfg.eps,
        rope_theta=cfg.theta,
        rope_scaling={"type": "mrope",
                      "mrope_section": list(cfg.mrope_section)},
        attention_dropout=0.0, tie_word_embeddings=False)
    return Qwen2_5_VLConfig(text_config=text, vision_config=vis)


def test_qwen_vl_text_matches_hf():
    from transformers import Qwen2_5_VLForConditionalGeneration
    from genpc_tpu.models.qwen_vl import QwenVLConfig, QwenVLTextModel
    from genpc_tpu.models.weights import convert_qwen_vl, graft_weights

    cfg = QwenVLConfig.preset("tiny")
    torch.manual_seed(0)
    hf = Qwen2_5_VLForConditionalGeneration(_tiny_qwen_hf(cfg)).eval()

    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 20))
    # 3-plane M-RoPE ids with distinct planes (as a mid-image segment has)
    pos = np.stack([np.arange(20), np.arange(20) // 2, np.arange(20) % 7])
    with torch.no_grad():
        ref = hf.model.language_model(
            input_ids=torch.tensor(ids),
            position_ids=torch.tensor(pos[:, None, :]),
        ).last_hidden_state.numpy()

    model = QwenVLTextModel(cfg)
    jpos = jnp.asarray(pos[:, None, :], jnp.int32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(ids, jnp.int32), jpos)
    text, _ = convert_qwen_vl(_state_dict_np(hf))
    params = graft_weights(params, text, {}, "qwenvl-text-parity",
                           strict=True)
    out = model.apply(params, jnp.asarray(ids, jnp.int32), jpos)
    _agree(out, ref, label="qwen-vl-text")


def test_qwen_vl_vision_matches_hf():
    from transformers import Qwen2_5_VLForConditionalGeneration
    from genpc_tpu.models.qwen_vl import (QwenVLConfig, QwenVisionModel,
                                          image_to_patches)
    from genpc_tpu.models.weights import convert_qwen_vl, graft_weights

    cfg = QwenVLConfig.preset("tiny")
    torch.manual_seed(0)
    hf = Qwen2_5_VLForConditionalGeneration(_tiny_qwen_hf(cfg)).eval()

    rng = np.random.default_rng(2)
    px = 32                       # 8x8 patches -> 4x4 cells -> 4 windows
    img = rng.uniform(size=(px, px, 3)).astype(np.float32)
    patches = image_to_patches(img, cfg)
    grid = px // cfg.patch
    with torch.no_grad():
        ref = hf.model.visual(
            torch.tensor(patches),
            grid_thw=torch.tensor([[1, grid, grid]])).numpy()

    model = QwenVisionModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(patches), grid)
    _, vision = convert_qwen_vl(_state_dict_np(hf))
    params = graft_weights(params, vision, {}, "qwenvl-vision-parity",
                           strict=True)
    out = model.apply(params, jnp.asarray(patches), grid)
    _agree(out, ref, label="qwen-vl-vision")


# ------------------------------------------------------------ CLIP vision

def test_clip_vision_matches_hf():
    from transformers import CLIPVisionConfig as HFVisionConfig
    from transformers import CLIPVisionModelWithProjection
    from genpc_tpu.models.text_encoder import (CLIPVisionConfig,
                                               CLIPVisionModel)
    from genpc_tpu.models.weights import convert_clip_vision, graft_weights

    cfg = CLIPVisionConfig.preset("tiny")
    hf_cfg = HFVisionConfig(
        hidden_size=cfg.hidden_dim, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, intermediate_size=4 * cfg.hidden_dim,
        patch_size=cfg.patch, image_size=cfg.image_size,
        projection_dim=cfg.proj_dim, hidden_act="gelu",
        attention_dropout=0.0)
    torch.manual_seed(0)
    hf = CLIPVisionModelWithProjection(hf_cfg).eval()

    rng = np.random.default_rng(3)
    img = rng.normal(size=(1, cfg.image_size, cfg.image_size, 3)
                     ).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.tensor(
            img.transpose(0, 3, 1, 2))).image_embeds.numpy()

    model = CLIPVisionModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(img))
    sd = {k: v for k, v in _state_dict_np(hf).items()
          if "position_ids" not in k}
    params = graft_weights(params, convert_clip_vision(sd), {},
                           "clip-vision-parity", strict=True)
    _, emb = model.apply(params, jnp.asarray(img))
    _agree(emb, ref, tol=0.08, label="clip-vision")


# ----------------------------------------------- reference attention (UNet)

def test_reference_attention_duplicate_kv_invariance():
    """READ mode with reference tokens equal to the model's own post-norm
    hidden states must reproduce plain self-attention exactly (duplicated
    keys halve each softmax weight but preserve the weighted sum) — this
    pins the RefBank plumbing end to end through the UNet."""
    from genpc_tpu.models.layers import RefBank
    from genpc_tpu.models.unet import UNet2DCondition, UNetConfig

    cfg = UNetConfig.preset("tiny")
    model = UNet2DCondition(cfg)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(1, 8, 8, cfg.in_channels)),
                      jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(1, 12, cfg.context_dim)),
                      jnp.float32)
    added = jnp.asarray(rng.normal(size=(1, cfg.addition_embed_dim)),
                        jnp.float32)
    t = jnp.asarray([4.0])
    params = model.init(jax.random.PRNGKey(1), lat, t, ctx, added)

    plain = model.apply(params, lat, t, ctx, added)
    bank = RefBank("w")
    model.apply(params, lat, t, ctx, added, ref=bank)
    assert len(bank.tokens) > 0
    dup = model.apply(params, lat, t, ctx, added,
                      ref=RefBank("r", bank.tokens))
    np.testing.assert_allclose(np.asarray(dup), np.asarray(plain),
                               atol=2e-5)

    # and DIFFERENT reference tokens must change the output
    other = [tok + 1.0 for tok in bank.tokens]
    changed = model.apply(params, lat, t, ctx, added,
                          ref=RefBank("r", other))
    assert float(jnp.abs(changed - plain).max()) > 1e-4


@pytest.mark.slow
def test_dit_generate_batch_shapes():
    """Object-batched denoise: one program, B stacked results."""
    from genpc_tpu.models.dit_depth import DiTDepthEdit
    gen = DiTDepthEdit(variant="qwen")
    rng = np.random.default_rng(0)
    depths = [rng.uniform(size=(32, 32)).astype(np.float32)
              for _ in range(3)]
    out = gen.generate_batch(depths, ["01184", "05117", "06127"], size=32,
                             num_inference_steps=2)
    assert out.shape == (3, 32, 32, 3)
    assert np.isfinite(out).all()
    single = gen.generate(depths[0], "01184", size=32,
                          num_inference_steps=2)
    assert single.shape == (32, 32, 3)


@pytest.mark.slow
def test_flux_generate_uses_t5():
    from genpc_tpu.models.dit_depth import DiTDepthEdit
    gen = DiTDepthEdit(variant="flux")
    assert hasattr(gen, "t5")
    rng = np.random.default_rng(0)
    out = gen.generate(rng.uniform(size=(32, 32)).astype(np.float32),
                       "chair", size=32, num_inference_steps=2)
    assert out.shape == (32, 32, 3)
    assert np.isfinite(out).all()


def test_qwen_vl_encoder_template_protocol():
    """encode() must return only post-template tokens (the diffusers
    split_hidden_states drop), include the image tokens in the sequence,
    and react to the image content."""
    from genpc_tpu.models.qwen_vl import (EDIT_TEMPLATE_PREFIX,
                                          QwenVLEncoder)
    enc = QwenVLEncoder("tiny")
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(24, 24, 3)).astype(np.float32)

    out = enc.encode("a chair", img)
    # the template prefix is dropped; what remains is the image slot
    # header, the merged image tokens, and the prompt + chat suffix
    n_head = len(enc._ids("Picture 1: <|vision_start|>"))
    n_img = (enc.vision_px // enc.cfg.patch) ** 2 // enc.cfg.merge ** 2
    n_tail = len(enc._ids("<|vision_end|>a chair")) + len(
        enc._ids("<|im_end|>\n<|im_start|>assistant\n"))
    assert out.shape[1] == n_head + n_img + n_tail
    assert len(enc._ids(EDIT_TEMPLATE_PREFIX)) > 10  # prefix was dropped
    assert out.shape[2] == enc.cfg.hidden

    out2 = enc.encode("a chair", 1.0 - img)
    assert float(np.abs(np.asarray(out) - np.asarray(out2)).max()) > 1e-4

    txt_only = enc.encode("a chair")
    assert txt_only.shape[2] == enc.cfg.hidden
    assert txt_only.shape[1] < out.shape[1]


def test_vision_px_snaps_to_whole_windows():
    """The full preset's window attention needs grids that tile into
    whole windows; the encoder must snap any requested vision_px UP to
    the next whole-window multiple (392 -> 448 at patch 14 / merge 2 /
    112px windows) instead of erroring at encode time."""
    from genpc_tpu.models.qwen_vl import (QwenVLConfig, snap_vision_px,
                                          window_permutation)
    cfg = QwenVLConfig.preset("full")
    assert cfg.window_cells * cfg.merge * cfg.patch == 112
    snapped = snap_vision_px(392, cfg)
    assert snapped == 448
    assert snap_vision_px(448, cfg) == 448
    perm = window_permutation(snapped // cfg.patch, cfg)
    assert sorted(perm.tolist()) == list(range(len(perm)))
    with pytest.raises(ValueError):
        window_permutation(392 // cfg.patch, cfg)
