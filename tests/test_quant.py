"""Weight-only int8/int4 quantization (models/quant.py).

The reference's default 12B/20B backends run on ONE consumer GPU via
Nunchaku int4 quantization (reference: tools/qwen_depth.py:50-62,
tools/flux_depth.py:12-30); these tests pin the TPU-native equivalent:
per-output-channel symmetric quantization, the QuantDense dequant-in-
matmul layer, tree quantization over the MMDiT block domain, and the
end-to-end quantized DiT backends at tiny scale.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.core import meta as flax_meta

from genpc_tpu.models.quant import (QuantDense, dequantize_array,
                                    dit_block_select, fp_template_like,
                                    pack_int4, quantize_array,
                                    quantize_tree, tree_bytes,
                                    unpack_int4)


@pytest.mark.parametrize("bits,rtol", [(8, 0.02), (4, 0.25)])
def test_quantize_roundtrip(bits, rtol):
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 48)).astype(np.float32) * 0.2
    q, s = quantize_array(jnp.asarray(w), bits)
    assert s.shape == (48,)
    wd = np.asarray(dequantize_array(q, s, bits=bits))
    # per-column absmax scaling bounds elementwise error by scale/2
    assert np.all(np.abs(wd - w) <= np.asarray(s)[None, :] * 0.5 + 1e-6)
    rel = np.linalg.norm(wd - w) / np.linalg.norm(w)
    assert rel < rtol


def test_quantize_int_range_and_dtype():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(32, 16)), jnp.float32)
    q8, _ = quantize_array(w, 8)
    q4, _ = quantize_array(w, 4)
    assert q8.dtype == jnp.int8
    # int4 is nibble-packed int8 [in/2, out] — the native S4 dtype
    # recurses in device_put on the tunneled TPU backend
    assert q4.dtype == jnp.int8 and q4.shape == (16, 16)
    assert int(jnp.max(jnp.abs(q8.astype(jnp.int32)))) <= 127
    assert int(jnp.max(jnp.abs(unpack_int4(q4).astype(jnp.int32)))) <= 7


def test_pack_unpack_int4_roundtrip():
    rng = np.random.default_rng(11)
    q = rng.integers(-8, 8, size=(30, 17)).astype(np.int8)
    rt = np.asarray(unpack_int4(pack_int4(jnp.asarray(q))))
    np.testing.assert_array_equal(rt, q)


@pytest.mark.parametrize("bits", [8, 4])
def test_quant_dense_matches_manual_dequant(bits):
    x = jnp.asarray(np.random.default_rng(2).normal(size=(3, 24)),
                    jnp.float32)
    layer = QuantDense(features=16, bits=bits, dtype=jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x)
    p = flax_meta.unbox(params)["params"]
    q = p["kernel_p4"] if bits == 4 else p["kernel"]
    w = dequantize_array(q, p["scale"], jnp.float32, bits=bits)
    ref = x @ w + p["bias"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_quant_init_statistics_match_lecun():
    """Random-init QuantDense must reproduce lecun-normal kernel stats so
    random-weight benches behave like the bf16 path."""
    x = jnp.zeros((1, 512))
    layer = QuantDense(features=256, bits=8)
    params = flax_meta.unbox(layer.init(jax.random.PRNGKey(3), x))["params"]
    w = np.asarray(dequantize_array(params["kernel"], params["scale"]))
    assert abs(w.std() * np.sqrt(512) - 1.0) < 0.1
    assert abs(w.mean()) < 0.01


def _tiny_mmdit(quant_bits):
    from genpc_tpu.models.dit import DiTConfig, MMDiT
    cfg = dataclasses.replace(DiTConfig.preset("tiny"),
                              quant_bits=quant_bits)
    model = MMDiT(cfg)
    lat = jnp.zeros((1, 8, 8, cfg.in_channels))
    cond = jnp.zeros((1, 8, 8, cfg.cond_channels))
    txt = jnp.zeros((1, 7, cfg.text_dim))
    pooled = jnp.zeros((1, cfg.pooled_dim))
    args = (lat, jnp.zeros((1,)), txt)
    kw = dict(pooled=pooled, cond_latents=cond, guidance=jnp.ones((1,)))
    return model, args, kw


@pytest.mark.slow
def test_fp_template_matches_unquantized_structure():
    model_q, args, kw = _tiny_mmdit(8)
    model_f, _, _ = _tiny_mmdit(0)
    pq = model_q.init(jax.random.PRNGKey(0), *args, **kw)
    pf = model_f.init(jax.random.PRNGKey(0), *args, **kw)
    tmpl = fp_template_like(pq)
    paths_t = {jax.tree_util.keystr(p): l.shape for p, l in
               jax.tree_util.tree_flatten_with_path(tmpl)[0]}
    paths_f = {jax.tree_util.keystr(p): l.shape for p, l in
               jax.tree_util.tree_flatten_with_path(
                   flax_meta.unbox(pf))[0]}
    assert paths_t == paths_f


@pytest.mark.parametrize("bits,tol", [(8, 0.05), (4, 0.45)])
def test_quantized_mmdit_forward_close_to_fp(bits, tol):
    """quantize_tree(fp_params) must drop into the quantized model and
    produce outputs close to the full-precision forward."""
    model_q, args, kw = _tiny_mmdit(bits)
    model_f, _, _ = _tiny_mmdit(0)
    rng = np.random.default_rng(4)
    lat = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
    txt = jnp.asarray(rng.normal(size=(1, 7, 64)), jnp.float32)
    args_r = (lat, jnp.full((1,), 0.5), txt)
    pf = model_f.init(jax.random.PRNGKey(0), *args, **kw)
    pq = {"params": quantize_tree(pf["params"], bits, dit_block_select)}
    out_f = np.asarray(model_f.apply(pf, *args_r, **kw), np.float32)
    out_q = np.asarray(model_q.apply(pq, *args_r, **kw), np.float32)
    rel = np.linalg.norm(out_q - out_f) / (np.linalg.norm(out_f) + 1e-9)
    assert rel < tol, rel
    c = np.corrcoef(out_q.ravel(), out_f.ravel())[0, 1]
    assert c > 0.9, c


@pytest.mark.slow
def test_int4_accuracy_at_deployed_width():
    """int4 relative error at the REAL 20B-preset block width (3072
    hidden / 24 heads, one double block) — VERDICT r4 #4a.  The tiny-
    scale bound (45% at width 64) overstates int4 error: per-channel
    absmax quantization noise averages down with in_dim, so at the
    deployed width the forward must stay within 10%."""
    import dataclasses as dc

    from genpc_tpu.models.dit import DiTConfig, MMDiT

    def build(bits):
        cfg = dc.replace(DiTConfig.preset("qwen"), double_blocks=1,
                         single_blocks=0, quant_bits=bits)
        return MMDiT(cfg), cfg

    model_f, cfg = build(0)
    model_q, _ = build(4)
    rng = np.random.default_rng(7)
    lat = jnp.asarray(rng.normal(size=(1, 8, 8, cfg.in_channels)),
                      jnp.float32)
    cond = jnp.asarray(rng.normal(size=(1, 8, 8, cfg.cond_channels)),
                       jnp.float32)
    txt = jnp.asarray(rng.normal(size=(1, 7, cfg.text_dim)), jnp.float32)
    args = (lat, jnp.full((1,), 0.5), txt)
    kw = dict(cond_latents=cond, guidance=jnp.ones((1,)))
    pf = model_f.init(jax.random.PRNGKey(0), *args, **kw)
    pq = {"params": quantize_tree(flax_meta.unbox(pf)["params"], 4,
                                  dit_block_select)}
    out_f = np.asarray(model_f.apply(pf, *args, **kw), np.float32)
    out_q = np.asarray(model_q.apply(pq, *args, **kw), np.float32)
    rel = np.linalg.norm(out_q - out_f) / (np.linalg.norm(out_f) + 1e-9)
    assert rel < 0.10, rel


def test_quantized_tree_is_smaller():
    model_q, args, kw = _tiny_mmdit(8)
    model_f, _, _ = _tiny_mmdit(0)
    pq = model_q.init(jax.random.PRNGKey(0), *args, **kw)
    pf = model_f.init(jax.random.PRNGKey(0), *args, **kw)
    # tiny preset has small non-quantized io/embedders; the block-domain
    # savings still dominate
    assert tree_bytes(pq) < 0.55 * tree_bytes(pf)


@pytest.mark.parametrize("variant", ["flux", "qwen"])
@pytest.mark.slow
def test_dit_depth_tiny_quantized_generates(variant):
    from genpc_tpu.config import load_config
    from genpc_tpu.models.dit_depth import DiTDepthEdit
    cfg = load_config(save=False, model_size="tiny", quant_bits=8)
    be = DiTDepthEdit(cfg, variant=variant)
    assert be.dit_cfg.quant_bits == 8
    depth = np.random.default_rng(0).uniform(size=(64, 64)
                                             ).astype(np.float32)
    img = be.generate(depth, "01184", size=64, num_inference_steps=2)
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()


def test_flux_checkpoint_grafts_into_quantized_structure():
    """The load_dit quantized path: a (synthetic) diffusers checkpoint
    grafts into the FP template and quantize_tree reproduces the exact
    structure the quantized model applies — with outputs tracking the
    FP graft (reference analogue: loading the Nunchaku int4 build)."""
    from genpc_tpu.models import checkpoint_specs as specs
    from genpc_tpu.models.dit import DiTConfig, MMDiT
    from genpc_tpu.models.weights import (convert_flux, graft_weights,
                                          synthetic_checkpoint)
    cfg_f = DiTConfig.preset("tiny")
    cfg_q = dataclasses.replace(cfg_f, quant_bits=8)
    lat0 = jnp.zeros((1, 8, 8, cfg_f.in_channels))
    cond = jnp.zeros((1, 8, 8, cfg_f.cond_channels))
    txt0 = jnp.zeros((1, 16, cfg_f.text_dim))
    pooled = jnp.zeros((1, cfg_f.pooled_dim))
    init_args = (lat0, jnp.ones((1,)) * 0.5, txt0, pooled, cond,
                 jnp.ones((1,)))
    converted = convert_flux(synthetic_checkpoint(
        specs.spec_flux_transformer(cfg_f)))

    model_q = MMDiT(cfg_q)
    pq = model_q.init(jax.random.PRNGKey(0), *init_args)
    fp = graft_weights(fp_template_like(pq), converted, {}, "flux-qtest",
                       strict=True)
    pq2 = quantize_tree(fp, 8, dit_block_select)

    model_f = MMDiT(cfg_f)
    pf = graft_weights(model_f.init(jax.random.PRNGKey(0), *init_args),
                       converted, {}, "flux-ftest", strict=True)

    rng = np.random.default_rng(8)
    lat = jnp.asarray(rng.normal(size=lat0.shape), jnp.float32)
    txt = jnp.asarray(rng.normal(size=txt0.shape), jnp.float32)
    run_args = (lat, jnp.ones((1,)) * 0.5, txt, pooled, cond,
                jnp.ones((1,)))
    out_q = np.asarray(model_q.apply(pq2, *run_args), np.float32)
    out_f = np.asarray(model_f.apply(pf, *run_args), np.float32)
    rel = np.linalg.norm(out_q - out_f) / (np.linalg.norm(out_f) + 1e-9)
    assert rel < 0.05, rel


def test_t5_loader_quantized_path_from_safetensors(tmp_path):
    """The real file-level loader (weights.load_t5_and_clip_l) with
    quant_bits>0: a synthetic T5 safetensors checkpoint on disk grafts
    into the fp template, quantizes, and the quantized encoder's output
    tracks the fp graft — the exact load path the full FLUX preset uses
    (reference loads its T5 int4 the same way: tools/flux_depth.py:21-27)."""
    from safetensors.numpy import save_file
    from genpc_tpu.models import checkpoint_specs as specs
    from genpc_tpu.models.quant import t5_block_select
    from genpc_tpu.models.t5 import T5Config, T5Encoder
    from genpc_tpu.models.weights import (load_t5_and_clip_l,
                                          synthetic_checkpoint)

    cfg_f = T5Config.preset("tiny")
    cfg_q = dataclasses.replace(cfg_f, quant_bits=8)
    sd = synthetic_checkpoint(specs.spec_t5_encoder(cfg_f))
    d = tmp_path / "text_encoder_2"
    d.mkdir()
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()},
              str(d / "model.safetensors"))

    ids = jnp.asarray(np.random.default_rng(9).integers(
        0, cfg_f.vocab_size, size=(2, 16)), jnp.int32)
    pf = T5Encoder(cfg_f).init(jax.random.PRNGKey(0), ids)
    pq = T5Encoder(cfg_q).init(jax.random.PRNGKey(0), ids)
    pf, _ = load_t5_and_clip_l(str(tmp_path), pf, None, quant_bits=0)
    pq, _ = load_t5_and_clip_l(str(tmp_path), pq, None, quant_bits=8)

    # every selected block kernel is stored int8 after the load
    n_int = sum(1 for p, l in jax.tree_util.tree_flatten_with_path(
        flax_meta.unbox(pq))[0]
        if jnp.issubdtype(l.dtype, jnp.integer) and l.ndim == 2)
    assert n_int >= 7 * cfg_f.num_layers, n_int

    out_f = np.asarray(T5Encoder(cfg_f).apply(pf, ids), np.float32)
    out_q = np.asarray(T5Encoder(cfg_q).apply(pq, ids), np.float32)
    rel = np.linalg.norm(out_q - out_f) / (np.linalg.norm(out_f) + 1e-9)
    assert rel < 0.05, rel
    assert t5_block_select(("block_0", "attn"))  # domain sanity


def test_t5_quantized_close_to_fp():
    """T5 tower: quantize_tree over the block domain drops into the
    quant model and tracks the FP forward (reference runs this tower
    int4: tools/flux_depth.py:21-27)."""
    from genpc_tpu.models.quant import t5_block_select
    from genpc_tpu.models.t5 import T5Config, T5Encoder
    cfg_f = T5Config.preset("tiny")
    cfg_q = dataclasses.replace(cfg_f, quant_bits=8)
    ids = jnp.asarray(np.random.default_rng(5).integers(
        0, cfg_f.vocab_size, size=(2, 16)), jnp.int32)
    pf = T5Encoder(cfg_f).init(jax.random.PRNGKey(0), ids)
    pq = {"params": quantize_tree(pf["params"], 8, t5_block_select)}
    out_f = np.asarray(T5Encoder(cfg_f).apply(pf, ids), np.float32)
    out_q = np.asarray(T5Encoder(cfg_q).apply(pq, ids), np.float32)
    rel = np.linalg.norm(out_q - out_f) / (np.linalg.norm(out_f) + 1e-9)
    assert rel < 0.05, rel


def test_qwen_vl_quantized_close_to_fp():
    from genpc_tpu.models.quant import vl_block_select
    from genpc_tpu.models.qwen_vl import QwenVLConfig, QwenVLTextModel
    cfg_f = QwenVLConfig.preset("tiny")
    cfg_q = dataclasses.replace(cfg_f, quant_bits=8)
    rng = np.random.default_rng(6)
    ids = jnp.asarray(rng.integers(0, cfg_f.vocab_size, size=(1, 12)),
                      jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(12)[None, None], (3, 1, 12))
    pf = QwenVLTextModel(cfg_f).init(jax.random.PRNGKey(0), ids, pos)
    pq = {"params": quantize_tree(pf["params"], 8, vl_block_select)}
    out_f = np.asarray(QwenVLTextModel(cfg_f).apply(pf, ids, pos),
                       np.float32)
    out_q = np.asarray(QwenVLTextModel(cfg_q).apply(pq, ids, pos),
                       np.float32)
    rel = np.linalg.norm(out_q - out_f) / (np.linalg.norm(out_f) + 1e-9)
    assert rel < 0.05, rel


def test_dit_chunked_sampler_matches_unchunked():
    """The host-chunked denoise path (tunnel-watchdog-safe, traced
    lo/hi bounds) must reproduce the single-program sampler."""
    from genpc_tpu.config import load_config
    from genpc_tpu.models.dit_depth import DiTDepthEdit
    depth = np.random.default_rng(7).uniform(size=(64, 64)
                                             ).astype(np.float32)
    imgs = []
    for chunk in (0, 2):
        cfg = load_config(save=False, model_size="tiny",
                          denoise_chunk=chunk)
        be = DiTDepthEdit(cfg, variant="flux", seed=0)
        imgs.append(be.generate(depth, "01184", size=64,
                                num_inference_steps=5))
    np.testing.assert_allclose(imgs[0], imgs[1], rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_vl_encoder_offload_matches_resident():
    """Host-offloaded VL params (the sequential-CPU-offload analog,
    reference tools/qwen_depth.py:60-62) must reproduce the resident
    path bit-for-bit, including re-materialization after release()."""
    from genpc_tpu.models.qwen_vl import QwenVLEncoder
    img = np.random.default_rng(3).uniform(size=(16, 16, 3)
                                           ).astype(np.float32)
    res = QwenVLEncoder("tiny", offload=False)
    off = QwenVLEncoder("tiny", offload=True)
    a = np.asarray(res.encode("a red chair", img))
    b = np.asarray(off.encode("a red chair", img))
    np.testing.assert_array_equal(a, b)
    assert off._dev is not None
    off.release()
    assert off._dev is None
    b2 = np.asarray(off.encode("a red chair", img))  # re-materializes
    np.testing.assert_array_equal(a, b2)
    off.release()
    # text-only branch re-materializes too
    np.testing.assert_array_equal(np.asarray(res.encode("hello")),
                                  np.asarray(off.encode("hello")))


@pytest.mark.slow
def test_dit_offload_matches_resident():
    """The DiT-param offload window (host-resident between calls,
    materialized for denoise; the full-size Qwen single-chip policy)
    must reproduce the resident path exactly, across repeated calls."""
    from genpc_tpu.config import load_config
    from genpc_tpu.models.dit_depth import DiTDepthEdit
    depth = np.random.default_rng(9).uniform(size=(64, 64)
                                             ).astype(np.float32)
    imgs = []
    for off in (False, True):
        cfg = load_config(save=False, model_size="tiny",
                          dit_offload=off, denoise_chunk=2)
        be = DiTDepthEdit(cfg, variant="qwen", seed=0)
        a = be.generate(depth, "01184", size=64, num_inference_steps=3)
        assert (be._params is None) == off
        assert (be._params_host is not None) == off
        b = be.generate(depth, "01184", size=64, num_inference_steps=3)
        imgs.append((a, b))
    np.testing.assert_allclose(imgs[0][0], imgs[1][0], rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(imgs[0][1], imgs[1][1], rtol=1e-5,
                               atol=1e-5)


def test_full_presets_default_to_quantized():
    """The full-size single-chip defaults: int4 for both backends (the
    reference's Nunchaku int4 single-GPU deployment,
    tools/flux_depth.py:12-30, tools/qwen_depth.py:50-62); quant_bits=0
    opts back into bf16 for multi-chip tp, 8 for bigger-HBM parts."""
    from genpc_tpu.models.dit_depth import _default_quant_bits
    assert _default_quant_bits("flux", True, None) == 4
    assert _default_quant_bits("qwen", True, None) == 4
    assert _default_quant_bits("flux", True, 0) == 0   # bf16 tp opt-out
    assert _default_quant_bits("qwen", True, 8) == 8
    assert _default_quant_bits("flux", False, None) == 0
    assert _default_quant_bits("qwen", False, 4) == 4  # tiny-scale tests
