"""Full-scale neural-preset bench (VERDICT r2 #1) — one JSON line.

Executes the ACTUAL full-size architectures on the chip with random
bf16 weights (the container is zero-egress; compute cost is identical
to pretrained weights):

* **SDXL ControlNet preset** (config-3 shape: Depth Prompting's
  generation stage): 2.6B UNet + 1.25B ControlNet trunk + SDXL VAE +
  both CLIP towers, the reference's 30 steps at 1024²
  (reference: tools/controlnet_depth.py:55-111).  Records compile time,
  per-denoise-step ms (steady-state, host-chunked), and end-to-end
  s/object for the generation stage.
* **InstantMesh preset** (config-4 shape's image->3D stage):
  zero123plus SD2-class UNet at the 960x640 grid with reference
  attention + CFG, 75 steps, + full LRM (DINO ViT-B + 16-layer triplane
  transformer + FlexiCubes-decoder grid query)
  (reference: tools/instantmesh.py:115-182).
* **FLUX/Qwen feasibility**: parameter-count × dtype vs the 16 GB v5e
  HBM — these two CANNOT fit one chip; reported with the sharding they
  need (see extra.memory notes).

Run in a subprocess by bench.py; safe to run standalone.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _bf16_like(shapes_tree):
    """Materialize a parameter tree on device in bf16: norm scales = 1,
    everything else = 0 (values are irrelevant for timing; zeros keep
    the materializing program trivially cheap)."""
    import jax
    import jax.numpy as jnp

    def mk(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        shape = leaf.shape
        if jnp.issubdtype(leaf.dtype, jnp.integer):
            # quantized kernels: keep the int8/int4 storage dtype so the
            # HBM footprint being benchmarked is the deployed one
            return jnp.zeros(shape, leaf.dtype)
        if name.endswith("scale") or "norm" in name.lower().split("/")[-1]:
            return jnp.ones(shape, jnp.bfloat16)
        return jnp.zeros(shape, jnp.bfloat16)

    return jax.jit(lambda: jax.tree_util.tree_map_with_path(
        mk, shapes_tree))()


def _log(msg):
    print(f"[bench_neural] {msg}", file=sys.stderr, flush=True)


# v5e peaks (jax-ml.github.io/scaling-book numbers); overridable when the
# bench runs on a different part
import os  # noqa: E402

PEAK_BF16_TFLOPS = float(os.environ.get("GENPC_PEAK_TFLOPS", "197"))
HBM_GBPS = float(os.environ.get("GENPC_HBM_GBPS", "819"))


def _lowered_flops(fn, *args, **kw):
    """Exact HLO FLOPs of fn at the given operands (ShapeDtypeStructs are
    fine) via client-side cost analysis of the lowering — no device
    compile, no materialized params.

    The axon TPU plugin's lowering reports no positive 'flops' (observed:
    the sdxl section's MFU silently landed null on-chip while the same
    lowering on CPU counts fine), so when the default-backend analysis
    comes back empty, re-lower for the CPU target — FLOPs of the
    unoptimized HLO are platform-independent arithmetic counts."""
    import jax

    def _count(backend):
        jfn = jax.jit(fn, backend=backend) if backend else jax.jit(fn)
        ca = jfn.lower(*args, **kw).cost_analysis()
        fl = (ca or {}).get("flops")
        return float(fl) if fl and fl > 0 else None

    try:
        out = _count(None)
        if out is None:
            out = _count("cpu")
            if out is None:
                _log("flops cost analysis empty on default AND cpu "
                     "lowerings")
        return out
    except Exception as e:  # noqa: BLE001
        _log(f"flops lowering failed: {type(e).__name__}: {e}")
        return None


def _mfu_fields(flops, wall_ms, param_hbm_bytes=None):
    """MFU/roofline accounting (VERDICT r4 #3): relate a measured wall to
    what the chip can do.  flops = FLOPs of the measured unit; wall_ms =
    its measured wall; param_hbm_bytes adds the weight-bytes roofline
    (a weight-streaming lower bound: every param byte must cross HBM
    once per eval)."""
    if not flops or not wall_ms:
        return None
    tflops = flops / (wall_ms / 1e3) / 1e12
    out = {
        "flops": int(flops),
        "achieved_tflops": round(tflops, 1),
        "pct_of_peak_bf16": round(100.0 * tflops / PEAK_BF16_TFLOPS, 1),
        "peak_bf16_tflops_assumed": PEAK_BF16_TFLOPS,
    }
    if param_hbm_bytes:
        roof_ms = param_hbm_bytes / (HBM_GBPS * 1e9) * 1e3
        out["weight_roofline_ms"] = round(roof_ms, 1)
        out["pct_of_weight_roofline"] = round(100.0 * roof_ms / wall_ms, 1)
        out["hbm_gbps_assumed"] = HBM_GBPS
    return out


def _dit_flops_per_eval(cfgm, hw: int, txt_len: int = 512) -> float | None:
    """One transformer evaluation of an MMDiT config at [1, hw, hw]
    latents — the unit 'per_transformer_eval_ms' measures (CFG = 2
    evals/step).  Takes the DiTConfig, NOT a backend: constructing a
    full DiTDepthEdit just for accounting would materialize the 8.3B
    VL tower.

    Tracing the full 60-block 20B model just to count FLOPs takes many
    minutes of host CPU; HLO cost analysis is additive per op, so lower
    tiny variants with (0,0), (1,0) and (0,1) blocks and scale the
    per-block deltas by the real block counts."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from genpc_tpu.models.dit import MMDiT
    sd = jax.ShapeDtypeStruct
    lat = sd((1, hw, hw, cfgm.in_channels), jnp.float32)
    cond = sd((1, hw, hw, cfgm.cond_channels), jnp.float32)
    txt = sd((1, txt_len, cfgm.text_dim), jnp.float32)
    mask = sd((1, txt_len), jnp.bool_)
    t = sd((1,), jnp.float32)
    g = sd((1,), jnp.float32)
    kw = {}
    if cfgm.pooled_dim:
        kw["pooled"] = sd((1, cfgm.pooled_dim), jnp.float32)

    def flops_at(nd: int, ns: int) -> float | None:
        c = dataclasses.replace(cfgm, double_blocks=nd, single_blocks=ns)
        model = MMDiT(c)
        # structs must ride as eval_shape ARGS (closure-captured structs
        # reach jnp ops as raw ShapeDtypeStruct and TypeError)
        shapes = jax.eval_shape(
            lambda l, tt, tx, cc, gg, mm, **kw2: model.init(
                jax.random.PRNGKey(0), l, tt, tx, cond_latents=cc,
                guidance=gg, txt_mask=mm, **kw2),
            lat, t, txt, cond, g, mask, **kw)

        def f(p, lat, t, txt, mask, cond, g, pooled=None):
            return model.apply(p, lat, t, txt, pooled=pooled,
                               cond_latents=cond, guidance=g,
                               txt_mask=mask)

        return _lowered_flops(f, shapes, lat, t, txt, mask, cond, g, **kw)

    f00 = flops_at(0, 0)
    f10 = flops_at(1, 0) if cfgm.double_blocks else f00
    f01 = flops_at(0, 1) if cfgm.single_blocks else f00
    if f00 is None or f10 is None or f01 is None:
        return None
    return (f00 + cfgm.double_blocks * (f10 - f00)
            + cfgm.single_blocks * (f01 - f00))


def bench_sdxl(size: int = 1024, steps: int = 30, chunk: int = 5) -> dict:
    import jax
    from genpc_tpu.config import load_config
    from genpc_tpu.models.controlnet_depth import ControlNetDepth

    import jax.numpy as jnp
    _log("sdxl: constructing backend (full CLIP towers init)")
    cfg = load_config(model_size="full", denoise_chunk=chunk, save=False)
    be = ControlNetDepth(cfg)
    # bf16 towers: 3.3 GB fp32 -> 1.65 GB (everything must share 16 GB)
    cast = lambda t: jax.tree.map(lambda x: x.astype(jnp.bfloat16), t)
    be.prompt_encoder.params_l = cast(be.prompt_encoder.params_l)
    be.prompt_encoder.params_g = cast(be.prompt_encoder.params_g)
    hw = size // be.factor
    t0 = time.time()
    shapes = jax.eval_shape(lambda: be._init_params(hw))
    be._params = _bf16_like(shapes)
    be._latent_hw = hw
    init_s = time.time() - t0
    n_params = sum(int(np.prod(l.shape)) for l in
                   jax.tree_util.tree_leaves(shapes))
    _log(f"sdxl: {n_params/1e9:.2f}B params materialized bf16 in "
         f"{init_s:.0f}s; first generate (compiles)...")
    depth = np.random.default_rng(0).uniform(size=(size, size)
                                             ).astype(np.float32)

    t0 = time.time()
    img = be.generate(depth, "01184", size=size,
                      num_inference_steps=steps)
    compile_and_first_s = time.time() - t0
    _log(f"sdxl: first call {compile_and_first_s:.0f}s; timing warm...")
    # best-of-2 warm e2e: per-step is reported AMORTIZED over the full
    # generate (incl. prompt encode + VAE decode), exactly like the
    # instantmesh section.  A separate hand-built chunk probe was removed:
    # its operand shapes differed from generate's cached executables, so
    # every probe call RECOMPILED and reported compile time as step time
    # (22 s/step vs the 214 ms/step the warm e2e actually runs at).
    e2e_samples = []
    for _ in range(2):
        t0 = time.time()
        img = be.generate(depth, "01184", size=size,
                          num_inference_steps=steps)
        e2e_samples.append(time.time() - t0)
    e2e_s = min(e2e_samples)
    assert img.shape == (size, size, 3)

    # MFU (VERDICT r4 #3): FLOPs of ONE denoise step = controlnet +
    # conditional unet + unconditional unet (the reference's CFG loop,
    # tools/controlnet_depth.py:55-111), from client-side cost analysis
    def one_step(p, x, t, ctx, ctxn, cimg, added):
        mid_c, down_c = be.controlnet.apply(
            p["controlnet"], x, t, ctx, cimg, added_cond=added,
            conditioning_scale=1.0)
        eps_c = be.unet.apply(p["unet"], x, t, ctx, added_cond=added,
                              control_residuals=(mid_c, down_c))
        eps_u = be.unet.apply(p["unet"], x, t, ctxn, added_cond=added)
        return eps_c + eps_u

    import jax.numpy as jnp2
    sd = jax.ShapeDtypeStruct
    ucfg = be.unet_cfg
    try:
        step_flops = _lowered_flops(
            one_step, shapes,
            sd((1, hw, hw, ucfg.in_channels), jnp2.float32),
            sd((1,), jnp2.float32),
            sd((1, 77, ucfg.context_dim), jnp2.float32),
            sd((1, 77, ucfg.context_dim), jnp2.float32),
            sd((1, size, size, 3), jnp2.float32),
            sd((1, ucfg.addition_embed_dim), jnp2.float32)
            if ucfg.addition_embed_dim else None)
    except Exception as e:  # noqa: BLE001 — never lose the measurements
        _log(f"sdxl flops accounting failed: {type(e).__name__}: {e}")
        step_flops = None
    step_ms = e2e_s * 1000.0 / steps
    return {
        "preset": "sdxl_controlnet_full", "params": n_params,
        "resolution": size, "steps": steps,
        "param_init_s": round(init_s, 1),
        "first_call_s_incl_compile": round(compile_and_first_s, 1),
        "per_denoise_step_ms_amortized": round(step_ms, 1),
        "e2e_s_per_object_generation": round(e2e_s, 2),
        "config3_obj_per_min_generation_stage": round(60.0 / e2e_s, 2),
        "mfu_per_denoise_step": _mfu_fields(
            step_flops, step_ms, param_hbm_bytes=n_params * 2),
    }


def bench_instantmesh(steps: int = 75) -> dict:
    import jax
    import jax.numpy as jnp
    from genpc_tpu.config import load_config
    from genpc_tpu.models.lrm import InstantMeshBackend

    _log("instantmesh: constructing backend")
    cfg = load_config(model_size="full", save=False)
    be = InstantMeshBackend(cfg)
    t0 = time.time()
    shapes = jax.eval_shape(lambda: be._init_params())
    params = _bf16_like(shapes)
    params["ramping"] = jnp.linspace(0.0, 1.0, be.txt_cfg.max_len)
    be._params = params
    init_s = time.time() - t0
    n_params = sum(int(np.prod(l.shape)) for l in
                   jax.tree_util.tree_leaves(shapes))
    be.mv_steps = steps
    img = np.random.default_rng(0).uniform(
        size=(be.lrm_cfg.view_size, be.lrm_cfg.view_size, 4)
    ).astype(np.float32)

    _log("instantmesh: first call (compiles)...")
    t0 = time.time()
    mesh = be("01184", img)
    first_s = time.time() - t0
    _log(f"instantmesh: first call {first_s:.0f}s; timing warm...")
    t0 = time.time()
    mesh = be("01184", img)
    e2e_s = time.time() - t0
    out = {
        "preset": "instantmesh_full_zero123plus", "params": n_params,
        "mv_steps": steps, "param_init_s": round(init_s, 1),
        "first_call_s_incl_compile": round(first_s, 1),
        "e2e_s_per_object_image_to_3d": round(e2e_s, 2),
        "mesh_vertices": int(len(mesh.vertices)),
        "per_mv_step_ms_amortized": round(e2e_s / steps * 1000.0, 1),
    }
    # Object-batched generation (VERDICT r2 #3): B=2 through
    # generate_meshes_batch vs 2 serial calls, matched steps.  The
    # efficiency claim is wall(B=2) << 2 x wall(B=1); exception-guarded
    # so an HBM limit at full scale degrades to a note, not a lost
    # bench.
    try:
        img2 = np.random.default_rng(1).uniform(
            size=img.shape).astype(np.float32)
        _log("instantmesh: batched B=2 (compiles)...")
        t0 = time.time()
        be.generate_meshes_batch(["a", "b"], [img, img2])
        b2_first = time.time() - t0
        t0 = time.time()
        be.generate_meshes_batch(["a", "b"], [img, img2])
        b2_s = time.time() - t0
        out["batched_b2"] = {
            "first_call_s_incl_compile": round(b2_first, 1),
            "e2e_s_for_2_objects": round(b2_s, 2),
            "serial_s_for_2_objects": round(2 * e2e_s, 2),
            "batch_speedup_vs_serial": round(2 * e2e_s / b2_s, 2),
        }
    except Exception as e:  # noqa: BLE001
        out["batched_b2"] = {"note": f"failed: {type(e).__name__}: {e}"}
    return out


def bench_dit_quant(variant: str = "flux", size: int = 1024,
                    steps: int | None = None) -> dict:
    """The 12B/20B presets on ONE chip via weight-only quantization —
    the reference's defining single-GPU deployment trick (Nunchaku int4,
    tools/flux_depth.py:12-30, tools/qwen_depth.py:50-62).

    FLUX.1-Depth-dev: int4 transformer (~6 GB) + int4 T5-XXL (~2.4 GB);
    Qwen-Image-Edit: int4 transformer (~10 GB) + int4 Qwen2.5-VL
    (~4.2 GB) — the single-chip int4 deployment analog of the
    reference's Nunchaku builds (Nunchaku is SVDQuant: low-rank outlier
    branch + int4 activations; this repo uses per-output-channel absmax
    weight-only int4 with bf16 activations — see docs/quantization.md
    for the quality A/B).  int8 FLUX compiles but RESOURCE_EXHAUSTs at
    runtime next to the T5 on 16 GB.  Runs the FULL reference step
    budget (flux 30 / qwen 8) host-chunked, records HBM param bytes and
    per-denoise-step ms.
    """
    import jax
    from genpc_tpu.config import load_config
    from genpc_tpu.models.dit_depth import DiTDepthEdit
    from genpc_tpu.models.quant import tree_bytes

    _log(f"{variant}-quant: constructing backend (towers init int4)")
    cfg = load_config(model_size="full", save=False, denoise_chunk=2)
    be = DiTDepthEdit(cfg, variant=variant)
    hw = size // be.factor
    t0 = time.time()
    shapes = jax.eval_shape(lambda: be._init_params(hw))
    be.set_params(_bf16_like(shapes), hw)
    init_s = time.time() - t0
    # nibble-packed int4 kernels ('kernel_p4') hold TWO logical params
    # per stored element — count the logical model size
    n_params = sum(
        int(np.prod(l.shape)) * (2 if "kernel_p4" in
                                 jax.tree_util.keystr(p) else 1)
        for p, l in jax.tree_util.tree_flatten_with_path(shapes)[0])
    pbytes = tree_bytes(shapes)
    _log(f"{variant}-quant: {n_params/1e9:.2f}B params in "
         f"{pbytes/1e9:.2f} GB HBM (int{be.dit_cfg.quant_bits} blocks), "
         f"init {init_s:.0f}s; first generate (compiles)...")
    depth = np.random.default_rng(0).uniform(size=(size, size)
                                             ).astype(np.float32)
    steps = steps or be.steps      # reference budgets: flux 30, qwen 8
    t0 = time.time()
    img = be.generate(depth, "01184", size=size,
                      num_inference_steps=steps)
    first_s = time.time() - t0
    _log(f"{variant}-quant: first call {first_s:.0f}s; timing warm...")
    t0 = time.time()
    img = be.generate(depth, "01184", size=size,
                      num_inference_steps=steps)
    e2e_s = time.time() - t0
    assert img.shape == (size, size, 3)
    # qwen runs true CFG: 2 transformer evaluations per step
    evals = steps * (2 if variant == "qwen" else 1)
    eval_ms = e2e_s * 1000.0 / evals
    # MFU / roofline (VERDICT r4 #3): FLOPs from client-side HLO cost
    # analysis at the exact eval shapes; eval_ms is amortized over the
    # full generate (incl. VAE + prompt encode + offload windows), so
    # the MFU is a lower bound on the transformer's own utilization.
    # Guarded: an accounting failure must never lose the measurements
    # (a qwen_q run died to exactly that).
    try:
        mfu = _mfu_fields(_dit_flops_per_eval(be.dit_cfg, hw), eval_ms,
                          param_hbm_bytes=int(pbytes))
    except Exception as e:  # noqa: BLE001
        mfu = {"note": f"flops accounting failed: {type(e).__name__}: {e}"}
    return {
        "preset": f"{variant}_full_quantized_single_chip",
        "quant_bits_dit": be.dit_cfg.quant_bits,
        "params": n_params, "param_hbm_bytes": int(pbytes),
        "resolution": size, "steps": steps,
        "param_init_s": round(init_s, 1),
        "first_call_s_incl_compile": round(first_s, 1),
        "e2e_s_per_object_generation": round(e2e_s, 2),
        "per_denoise_step_ms_amortized": round(e2e_s * 1000.0 / steps, 1),
        "per_transformer_eval_ms": round(eval_ms, 1),
        "mfu_per_transformer_eval": mfu,
        "note": "random weights in the DEPLOYED int storage dtypes; "
                "compute cost identical to a quantized checkpoint",
    }


def bench_quant_micro(T: int = 4608, din: int = 3072, dout: int = 12288,
                      iters: int = 32) -> dict:
    """Anti-LICM barrier cost A/B at deployed MMDiT width (VERDICT r4
    #3): one int4 matmul (the 20B preset's MLP shape, 3072 -> 12288, at
    the 1024² joint sequence length) inside a fori_loop, three ways:

    * barrier ON — the shipped QuantDense path: dequant stays in-loop,
      transient (models/quant.py:147);
    * barrier OFF — XLA LICM hoists the dequant out of the loop: the
      steady-state upper bound, at a resident-memory cost that scales
      with model depth (20.2 GB observed for the full 20B preset);
    * bf16 dense — the pure-MXU ceiling for the same matmul.

    Also records the analytic rooflines: MXU time at peak bf16 and the
    int4 weight-bytes HBM time.
    """
    import jax
    import jax.numpy as jnp
    from genpc_tpu.models.quant import pack_int4, unpack_int4

    rng = np.random.default_rng(0)
    packed = jnp.asarray(pack_int4(jnp.asarray(
        rng.integers(-7, 8, (din, dout)), jnp.int32)))
    scale = jnp.full((dout,), 1e-2, jnp.float32)
    kb = jnp.asarray(rng.standard_normal((din, dout)), jnp.bfloat16)
    xs = [jnp.asarray(rng.standard_normal((T, din)), jnp.bfloat16)
          for _ in range(3)]

    def mm_q(barrier):
        def f(w, x):
            if barrier:
                w, x = jax.lax.optimization_barrier((w, x))
            k = unpack_int4(w).astype(jnp.bfloat16)
            y = jax.lax.dot_general(x, k, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return (y * scale).astype(jnp.bfloat16)
        return f

    def mm_b(w, x):
        y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return y.astype(jnp.bfloat16)

    def timed_loop(fn, w):
        @jax.jit
        def run(x):
            def body(i, x):
                y = fn(w, x)
                return y[:, :din] + x      # feed back so iterations chain
            # reduce to a SCALAR on-device: fetching a [T, din] result
            # through the tunnel costs ~0.5-1 s and would swamp the
            # per-iteration time (the tunnel fetch is an environment
            # artifact, not part of the kernel cost)
            return jnp.sum(jax.lax.fori_loop(0, iters, body, x))
        np.asarray(run(xs[0]))             # compile + first
        ts = []
        for x in xs[1:]:
            t0 = time.time()
            np.asarray(run(x))
            ts.append(time.time() - t0)
        return min(ts) / iters * 1000.0    # ms per iteration

    ms_on = timed_loop(mm_q(True), packed)
    ms_off = timed_loop(mm_q(False), packed)
    ms_bf16 = timed_loop(mm_b, kb)
    flops = 2.0 * T * din * dout
    return {
        "preset": "quant_dense_micro_anti_licm_ab",
        "shape": f"[{T},{din}]x[{din},{dout}] int4, {iters}-step loop",
        "per_iter_ms": {
            "int4_barrier_on_shipped": round(ms_on, 2),
            "int4_barrier_off_licm_hoisted": round(ms_off, 2),
            "bf16_dense": round(ms_bf16, 2),
        },
        "barrier_overhead_pct": round(100.0 * (ms_on - ms_off) / ms_off, 1)
        if ms_off else None,
        "mfu_barrier_on": _mfu_fields(flops, ms_on,
                                      param_hbm_bytes=din * dout // 2),
        "mxu_roofline_ms": round(flops / (PEAK_BF16_TFLOPS * 1e12) * 1e3,
                                 2),
        "int4_weight_hbm_ms": round(din * dout / 2 / (HBM_GBPS * 1e9)
                                    * 1e3, 3),
        "calibration_note": "bf16_dense is the same loop with a plain "
                            "bf16 matmul — the chip's ACHIEVABLE matmul "
                            "rate through this harness (the honest MFU "
                            "denominator); outputs reduce to a scalar "
                            "on-device so the ~0.5-1 s tunnel fetch of a "
                            "[T,din] array cannot pollute per-iter time",
    }


def bench_quant_cd_ab(n_objects: int = 13, size: int = 256,
                      steps: int | None = None) -> dict:
    """End-to-end int4-vs-bf16 CD with the SAME DiT weights (VERDICT r4
    #4b): run the 13-object pipeline twice — once with a mid-size
    ('base', 768-wide/12-head) bf16 MMDiT, once with the SAME weights
    int4-quantized (quantize_tree) — identical seeds everywhere, so any
    CD delta is attributable to weight quantization alone.  The
    reference ships int4 end-to-end as its default
    (tools/qwen_depth.py:50-62); this measures what that costs here.
    """
    import os
    from genpc_tpu.categories import REDWOOD_FLAGS
    from genpc_tpu.config import load_config
    from genpc_tpu.models.dit_depth import DiTDepthEdit
    from genpc_tpu.models.quant import dit_block_select, quantize_tree
    from genpc_tpu.parallel.batched_runner import run_batched
    from genpc_tpu.pipeline.depth_prompting import DepthPrompting

    data_dir = os.environ.get("GENPC_DATA", "/root/reference/data")
    flags = [f for f in REDWOOD_FLAGS
             if os.path.exists(os.path.join(data_dir, f"{f}.ply"))
             ][:n_objects]
    results, fp_params = {}, None
    for arm, qb in (("bf16", 0), ("int8", 8), ("int4", 4)):
        cfg = load_config(
            save=False, output_path="/tmp/genpc_quantab_ws",
            control_model="flux", generative_model="synthetic",
            rembg_model="synthetic", model_size="base",
            quant_bits=qb, tower_quant_bits=0, generate_res=size,
            trust_aligned_completion=False)
        be = DiTDepthEdit(cfg, variant="flux", seed=0)
        if steps:
            be.steps = steps
        hw = size // be.factor
        if fp_params is None:
            fp_params = be._init_params(hw)
            be.set_params(fp_params, hw)
        else:
            qp = dict(fp_params)
            qp["dit"] = {"params": quantize_tree(
                fp_params["dit"]["params"], qb, dit_block_select)}
            be.set_params(qp, hw)
        _log(f"quant_cd_ab[{arm}]: {len(flags)} objects at base/{size}²")
        dp = DepthPrompting(cfg, depth2image=be)
        res = run_batched(cfg, flags, data_dir, verbose=False, dp=dp)
        results[arm] = {f: round(m["cd"] * 100, 3) for f, m in res.items()}
    out = {
        "preset": "quant_cd_ab_base_flux_same_weights",
        "objects": len(flags), "resolution": size,
        "note": "same fp weights all arms (int8/int4 = quantize_tree of "
                "the bf16 tree), identical seeds; synthetic image->3D "
                "so the delta isolates the DiT quantization (ADVICE r4 "
                "#2's int4-vs-int8 quality question included)",
    }
    for arm, cds in results.items():
        out[f"cd_x100_{arm}"] = cds
    for arm in ("int8", "int4"):
        deltas = {f: round(results[arm][f] - results["bf16"][f], 3)
                  for f in results["bf16"]}
        out[f"cd_x100_delta_{arm}_minus_bf16"] = deltas
        out[f"mean_abs_delta_cd_x100_{arm}"] = round(
            float(np.mean(np.abs(list(deltas.values())))), 3)
    return out


def bench_config4(n_objects: int = 4, control: str = "controlnet") -> dict:
    """Config-4 measured as ONE pipeline, not a serial-sum estimate.

    Runs run_batched with the full-size neural presets end-to-end over
    n_objects redwood objects: stage1 -> 1024² depth-conditioned
    generation -> image->3D (zero123plus 75 steps + LRM) -> full
    registration stack -> fusion -> CD/EMD eval, in one process on one
    chip.  control='qwen' is the reference's ACTUAL config-4 backend
    (Qwen-Image-Edit 20B, int4 + host-offload windows); 'controlnet'
    (SDXL) is the faster alternative preset.  The stage boundaries free
    each model's params before the next materializes
    (batched_runner.run_batched), mirroring the reference's free_memory
    between stages (reference: main_lidar.py:12-16, main.py:38-68).
    """
    import os
    from genpc_tpu.categories import REDWOOD_FLAGS
    from genpc_tpu.config import load_config
    from genpc_tpu.parallel.batched_runner import run_batched

    data_dir = os.environ.get("GENPC_DATA", "/root/reference/data")
    flags = [f for f in REDWOOD_FLAGS
             if os.path.exists(os.path.join(data_dir, f"{f}.ply"))
             ][:n_objects]
    cfg = load_config(
        save=False, output_path="/tmp/genpc_config4_ws",
        control_model=control, generative_model="instantmesh",
        rembg_model="synthetic", model_size="full",
        trust_aligned_completion=False,
        generate_res=1024, denoise_chunk=5 if control != "qwen" else 2,
        # B=2 image->3D works standalone (instantmesh.json batched_b2)
        # but its VAE grid decode RESOURCE_EXHAUSTs AFTER the SDXL stage
        # has come and gone (HBM fragmentation); B=1 is the reference's
        # serial workload and costs ~25% of the batching win
        image23d_batch=1,
        # generation runs per-object: next to the resident full-size
        # params (20B int4 = 10.7 GB; SDXL+ControlNet bf16 ~= 8 GB) even
        # B=2 of 1024² denoise activations RESOURCE_EXHAUSTs the 16 GB
        # chip (config4 chip runs, r4 B=4 and r5 B=2) — and B=1 is the
        # reference's actual serial workload (main.py:46-54)
        generate_obj_batch=1)
    _log(f"config4[{control}]: warm-up pass over {len(flags)} objects "
         f"(pays every compile)")
    t0 = time.time()
    run_batched(cfg, flags, data_dir, verbose=False)
    warm_s = time.time() - t0
    _log(f"config4[{control}]: warm-up {warm_s:.0f}s; timed pass...")
    timings = {}
    t0 = time.time()
    results = run_batched(cfg, flags, data_dir, verbose=False,
                          timings=timings)
    wall = time.time() - t0
    cds = [m["cd"] for m in results.values()]
    backends = ("qwen_image_edit_20B_int4(1024²,8step,CFG) "
                if control == "qwen" else "sdxl_controlnet(1024²,30step) "
                ) + "+ instantmesh(75step) + full registration"
    return {
        "preset": f"config4_full_pipeline_measured_{control}",
        "backends": backends,
        "objects": len(flags), "flags": flags,
        "warmup_s_incl_compile": round(warm_s, 1),
        "wall_s": round(wall, 1),
        "obj_per_min_measured": round(len(flags) / wall * 60.0, 3),
        "stage_walls_s": timings,
        "avg_cd_x100_random_weights": round(
            float(np.mean(cds)) * 100, 3) if cds else None,
        "note": "random bf16 weights (zero-egress container) — compute "
                "cost identical to pretrained; CD is meaningless here "
                "and reported only to prove the metric stage ran",
    }


def memory_notes() -> dict:
    """FLUX/Qwen single-chip feasibility from exact parameter counts."""
    from genpc_tpu.models.checkpoint_specs import (
        spec_flux_transformer, spec_qwen_transformer, spec_t5_encoder,
        spec_qwen_vl_text, spec_qwen_vl_vision)
    from genpc_tpu.models.dit import DiTConfig
    from genpc_tpu.models.t5 import T5Config
    from genpc_tpu.models.qwen_vl import QwenVLConfig

    def count(spec):
        return sum(int(np.prod(s)) for s in spec.values())

    flux = count(spec_flux_transformer(DiTConfig.preset("flux")))
    qwen = count(spec_qwen_transformer(DiTConfig.preset("qwen")))
    t5 = count(spec_t5_encoder(T5Config.preset("xxl")))
    vl = count(spec_qwen_vl_text(QwenVLConfig.preset("full"))) + \
        count(spec_qwen_vl_vision(QwenVLConfig.preset("full")))
    hbm = 16e9
    return {
        "hbm_bytes": int(hbm),
        "flux_depth_dev": {
            "params": flux, "bf16_bytes": flux * 2,
            "fits_one_v5e_bf16": flux * 2 < hbm * 0.85,
            "int4_bytes": flux // 2,
            "fits_one_v5e_int4_dit_int4_t5":
                flux // 2 + t5 // 2 < hbm * 0.9,
            "note": "bf16 needs >= 4 v5e chips tensor-parallel ('tp' "
                    "axes annotated on every kernel); the single-chip "
                    "path is weight-only int4 DiT + int4 T5 "
                    "(models/quant.py), the single-chip int4 deployment "
                    "analog of the reference's Nunchaku build — "
                    "executed in the flux_q "
                    "bench section.  int8 DiT (~12 GB) compiles but "
                    "RESOURCE_EXHAUSTs at runtime next to the T5 on "
                    "the 16 GB chip"},
        "qwen_image_edit": {
            "params": qwen, "bf16_bytes": qwen * 2,
            "fits_one_v5e_bf16": qwen * 2 < hbm * 0.85,
            "int4_bytes": qwen // 2,
            "fits_one_v5e_int4_dit_int4_vl":
                qwen // 2 + vl // 2 < hbm * 0.9,
            "note": "bf16 needs >= 4-chip tp; single-chip path is int4 "
                    "DiT + int4 VL tower (qwen_q bench section)"},
        "t5_xxl_params": t5,
        "qwen25_vl_params": vl,
    }


ARTIFACT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_artifacts")


def persist_section(name: str, result: dict) -> None:
    """Write a completed section's JSON to bench_artifacts/<name>.json.

    These per-section artifacts are the durable record of the expensive
    neural measurements (a full qwen_q run costs ~15 min warm, ~45 min
    cold): bench.py embeds them (marked "cached") into its sidecar when
    the wall budget cannot afford a fresh subprocess, so a driver bench
    with ANY budget still carries machine-readable numbers for every
    section that has ever completed (VERDICT r4 missing #2)."""
    if "note" in result and str(result.get("note", "")).startswith(
            ("failed", "skipped")):
        return
    try:
        os.makedirs(ARTIFACT_DIR, exist_ok=True)
        result = dict(result)
        result.setdefault("recorded_at", time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime()))
        with open(os.path.join(ARTIFACT_DIR, f"{name}.json"), "w") as f:
            json.dump(result, f, indent=1)
            f.write("\n")
    except OSError as e:
        _log(f"could not persist section {name}: {e}")


def _run_preset(name: str) -> dict:
    try:
        if name == "sdxl":
            return bench_sdxl()
        if name == "config4":
            return bench_config4()
        if name == "config4_qwen":
            return bench_config4(control="qwen")
        if name == "flux_q":
            return bench_dit_quant("flux")
        if name == "qwen_q":
            return bench_dit_quant("qwen")
        if name == "quant_micro":
            return bench_quant_micro()
        if name == "quant_cd_ab":
            return bench_quant_cd_ab()
        return bench_instantmesh()
    except Exception as e:  # noqa: BLE001
        import traceback
        tb = traceback.format_exc().splitlines()
        # keep the last in-repo frame so an OOM names its pipeline stage
        frames = [l.strip() for l in tb if "/repo/" in l or "genpc" in l]
        return {"note": f"failed: {type(e).__name__}: {e}",
                "last_frames": frames[-4:]}


def main():
    """Each preset runs in its OWN subprocess: a ~4B-param preset's
    buffers must be fully released before the next one initializes
    (observed RESOURCE_EXHAUSTED when both shared a process), and only
    one TPU client may live at a time — so they run sequentially."""
    import subprocess
    out = {}
    for name in ("sdxl", "instantmesh", "flux_q", "qwen_q",
                 "quant_micro"):
        proc = subprocess.run(
            [sys.executable, __file__, name], capture_output=True,
            text=True)
        print(proc.stderr[-2000:], file=sys.stderr, flush=True)
        lines = proc.stdout.strip().splitlines()
        out[name] = (json.loads(lines[-1]) if lines else
                     {"note": f"failed: rc={proc.returncode}"})
    out["memory"] = memory_notes()
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 1:
        res = _run_preset(sys.argv[1])
        persist_section(sys.argv[1], res)
        print(json.dumps(res))
    else:
        main()
