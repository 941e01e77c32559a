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

    return {
        "preset": "sdxl_controlnet_full", "params": n_params,
        "resolution": size, "steps": steps,
        "param_init_s": round(init_s, 1),
        "first_call_s_incl_compile": round(compile_and_first_s, 1),
        "per_denoise_step_ms_amortized": round(e2e_s * 1000.0 / steps, 1),
        "e2e_s_per_object_generation": round(e2e_s, 2),
        "config3_obj_per_min_generation_stage": round(60.0 / e2e_s, 2),
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
    return {
        "preset": f"{variant}_full_quantized_single_chip",
        "quant_bits_dit": be.dit_cfg.quant_bits,
        "params": n_params, "param_hbm_bytes": int(pbytes),
        "resolution": size, "steps": steps,
        "param_init_s": round(init_s, 1),
        "first_call_s_incl_compile": round(first_s, 1),
        "e2e_s_per_object_generation": round(e2e_s, 2),
        "per_denoise_step_ms_amortized": round(e2e_s * 1000.0 / steps, 1),
        "per_transformer_eval_ms": round(e2e_s * 1000.0 / evals, 1),
        "note": "random weights in the DEPLOYED int storage dtypes; "
                "compute cost identical to a quantized checkpoint",
    }


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
        image23d_batch=2,
        # 20B denoise activations scale with B next to 10.7 GB params:
        # two objects per device program is the 16 GB HBM envelope
        generate_obj_batch=2 if control == "qwen" else 0)
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
                    "(models/quant.py), exactly the reference's "
                    "Nunchaku int4 build — executed in the flux_q "
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
        return bench_instantmesh()
    except Exception as e:  # noqa: BLE001
        return {"note": f"failed: {type(e).__name__}: {e}"}


def main():
    """Each preset runs in its OWN subprocess: a ~4B-param preset's
    buffers must be fully released before the next one initializes
    (observed RESOURCE_EXHAUSTED when both shared a process), and only
    one TPU client may live at a time — so they run sequentially."""
    import subprocess
    out = {}
    for name in ("sdxl", "instantmesh", "flux_q", "qwen_q"):
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
        print(json.dumps(_run_preset(sys.argv[1])))
    else:
        main()
