"""Architecture tests for the generative backends (tiny configs, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from genpc_tpu.models.unet import (ControlNet, UNet2DCondition, UNetConfig)
from genpc_tpu.models.vae import AutoencoderKL, VAEConfig
from genpc_tpu.models.schedulers import DDIM, EulerAncestral, FlowMatchEuler
from genpc_tpu.models.text_encoder import CLIPTextConfig, CLIPTextModel, HashTokenizer


@pytest.fixture(scope="module")
def tiny_unet():
    cfg = UNetConfig.preset("tiny")
    model = UNet2DCondition(cfg)
    rng = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 77, cfg.context_dim))
    params = model.init(rng, lat, jnp.zeros((1,)), ctx)
    return cfg, model, params


def test_unet_shapes(tiny_unet):
    cfg, model, params = tiny_unet
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, cfg.context_dim))
    out = model.apply(params, lat, jnp.ones((1,)) * 500, ctx)
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_timestep_sensitivity(tiny_unet):
    cfg, model, params = tiny_unet
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    ctx = jnp.zeros((1, 77, cfg.context_dim))
    o1 = model.apply(params, lat, jnp.zeros((1,)), ctx)
    o2 = model.apply(params, lat, jnp.full((1,), 999.0), ctx)
    assert float(jnp.abs(o1 - o2).max()) > 1e-5


def test_controlnet_zero_init(tiny_unet):
    cfg, _, _ = tiny_unet
    cn = ControlNet(cfg)
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    ctx = jnp.zeros((1, 77, cfg.context_dim))
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3))
    params = cn.init(jax.random.PRNGKey(0), lat, jnp.zeros((1,)), ctx, cond)
    mid, down = cn.apply(params, lat, jnp.zeros((1,)), ctx, cond)
    # zero-conv gates: fresh ControlNet contributes exactly nothing
    assert float(jnp.abs(mid).max()) == 0.0
    assert all(float(jnp.abs(d).max()) == 0.0 for d in down)
    assert len(down) >= len(cfg.block_out_channels)


def test_vae_roundtrip_shape():
    cfg = VAEConfig.preset("tiny")
    vae = AutoencoderKL(cfg)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    params = vae.init(jax.random.PRNGKey(1), img)
    z = vae.apply(params, img, method=AutoencoderKL.encode)
    assert z.shape == (1, 4, 4, 4)   # tiny preset keeps the real /8 factor
    out = vae.apply(params, z, method=AutoencoderKL.decode)
    assert out.shape == (1, 32, 32, 3)


def test_euler_ancestral_denoises_toward_x0():
    # with a perfect eps-oracle the sampler must recover x0
    sched = EulerAncestral(25)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (1, 8, 8, 4)) * 0.3
    noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    sample = noise * sched.init_noise_sigma

    for i in range(25):
        x_in = sched.scale_model_input(sample, i)
        # oracle eps: from x_t = x0 + sigma*eps  ->  eps = (x_t - x0)/sigma
        eps = (sample - x0) / sched.sigmas[i]
        z = jnp.zeros_like(sample)  # eta noise off for determinism
        sample = sched.step(eps, i, sample, z)
    err = float(jnp.abs(sample - x0).max())
    assert err < 1e-2


def test_ddim_oracle_recovery():
    sched = DDIM(20)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (1, 8, 8, 4)) * 0.3
    eps_true = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    t0 = sched.timesteps[0]
    a = sched.alphas_cum[t0]
    sample = jnp.sqrt(a) * x0 + jnp.sqrt(1 - a) * eps_true
    for i in range(20):
        t = sched.timesteps[i]
        a_t = sched.alphas_cum[t]
        eps = (sample - jnp.sqrt(a_t) * x0) / jnp.sqrt(1 - a_t)
        sample = sched.step(eps, i, sample)
    assert float(jnp.abs(sample - x0).max()) < 1e-2


def test_flow_match_oracle_recovery():
    sched = FlowMatchEuler(30)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (1, 8, 8, 4)) * 0.3
    noise = jax.random.normal(jax.random.fold_in(rng, 1), x0.shape)
    sample = noise  # t=1
    v = noise - x0  # constant true velocity of the straight path
    for i in range(30):
        sample = sched.step(v, i, sample)
    assert float(jnp.abs(sample - x0).max()) < 1e-4


def test_clip_text_model():
    cfg = CLIPTextConfig.preset("tiny_g")
    model = CLIPTextModel(cfg)
    tok = HashTokenizer(cfg.vocab_size, cfg.max_len)
    ids = jnp.asarray(tok("a photo of a chair"))[None]
    params = model.init(jax.random.PRNGKey(0), ids)
    hidden, penult, pooled = model.apply(params, ids)
    assert hidden.shape == (1, 77, cfg.hidden_dim)
    assert penult.shape == (1, 77, cfg.hidden_dim)
    assert pooled.shape == (1, cfg.proj_dim)
    # penultimate (SDXL context) differs from the final-LN output
    assert float(jnp.abs(hidden - penult).max()) > 1e-4
    # different prompts give different embeddings
    ids2 = jnp.asarray(tok("a photo of a table"))[None]
    h2, _, _ = model.apply(params, ids2)
    assert float(jnp.abs(hidden - h2).max()) > 1e-4


def test_controlnet_pipeline_tiny_generate():
    from genpc_tpu.config import load_config
    from genpc_tpu.models.controlnet_depth import ControlNetDepth
    cfg = load_config(model_size="tiny")
    pipe = ControlNetDepth(cfg)
    depth = np.random.default_rng(0).random((3, 32, 32)).astype(np.float32)
    img = pipe.generate(depth, "chair", size=64, num_inference_steps=3)
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 1.0


def test_mmdit_tiny_shapes():
    from genpc_tpu.models.dit import DiTConfig, MMDiT
    cfg = DiTConfig.preset("tiny")
    model = MMDiT(cfg)
    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    txt = jax.random.normal(jax.random.PRNGKey(2), (1, 16, cfg.text_dim))
    params = model.init(jax.random.PRNGKey(3), lat, jnp.ones((1,)) * 0.5,
                        txt, cond_latents=cond, guidance=jnp.ones((1,)))
    out = model.apply(params, lat, jnp.ones((1,)) * 0.5, txt,
                      cond_latents=cond, guidance=jnp.ones((1,)))
    assert out.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
    # timestep modulation must matter
    o2 = model.apply(params, lat, jnp.ones((1,)) * 0.9, txt,
                     cond_latents=cond, guidance=jnp.ones((1,)))
    assert float(jnp.abs(out - o2).max()) > 1e-6


def test_chunked_attention_matches_dense():
    """Query-chunked exact attention (the 1024²-preset memory path) must
    reproduce jax.nn.dot_product_attention bit-for-bit up to bf16/f32
    noise — with a key mask and a non-multiple sequence length."""
    from genpc_tpu.models.dit import _chunked_attention
    rng = np.random.default_rng(12)
    b, t, h, dh = 2, 37, 4, 16
    q, k, v = (jnp.asarray(rng.normal(size=(b, t, h, dh)), jnp.float32)
               for _ in range(3))
    mask = jnp.asarray(rng.random((b, t)) > 0.2)
    mask = mask.at[:, 0].set(True)        # every row sees >=1 valid key
    for m in (None, mask):
        ref = jax.nn.dot_product_attention(
            q, k, v, mask=None if m is None else m[:, None, None, :])
        out = _chunked_attention(q, k, v, m, chunk=8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_dit_depth_pipeline_tiny():
    from genpc_tpu.config import load_config
    from genpc_tpu.models.dit_depth import DiTDepthEdit
    pipe = DiTDepthEdit(load_config(model_size="tiny"), variant="qwen")
    depth = np.random.default_rng(0).random((3, 32, 32)).astype(np.float32)
    img = pipe.generate(depth, "chair", size=32, num_inference_steps=2)
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()


def test_rmbg_matting_tiny():
    from genpc_tpu.config import load_config
    from genpc_tpu.models.rmbg import RMBGMatting
    net = RMBGMatting(load_config(model_size="tiny"))
    img = np.random.default_rng(0).random((48, 40, 3)).astype(np.float32)
    out = net(img)
    assert out.shape == (48, 40, 4)
    assert out[..., 3].min() >= 0 and out[..., 3].max() <= 1


def test_marching_tetrahedra_sphere():
    from genpc_tpu.ops.marching import marching_tetrahedra
    R = 32
    g = np.linspace(-1, 1, R)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    d = 0.5 - np.sqrt(X ** 2 + Y ** 2 + Z ** 2)
    v, f = marching_tetrahedra(d)
    r = np.linalg.norm(v, axis=1)
    assert np.abs(r - 0.5).max() < 0.01
    tri = v[f]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1).sum()
    assert abs(area - 4 * np.pi * 0.25) / (4 * np.pi * 0.25) < 0.01
    # closed manifold: every edge used exactly twice
    edges = np.sort(np.concatenate([f[:, [0, 1]], f[:, [1, 2]],
                                    f[:, [2, 0]]]), axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()


@pytest.mark.slow
def test_lrm_tiny_end_to_end():
    from genpc_tpu.config import load_config
    from genpc_tpu.models.lrm import InstantMeshBackend, LRMConfig, TriplaneLRM
    backend = InstantMeshBackend(load_config(model_size="tiny"))
    img = np.random.default_rng(0).random((64, 64, 4)).astype(np.float32)
    mesh = backend("01184", img)
    assert mesh.vertices.shape[1] == 3
    assert mesh.faces.shape[1] == 3
    assert mesh.vertex_colors.shape == mesh.vertices.shape
    assert np.isfinite(mesh.vertices).all()


@pytest.mark.parametrize("name", ["instantmesh", "trellis", "sf3d"])
def test_image23d_generate_meshes_batch(name):
    """Object-batched image-to-3D (VERDICT r2 #3): every mesh-producing
    backend runs its device programs once over [B,...] and returns B
    valid meshes."""
    from genpc_tpu.config import load_config
    from genpc_tpu.models.backends import get_image23d
    backend = get_image23d(name, load_config(model_size="tiny"))
    r = np.random.default_rng(0)
    imgs = [r.random((48, 48, 4)).astype(np.float32) for _ in range(2)]
    meshes = backend.generate_meshes_batch(["a", "b"], imgs)
    assert len(meshes) == 2
    for m in meshes:
        assert m.vertices.shape[1] == 3 and m.faces.shape[1] == 3
        assert m.vertex_colors.shape == m.vertices.shape
        assert np.isfinite(m.vertices).all()


def test_scale_adapter_batch_uses_batched_image23d():
    """scale_adapter_batch must route mesh-producing backends through
    generate_meshes_batch and batched_reg must sample the mesh surface
    (the batched+neural combination previously assumed complete_xyz)."""
    from genpc_tpu.config import load_config
    from genpc_tpu.parallel.batched_runner import batched_reg
    from genpc_tpu.pipeline.artifacts import ObjectArtifacts
    from genpc_tpu.pipeline.scale_adapter import ScaleAdapter
    cfg = load_config(
        save=False, output_path="/tmp/test_ws_b23d",
        generative_model="instantmesh", rembg_model="synthetic",
        model_size="tiny", trust_aligned_completion=False,
        glb_sample_points=256, pose_complete_points=64, icp_points=64,
        pose_iters=3, pose_render_size=32, fused_points=128,
        fine_scale_steps=2, image23d_batch=1)   # exercise HBM chunking
    sa = ScaleAdapter(cfg)
    r = np.random.default_rng(1)
    arts = []
    for i in range(2):
        xyz = r.normal(size=(256, 3)).astype(np.float32) * 0.2
        art = ObjectArtifacts(flag=f"o{i}", xyz=xyz,
                              rgb=np.full((256, 3), 0.5, np.float32))
        art.image = r.random((48, 48, 3)).astype(np.float32)
        art.point_uv = r.random((256, 2)).astype(np.float32)
        arts.append(art)
    sa.scale_adapter_batch(arts)
    for art in arts:
        assert art.complete_mesh is not None
    batched_reg(cfg, arts)
    for art in arts:
        assert art.fused_xyz is not None and len(art.fused_xyz) > 0


def test_triplane_sampling_interpolates():
    from genpc_tpu.models.lrm import sample_triplane
    planes = jnp.zeros((3, 4, 4, 2)).at[0, :, :, 0].set(1.0)
    pts = jnp.array([[0.0, 0.0, 0.0], [0.5, -0.5, 0.25]])
    f = sample_triplane(planes, pts)
    assert f.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(f[:, 0]), 1.0, atol=1e-6)


def test_adapter_pipeline_tiny():
    from genpc_tpu.config import load_config
    from genpc_tpu.models.controlnet_depth import ControlNetDepth
    pipe = ControlNetDepth(load_config(model_size="tiny"), adapter=True)
    depth = np.random.default_rng(0).random((3, 32, 32)).astype(np.float32)
    img = pipe.generate(depth, "chair", size=64, num_inference_steps=2)
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()


def test_ddnm_data_consistency():
    from genpc_tpu.config import load_config
    from genpc_tpu.models.ddnm import DDNMInpainter
    inp = DDNMInpainter(load_config(model_size="tiny"), steps=4)
    img = np.full((3, 32, 32), 0.7, np.float32)
    img[:, 10:20, 10:20] = 0.0
    mask = np.zeros((32, 32), np.float32)
    mask[10:20, 10:20] = 1.0
    out = inp.inpaint(img, mask)
    assert out.shape == (3, 32, 32)
    # known pixels exact (data consistency), holes altered from input
    np.testing.assert_allclose(out[:, 0, 0], 0.7, atol=1e-3)
    assert np.isfinite(out).all()


def test_sdxl_weight_name_mapping_roundtrip():
    """Every flax UNet parameter is reachable from a diffusers-style name."""
    import re
    from genpc_tpu.models.weights import sdxl_unet_name_to_flax, _flatten

    cfg = UNetConfig.preset("tiny")
    model = UNet2DCondition(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                        jnp.zeros((1,)), jnp.zeros((1, 8, cfg.context_dim)))
    n_levels = len(cfg.block_out_channels)

    def flax_to_diffusers(path):
        """Inverse mapping (test-only) from our path to a diffusers name."""
        n = "/".join(path)
        n = re.sub(r"^params/", "", n)
        m = re.match(r"up_(\d+)/(.*)", n)
        if m:
            n = f"up_blocks.{n_levels - 1 - int(m.group(1))}/{m.group(2)}"
        n = re.sub(r"^core/down_(\d+)/", r"down_blocks.\1/", n)
        n = n.replace("core/mid/", "mid_block/")
        n = n.replace("core/conv_in/", "conv_in/")
        n = re.sub(r"resnets_(\d+)/", r"resnets.\1/", n)
        n = re.sub(r"attentions_(\d+)/", r"attentions.\1/", n)
        n = re.sub(r"blocks_(\d+)/", r"transformer_blocks.\1/", n)
        n = n.replace("downsample/conv/", "downsamplers.0/conv/")
        n = n.replace("upsample/conv/", "upsamplers.0/conv/")
        n = n.replace("ff/proj_in/", "ff.net.0.proj/")
        n = n.replace("ff/proj_out/", "ff.net.2/")
        n = n.replace("to_out/", "to_out.0/")
        n = n.replace("/scale", "/weight").replace("/kernel", "/weight")
        return n.replace("/", ".")

    flat = dict(_flatten(params))
    missed = []
    for path in flat:
        dname = flax_to_diffusers(path)
        back = sdxl_unet_name_to_flax(dname, n_levels)
        if back != "/".join(path):
            missed.append(("/".join(path), dname, back))
    assert not missed, missed[:5]


def test_vae_weight_name_mapping_roundtrip():
    import re
    from genpc_tpu.models.weights import vae_name_to_flax, _flatten
    cfg = VAEConfig.preset("tiny")
    vae = AutoencoderKL(cfg)
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    n_levels = len(cfg.block_out_channels)

    def flax_to_diffusers(path):
        n = "/".join(path)
        n = re.sub(r"^params/", "", n)
        m = re.match(r"decoder/up_(\d+)_res_(\d+)/(.*)", n)
        if m:
            n = (f"decoder/up_blocks.{n_levels - 1 - int(m.group(1))}"
                 f".resnets.{m.group(2)}/{m.group(3)}")
        m = re.match(r"decoder/up_(\d+)_us/(.*)", n)
        if m:
            n = (f"decoder/up_blocks.{n_levels - 1 - int(m.group(1))}"
                 f".upsamplers.0/{m.group(2)}")
        n = re.sub(r"encoder/down_(\d+)_res_(\d+)/",
                   r"encoder/down_blocks.\1.resnets.\2/", n)
        n = re.sub(r"encoder/down_(\d+)_ds/",
                   r"encoder/down_blocks.\1.downsamplers.0/", n)
        n = re.sub(r"mid_res_(\d+)/", r"mid_block.resnets.\1/", n)
        n = n.replace("mid_attn/attn/to_out/", "mid_block.attentions.0.to_out.0/")
        n = re.sub(r"mid_attn/attn/(to_[qkv])/", r"mid_block.attentions.0.\1/", n)
        n = n.replace("mid_attn/norm/", "mid_block.attentions.0.group_norm/")
        n = n.replace("norm_out/", "conv_norm_out/")
        n = n.replace("/scale", "/weight").replace("/kernel", "/weight")
        return n.replace("/", ".")

    flat = dict(_flatten(params))
    missed = []
    for path in flat:
        dname = flax_to_diffusers(path)
        back = vae_name_to_flax(dname, n_levels)
        if back != "/".join(path):
            missed.append(("/".join(path), dname, back))
    assert not missed, missed[:5]


def test_graft_weights_end_to_end(tmp_path):
    """Full loader path: torch-layout safetensors -> converted names ->
    grafted flax tree with transposed tensors and 100% coverage."""
    import re
    from safetensors.numpy import save_file
    from genpc_tpu.models.weights import (
        _flatten, _load_safetensors_dir, convert_sdxl_unet, graft_weights)

    cfg = UNetConfig.preset("tiny")
    model = UNet2DCondition(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                        jnp.zeros((1,)), jnp.zeros((1, 8, cfg.context_dim)))
    n_levels = len(cfg.block_out_channels)

    def flax_to_diffusers(path):
        n = "/".join(path)
        n = re.sub(r"^params/", "", n)
        m = re.match(r"up_(\d+)/(.*)", n)
        if m:
            n = f"up_blocks.{n_levels - 1 - int(m.group(1))}/{m.group(2)}"
        n = re.sub(r"^core/down_(\d+)/", r"down_blocks.\1/", n)
        n = n.replace("core/mid/", "mid_block/")
        n = n.replace("core/conv_in/", "conv_in/")
        n = re.sub(r"resnets_(\d+)/", r"resnets.\1/", n)
        n = re.sub(r"attentions_(\d+)/", r"attentions.\1/", n)
        n = re.sub(r"blocks_(\d+)/", r"transformer_blocks.\1/", n)
        n = n.replace("downsample/conv/", "downsamplers.0/conv/")
        n = n.replace("upsample/conv/", "upsamplers.0/conv/")
        n = n.replace("ff/proj_in/", "ff.net.0.proj/")
        n = n.replace("ff/proj_out/", "ff.net.2/")
        n = n.replace("to_out/", "to_out.0/")
        n = n.replace("/scale", "/weight").replace("/kernel", "/weight")
        return n.replace("/", ".")

    # synthesize a torch-layout checkpoint with DISTINCT values
    rng = np.random.default_rng(0)
    fake = {}
    flat = dict(_flatten(params))

    def unbox(x):
        return getattr(x, "value", x)

    for path, v in flat.items():
        val = rng.normal(size=np.asarray(unbox(v)).shape).astype(np.float32)
        t = val
        if t.ndim == 4:
            t = t.transpose(3, 2, 0, 1)   # HWIO -> OIHW
        elif t.ndim == 2:
            t = t.T
        # safetensors writes raw buffers: non-contiguous views save wrong
        fake[flax_to_diffusers(path)] = np.ascontiguousarray(t)
    save_file(fake, str(tmp_path / "model.safetensors"))

    tensors = _load_safetensors_dir(str(tmp_path))
    converted = convert_sdxl_unet(tensors, n_levels)
    grafted = graft_weights(params, converted, {}, "test")
    gflat = dict(_flatten(grafted))
    # every tensor landed, with the transposition undone
    for path, v in flat.items():
        t = fake[flax_to_diffusers(path)]
        if t.ndim == 4:
            t = t.transpose(2, 3, 1, 0)
        elif t.ndim == 2:
            t = t.T
        np.testing.assert_allclose(np.asarray(unbox(gflat[path])), t,
                                   atol=0, err_msg="/".join(path))
    # and the grafted model still runs
    out = model.apply(grafted, jnp.ones((1, 8, 8, 4)), jnp.ones((1,)),
                      jnp.ones((1, 8, cfg.context_dim)))
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_controlnet_chunked_denoise_matches_fused():
    """The host-chunked denoise (full-scale watchdog path) is the same
    math as the single fori_loop — identical schedule and noise keys —
    so outputs must match to float tolerance."""
    import jax
    from genpc_tpu.config import load_config
    from genpc_tpu.models.controlnet_depth import ControlNetDepth

    d = np.random.default_rng(0).uniform(size=(32, 32)).astype(np.float32)
    be1 = ControlNetDepth(load_config(save=False, model_size="tiny"),
                          seed=3)
    img1 = be1.generate(d, "01184", size=32, num_inference_steps=4)
    be2 = ControlNetDepth(load_config(save=False, model_size="tiny",
                                      denoise_chunk=3), seed=3)
    img2 = be2.generate(d, "01184", size=32, num_inference_steps=4)
    np.testing.assert_allclose(img1, img2, atol=2e-5)


@pytest.mark.slow
def test_batched_pose_optim_coarse_to_fine_runs():
    """Two-phase pose optimization produces a valid transform batch and
    coarse_frac=0 reproduces the single-phase path."""
    import jax.numpy as jnp
    from genpc_tpu.parallel.batched_runner import batched_pose_optim
    r = np.random.default_rng(0)
    comp = jnp.asarray(r.normal(size=(2, 128, 3)), jnp.float32) * 0.2
    cols = jnp.full((2, 128, 3), 0.5, jnp.float32)
    part = comp[:, :64] + 0.01
    pcol = cols[:, :64]
    T2 = batched_pose_optim(comp, cols, part, pcol, jnp.float32(0.02),
                            jnp.float32(0.01), 12, 64, chunk=4,
                            coarse_frac=0.5, coarse_res=32)
    assert T2.shape == (2, 4, 4)
    assert np.isfinite(np.asarray(T2)).all()
    T1 = batched_pose_optim(comp, cols, part, pcol, jnp.float32(0.02),
                            jnp.float32(0.01), 12, 64, chunk=4,
                            coarse_frac=0.0)
    assert np.isfinite(np.asarray(T1)).all()
