"""Image-to-3D: zero123plus multiview diffusion + InstantMesh triplane LRM.

Rebuild of the reference's InstantMesh path (reference:
tools/instantmesh.py — zero123plus v1.2 makes a 3×2 grid of 6 views at
320² (:130-138), the LRM lifts them through a camera-modulated DINO ViT +
triplane transformer (`forward_planes`, :158) and FlexiCubes extracts a
mesh (:160-181)).

The LRM parameter tree is ISOMORPHIC to the public InstantMesh release
(TencentARC/InstantMesh instant_mesh_base.ckpt, `lrm_generator.*` keys —
the reference strips that prefix at tools/instantmesh.py:108):
  * ``DinoViT`` — HF DINO ViT-B/16 layout with InstantMesh's per-layer
    camera adaLN modulation (4-chunk shift/scale) + the 16-d camera
    embedder MLP;
  * ``TriplaneTransformer`` — learned triplane queries (pos_embed),
    per-layer cross-attention (to image tokens) + self-attention + MLP
    in the torch nn.MultiheadAttention parameter layout, ConvTranspose
    upsampling low-res 32² planes to 64²;
  * ``SynthesizerDecoder`` — the FlexiCubes OSG decoder's four MLP heads
    (sdf / rgb / deformation / weight) over concatenated triplane
    features.
Exact key inventory: checkpoint_specs.spec_instantmesh (reconstructed
from the public implementation; shape-verified by tests/test_checkpoints
since the container is zero-egress).  Mesh extraction runs marching
tetrahedra on the deformed SDF grid (ops/marching.py) instead of CUDA
FlexiCubes.

The multiview stage is a latent-diffusion UNet in the zero123plus
(SD2-class) layout — preset "sd2" grafts the InstantMesh white-background
UNet (spec_unet) — conditioned exactly the way the zero123plus pipeline
conditions it (reference: tools/instantmesh.py:83-99,130-133):
  * a CLIP ViT-H vision tower's global image embedding is ramped into
    the SD2 text context token-by-token (prompt_embeds +
    ramping_coefficients * image_embeds);
  * REFERENCE ATTENTION: each step runs a write pass of the same UNet
    over the noise-matched condition latents and concatenates every
    self-attention's recorded tokens into the sample pass's key/values
    (models/layers.py RefBank);
  * classifier-free guidance 4.0 against a black-image condition, and
    EulerAncestral sampling with trailing spacing + v-prediction.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from genpc_tpu.io.glb import Mesh
from genpc_tpu.models.layers import RefBank
from genpc_tpu.models.schedulers import EulerAncestral, cfg_combine
from genpc_tpu.models.text_encoder import (CLIPTextConfig, CLIPTextModel,
                                           CLIPVisionConfig,
                                           CLIPVisionModel, clip_preprocess,
                                           make_tokenizer)
from genpc_tpu.models.unet import UNet2DCondition, UNetConfig
from genpc_tpu.models.vae import AutoencoderKL, VAEConfig
from genpc_tpu.ops.marching import marching_tetrahedra


@dataclass(frozen=True)
class LRMConfig:
    # DINO ViT encoder (facebook/dino-vitb16 layout)
    vit_dim: int = 768
    vit_layers: int = 12
    vit_heads: int = 12
    patch: int = 16
    img_size: int = 320              # zero123plus view size
    # triplane transformer
    dec_dim: int = 1024
    dec_layers: int = 16
    dec_heads: int = 16
    triplane_low_res: int = 32
    triplane_dim: int = 80
    # OSG decoder heads
    mlp_dim: int = 64
    mlp_layers: int = 4
    grid_res: int = 96               # density grid for extraction
    num_views: int = 6

    @property
    def triplane_res(self) -> int:   # after the 2x deconv
        return self.triplane_low_res * 2

    @property
    def view_size(self) -> int:
        return self.img_size

    @classmethod
    def preset(cls, name: str) -> "LRMConfig":
        if name == "tiny":
            return cls(vit_dim=32, vit_layers=1, vit_heads=2, patch=8,
                       img_size=32, dec_dim=32, dec_layers=1, dec_heads=2,
                       triplane_low_res=4, triplane_dim=8, mlp_dim=16,
                       mlp_layers=2, grid_res=24)
        return cls()


class DinoLayer(nn.Module):
    """HF ViTLayer + InstantMesh camera adaLN (4-chunk, no gates)."""
    cfg: LRMConfig

    @nn.compact
    def __call__(self, x, adaln_input):
        cfg = self.cfg
        d = cfg.vit_dim
        mod = nn.Dense(4 * d, dtype=jnp.float32, name="adaln")(
            nn.silu(adaln_input.astype(jnp.float32)))
        s_msa, sc_msa, s_mlp, sc_mlp = jnp.split(mod[:, None, :], 4, -1)
        h = nn.LayerNorm(dtype=jnp.float32, name="ln_before")(x)
        h = h * (1 + sc_msa) + s_msa
        q = nn.Dense(d, dtype=jnp.bfloat16, name="query")(h)
        k = nn.Dense(d, dtype=jnp.bfloat16, name="key")(h)
        v = nn.Dense(d, dtype=jnp.bfloat16, name="value")(h)
        hd = d // cfg.vit_heads
        split = lambda a: a.reshape(*a.shape[:-1], cfg.vit_heads, hd)
        att = jax.nn.dot_product_attention(split(q), split(k), split(v))
        att = att.reshape(*x.shape[:-1], d)
        x = x + nn.Dense(d, dtype=jnp.bfloat16, name="attn_out")(att)
        h = nn.LayerNorm(dtype=jnp.float32, name="ln_after")(x)
        h = h * (1 + sc_mlp) + s_mlp
        h = nn.gelu(nn.Dense(4 * d, dtype=jnp.bfloat16, name="mlp_in")(h))
        return x + nn.Dense(d, dtype=jnp.bfloat16, name="mlp_out")(h)


class DinoViT(nn.Module):
    """facebook/dino-vitb16 layout with camera modulation."""
    cfg: LRMConfig

    @nn.compact
    def __call__(self, imgs, adaln_input):
        """imgs [B,H,W,3]; adaln_input [B,D] -> tokens [B,1+T,D]."""
        cfg = self.cfg
        b = imgs.shape[0]
        x = nn.Conv(cfg.vit_dim, (cfg.patch, cfg.patch),
                    strides=(cfg.patch, cfg.patch), dtype=jnp.bfloat16,
                    name="patch_proj")(imgs)
        t = x.shape[1] * x.shape[2]
        x = x.reshape(b, t, cfg.vit_dim)
        cls_token = self.param("cls_token", nn.initializers.normal(0.02),
                               (1, 1, cfg.vit_dim))
        x = jnp.concatenate([jnp.tile(cls_token, (b, 1, 1)), x], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + t, cfg.vit_dim))
        x = x + pos
        for i in range(cfg.vit_layers):
            x = DinoLayer(cfg, name=f"layer_{i}")(x, adaln_input)
        x = nn.LayerNorm(dtype=jnp.float32, name="ln")(x)
        # ViTPooler exists in the checkpoint; tanh(dense(cls))
        pooled = jnp.tanh(nn.Dense(cfg.vit_dim, dtype=jnp.float32,
                                   name="pooler")(x[:, 0]))
        return x, pooled


class CameraEmbedder(nn.Module):
    """InstantMesh DinoWrapper camera MLP: 16 -> D -> D."""
    cfg: LRMConfig

    @nn.compact
    def __call__(self, cam):
        d = self.cfg.vit_dim
        x = nn.Dense(d, dtype=jnp.float32, name="linear_1")(cam)
        return nn.Dense(d, dtype=jnp.float32, name="linear_2")(nn.silu(x))


class TriplaneBlock(nn.Module):
    """InstantMesh BasicTransformerBlock: cross-attn -> self-attn -> MLP,
    each pre-LayerNorm, torch MultiheadAttention parameter layout."""
    cfg: LRMConfig

    @nn.compact
    def __call__(self, x, ctx):
        cfg = self.cfg
        d = cfg.dec_dim
        hd = d // cfg.dec_heads
        split = lambda a: a.reshape(*a.shape[:-1], cfg.dec_heads, hd)

        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        q = nn.Dense(d, dtype=jnp.bfloat16, name="cross_q")(h)
        k = nn.Dense(d, dtype=jnp.bfloat16, name="cross_k")(ctx)
        v = nn.Dense(d, dtype=jnp.bfloat16, name="cross_v")(ctx)
        att = jax.nn.dot_product_attention(split(q), split(k), split(v))
        x = x + nn.Dense(d, dtype=jnp.bfloat16, name="cross_out")(
            att.reshape(*x.shape[:-1], d))

        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        q = nn.Dense(d, dtype=jnp.bfloat16, name="self_q")(h)
        k = nn.Dense(d, dtype=jnp.bfloat16, name="self_k")(h)
        v = nn.Dense(d, dtype=jnp.bfloat16, name="self_v")(h)
        att = jax.nn.dot_product_attention(split(q), split(k), split(v))
        x = x + nn.Dense(d, dtype=jnp.bfloat16, name="self_out")(
            att.reshape(*x.shape[:-1], d))

        h = nn.LayerNorm(dtype=jnp.float32, name="norm3")(x)
        h = nn.gelu(nn.Dense(4 * d, dtype=jnp.bfloat16, name="mlp_in")(h))
        return x + nn.Dense(d, dtype=jnp.bfloat16, name="mlp_out")(h)


class TriplaneTransformer(nn.Module):
    cfg: LRMConfig

    @nn.compact
    def __call__(self, img_tokens):
        """img tokens [B,T,ctx] -> triplane [B, 3, R, R, C]."""
        cfg = self.cfg
        b = img_tokens.shape[0]
        low = cfg.triplane_low_res
        nq = 3 * low * low
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, nq, cfg.dec_dim))
        x = jnp.tile(pos, (b, 1, 1))   # learned triplane queries
        for i in range(cfg.dec_layers):
            x = TriplaneBlock(cfg, name=f"layers_{i}")(x, img_tokens)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
        x = x.reshape(b * 3, low, low, cfg.dec_dim)
        x = nn.ConvTranspose(cfg.triplane_dim, (2, 2), strides=(2, 2),
                             dtype=jnp.float32, name="deconv")(x)
        r = cfg.triplane_res
        return x.reshape(b, 3, r, r, cfg.triplane_dim)


def sample_triplane(planes: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Bilinear triplane lookup. planes [3,R,R,C]; pts [N,3] in [-1,1]."""
    R = planes.shape[1]
    coords = (pts + 1.0) * 0.5 * (R - 1)

    def bilerp(plane, uv):
        u, v = uv[:, 0], uv[:, 1]
        u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, R - 2)
        v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, R - 2)
        fu = (u - u0)[:, None]
        fv = (v - v0)[:, None]
        p00 = plane[u0, v0]
        p01 = plane[u0, v0 + 1]
        p10 = plane[u0 + 1, v0]
        p11 = plane[u0 + 1, v0 + 1]
        return ((1 - fu) * (1 - fv) * p00 + (1 - fu) * fv * p01
                + fu * (1 - fv) * p10 + fu * fv * p11)

    f_xy = bilerp(planes[0], coords[:, [0, 1]])
    f_xz = bilerp(planes[1], coords[:, [0, 2]])
    f_yz = bilerp(planes[2], coords[:, [1, 2]])
    return f_xy + f_xz + f_yz


def sample_triplane_concat(planes: jnp.ndarray, pts: jnp.ndarray
                           ) -> jnp.ndarray:
    """Concatenated per-plane features (the OSG decoder input layout)."""
    R = planes.shape[1]
    coords = (pts + 1.0) * 0.5 * (R - 1)

    def bilerp(plane, uv):
        u, v = uv[:, 0], uv[:, 1]
        u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, R - 2)
        v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, R - 2)
        fu = (u - u0)[:, None]
        fv = (v - v0)[:, None]
        return ((1 - fu) * (1 - fv) * plane[u0, v0]
                + (1 - fu) * fv * plane[u0, v0 + 1]
                + fu * (1 - fv) * plane[u0 + 1, v0]
                + fu * fv * plane[u0 + 1, v0 + 1])

    return jnp.concatenate([
        bilerp(planes[0], coords[:, [0, 1]]),
        bilerp(planes[1], coords[:, [0, 2]]),
        bilerp(planes[2], coords[:, [1, 2]])], axis=-1)


class SynthesizerDecoder(nn.Module):
    """InstantMesh OSGDecoder (FlexiCubes variant): four MLP heads over
    concatenated triplane features (3*C in)."""
    cfg: LRMConfig

    def _head(self, feats, name, out_dim):
        cfg = self.cfg
        h = feats
        for j in range(cfg.mlp_layers - 1):
            h = nn.relu(nn.Dense(cfg.mlp_dim, dtype=jnp.float32,
                                 name=f"{name}_{2 * j}")(h))
        return nn.Dense(out_dim, dtype=jnp.float32,
                        name=f"{name}_{2 * (cfg.mlp_layers - 1)}")(h)

    @nn.compact
    def __call__(self, feats):
        sdf = self._head(feats, "net_sdf", 1)
        rgb = jax.nn.sigmoid(self._head(feats, "net_rgb", 3))
        deformation = self._head(feats, "net_deformation", 3)
        weight = self._head(feats, "net_weight", 21)
        return sdf[..., 0], rgb, deformation, weight


class TriplaneLRM(nn.Module):
    """InstantMesh lrm_generator: encoder + transformer + synthesizer."""
    cfg: LRMConfig

    def setup(self):
        self.encoder_model = DinoViT(self.cfg, name="encoder_model")
        self.camera_embedder = CameraEmbedder(self.cfg,
                                              name="camera_embedder")
        self.transformer = TriplaneTransformer(self.cfg, name="transformer")
        self.synthesizer = SynthesizerDecoder(self.cfg, name="synthesizer")

    def forward_planes(self, views, cameras):
        """views [B,V,H,W,3] in [0,1]; cameras [B,V,16]
        (reference: instantmesh.py:158 model.forward_planes)."""
        cfg = self.cfg
        b, v, h, w, c = views.shape
        cam_emb = self.camera_embedder(cameras.reshape(b * v, 16))
        tokens, _ = self.encoder_model(views.reshape(b * v, h, w, c),
                                       cam_emb)
        tokens = tokens.reshape(b, v * tokens.shape[1], cfg.vit_dim)
        return self.transformer(tokens)

    def query(self, planes, pts):
        """planes [3,R,R,C], pts [N,3] -> (sdf, rgb, deformation, weight)."""
        return self.synthesizer(sample_triplane_concat(planes, pts))

    def __call__(self, views, cameras, pts):
        planes = self.forward_planes(views, cameras)
        return self.query(planes[0], pts)


def zero123plus_cameras(num_views: int = 6, radius: float = 4.0
                        ) -> np.ndarray:
    """The 6 fixed zero123plus input cameras as 16-d embeddings
    (flattened 3x4 extrinsic + 4 intrinsics, the InstantMesh convention;
    reference: instantmesh.py:146 get_zero123plus_input_cameras)."""
    azimuths = np.deg2rad([30, 90, 150, 210, 270, 330][:num_views])
    elevations = np.deg2rad([20, -10, 20, -10, 20, -10][:num_views])
    cams = []
    fov = math.radians(30.0)
    fx = 0.5 / math.tan(fov / 2)
    for az, el in zip(azimuths, elevations):
        eye = radius * np.array([np.cos(el) * np.cos(az),
                                 np.cos(el) * np.sin(az),
                                 np.sin(el)])
        z = eye / np.linalg.norm(eye)
        x = np.cross(np.array([0.0, 0.0, 1.0]), z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.stack([x, y, z, eye], axis=1)          # 3x4
        cams.append(np.concatenate([c2w.reshape(-1),
                                    [fx, fx, 0.5, 0.5]]))
    return np.asarray(cams, np.float32)


class InstantMeshBackend:
    """image23d backend: no-background image -> colored Mesh."""

    def __init__(self, cfg=None, seed: int = 0):
        self.cfg = cfg or {}
        size = (cfg.get("model_size", "tiny") if cfg else "tiny")
        full = size == "full"
        self.full = full
        self.lrm_cfg = LRMConfig.preset("full" if full else "tiny")
        self.unet_cfg = UNetConfig.preset("sd2" if full else "tiny")
        self.vae_cfg = VAEConfig.preset("full" if full else "tiny")
        self.txt_cfg = CLIPTextConfig.preset("clip_sd2" if full else "tiny")
        self.vis_cfg = CLIPVisionConfig.preset("vit_h" if full else "tiny")
        self.factor = self.vae_cfg.spatial_factor
        self.mv_steps = 75 if full else 4   # reference: 75 steps
        self.mv_guidance = 4.0              # zero123plus pipeline default
        self.lrm = TriplaneLRM(self.lrm_cfg)
        self.unet = UNet2DCondition(self.unet_cfg)
        self.vae = AutoencoderKL(self.vae_cfg)
        self.clip_text = CLIPTextModel(self.txt_cfg)
        self.clip_vision = CLIPVisionModel(self.vis_cfg)
        self.tokenizer = make_tokenizer(
            self.cfg.get("weights_dir"), self.txt_cfg.vocab_size,
            self.txt_cfg.max_len)
        self._params = None
        self.rng = jax.random.PRNGKey(seed)

    # ------------------------------------------------------------------
    def _grid_hw(self):
        vs = self.lrm_cfg.view_size
        return 3 * vs // self.factor, 2 * vs // self.factor  # 3 rows x 2 cols

    def _init_params(self):
        def build():
            rng = jax.random.PRNGKey(0)
            vs = self.lrm_cfg.view_size
            gh, gw = self._grid_hw()
            views = jnp.zeros((1, self.lrm_cfg.num_views, vs, vs, 3))
            cams = jnp.zeros((1, self.lrm_cfg.num_views, 16))
            pts = jnp.zeros((8, 3))
            lat = jnp.zeros((1, gh, gw, self.unet_cfg.in_channels))
            ctx = jnp.zeros((1, 16, self.unet_cfg.context_dim))
            vp = self.vis_cfg.image_size
            return {
                "lrm": self.lrm.init(rng, views, cams, pts),
                "unet": self.unet.init(jax.random.fold_in(rng, 1), lat,
                                       jnp.zeros((1,)), ctx),
                "vae": self.vae.init(jax.random.fold_in(rng, 2),
                                     jnp.zeros((1, vs, vs, 3))),
                "clip_text": self.clip_text.init(
                    jax.random.fold_in(rng, 3),
                    jnp.zeros((1, self.txt_cfg.max_len), jnp.int32)),
                "clip_vision": self.clip_vision.init(
                    jax.random.fold_in(rng, 4), jnp.zeros((1, vp, vp, 3))),
                # zero123plus per-token ramping coefficients (pipeline
                # config; overwritten by the shipped values on load)
                "ramping": jnp.linspace(0.0, 1.0, self.txt_cfg.max_len),
            }

        if self.full:
            # full preset (2.3B params): materialize bf16 directly — an
            # fp32 init next to the pipeline's other resident buffers
            # RESOURCE_EXHAUSTs the 16 GB chip (see weights.py:
            # random_bf16_params; reference runs zero123plus fp16,
            # tools/instantmesh.py:65-113)
            from genpc_tpu.models.weights import random_bf16_params
            params = random_bf16_params(jax.eval_shape(build))
            # ramping is pipeline CONFIG, not a weight — keep the real
            # linspace values rather than the placeholder randoms
            params["ramping"] = jnp.linspace(
                0.0, 1.0, self.txt_cfg.max_len).astype(jnp.bfloat16)
        else:
            params = build()
        weights_dir = self.cfg.get("weights_dir") if self.cfg else None
        if weights_dir:
            from genpc_tpu.models.weights import load_instantmesh
            params = load_instantmesh(weights_dir, params)
        return params

    # ------------------------------------------------------------------
    def _encode_context(self, params, image_01: np.ndarray):
        """zero123plus conditioning context: empty-prompt SD2 text
        embedding + ramping * CLIP-H global image embedding; the negative
        row keeps the plain text embedding."""
        ids = jnp.asarray(self.tokenizer(""))[None]
        txt, _, _ = self.clip_text.apply(params["clip_text"], ids)
        pix = jnp.asarray(clip_preprocess(image_01,
                                          self.vis_cfg.image_size))
        _, img_emb = self.clip_vision.apply(params["clip_vision"], pix)
        ramp = params["ramping"][: txt.shape[1]]
        pos = txt + ramp[None, :, None] * img_emb[:, None, :]
        return jnp.concatenate([txt, pos], axis=0)     # [2(neg,pos),77,D]

    def _mv_body(self, params, ctx_pair, cond_pair, sched):
        """One zero123plus denoise step: reference-attention write pass
        on the noise-matched condition latents (positive = input image,
        negative = black), CFG read pass on the sample
        (reference: zero123plus pipeline via tools/instantmesh.py:130)."""

        def body(i, carry):
            latents, rng = carry
            rng, k1, k2 = jax.random.split(rng, 3)
            t = jnp.full((2,), sched.timesteps[i], jnp.float32)
            noisy_cond = sched.add_noise(
                cond_pair, jax.random.normal(k1, cond_pair.shape), i)
            noisy_cond = sched.scale_model_input(noisy_cond, i)
            bank = RefBank("w")
            self.unet.apply(params["unet"], noisy_cond, t, ctx_pair,
                            ref=bank)
            lat_in = sched.scale_model_input(latents, i)
            lat_pair = jnp.tile(lat_in, (2, 1, 1, 1))
            out = self.unet.apply(params["unet"], lat_pair, t, ctx_pair,
                                  ref=RefBank("r", bank.tokens))
            v = cfg_combine(out[0:1], out[1:2], self.mv_guidance)
            latents = sched.step(v, i, latents,
                                 jax.random.normal(k2, latents.shape))
            return latents, rng

        return body

    @functools.partial(jax.jit, static_argnames=("self", "steps"))
    def _mv_init(self, params, image, rng, steps: int):
        cond_pos = self.vae.apply(params["vae"], image,
                                  method=AutoencoderKL.encode)
        cond_neg = self.vae.apply(params["vae"], -jnp.ones_like(image),
                                  method=AutoencoderKL.encode)
        cond_pair = jnp.concatenate([cond_neg, cond_pos], axis=0)
        gh, gw = self._grid_hw()
        sched = EulerAncestral(steps, spacing="trailing", prediction="v")
        rng, k0 = jax.random.split(rng)
        latents = jax.random.normal(
            k0, (1, gh, gw, self.unet_cfg.in_channels)) \
            * sched.init_noise_sigma
        return latents, cond_pair, rng

    @functools.partial(jax.jit, static_argnames=("self", "steps"),
                       donate_argnums=(2,))   # donate latents
    def _mv_chunk(self, params, latents, cond_pair, ctx_pair, rng,
                  lo, hi, steps: int):
        """lo/hi are TRACED so all host-chunked segments share one
        executable (fori_loop lowers to while_loop)."""
        sched = EulerAncestral(steps, spacing="trailing", prediction="v")
        body = self._mv_body(params, ctx_pair, cond_pair, sched)
        return jax.lax.fori_loop(lo, hi, body, (latents, rng))

    @functools.partial(jax.jit, static_argnames=("self",))
    def _mv_decode(self, params, latents):
        grid = self.vae.apply(params["vae"], latents,
                              method=AutoencoderKL.decode)
        grid = jnp.clip(grid / 2 + 0.5, 0, 1)[0]      # [3*vs, 2*vs, 3]
        vs = self.lrm_cfg.view_size
        views = grid.reshape(3, vs, 2, vs, 3).transpose(0, 2, 1, 3, 4)
        return views.reshape(1, 6, vs, vs, 3)          # row-major 3x2 order

    def _multiview(self, params, image, ctx_pair, rng, steps: int,
                   chunk: int = 25):
        """input image [1,vs,vs,3] in [-1,1] -> 6 views as a 3x2 grid.

        EulerAncestral (trailing, v-pred) + CFG 4.0 + reference
        attention, host-chunked into <=chunk-step jitted segments so a
        75-step full-scale run stays under the tunnel watchdog's ~1 min
        single-execution limit (same compile either way)."""
        latents, cond_pair, rng = self._mv_init(params, image, rng, steps)
        lo = 0
        while lo < steps:
            hi = min(lo + chunk, steps)
            latents, rng = self._mv_chunk(params, latents, cond_pair,
                                          ctx_pair, rng, jnp.int32(lo),
                                          jnp.int32(hi), steps)
            lo = hi
        return self._mv_decode(params, latents)

    # ---------------------------------------------- object-batched path
    def _encode_context_batch(self, params, imgs01: np.ndarray):
        """imgs01 [B,vs,vs,3] in [0,1] -> context [B,2,77,D]
        ((neg, pos) per object; see _encode_context)."""
        ids = jnp.asarray(self.tokenizer(""))[None]
        txt, _, _ = self.clip_text.apply(params["clip_text"], ids)
        pix = jnp.asarray(np.concatenate(
            [clip_preprocess(i, self.vis_cfg.image_size) for i in imgs01]))
        _, img_emb = self.clip_vision.apply(params["clip_vision"], pix)
        ramp = params["ramping"][: txt.shape[1]]
        pos = txt + ramp[None, :, None] * img_emb[:, None, :]  # [B,77,D]
        neg = jnp.broadcast_to(txt, pos.shape)
        return jnp.stack([neg, pos], axis=1)

    @functools.partial(jax.jit, static_argnames=("self", "steps"))
    def _mv_init_batch(self, params, images, rng, steps: int):
        """images [B,vs,vs,3] in [-1,1] -> (latents [B,1,gh,gw,C],
        cond_pair [B,2,h,w,C], per-object rngs [B,2])."""
        cond_pos = self.vae.apply(params["vae"], images,
                                  method=AutoencoderKL.encode)
        cond_neg = self.vae.apply(params["vae"],
                                  -jnp.ones_like(images[:1]),
                                  method=AutoencoderKL.encode)
        cond_pair = jnp.stack(
            [jnp.broadcast_to(cond_neg, cond_pos.shape), cond_pos], axis=1)
        gh, gw = self._grid_hw()
        sched = EulerAncestral(steps, spacing="trailing", prediction="v")
        rng, k0 = jax.random.split(rng)
        latents = jax.random.normal(
            k0, (images.shape[0], 1, gh, gw, self.unet_cfg.in_channels)) \
            * sched.init_noise_sigma
        rngs = jax.random.split(jax.random.fold_in(rng, 1),
                                images.shape[0])
        return latents, cond_pair, rngs

    @functools.partial(jax.jit, static_argnames=("self", "steps"),
                       donate_argnums=(2,))   # donate latents
    def _mv_chunk_batch(self, params, latents, cond_pair, ctx, rngs,
                        lo, hi, steps: int):
        """lo/hi are TRACED (fori_loop lowers to while_loop), so every
        host-chunked segment reuses ONE executable — the single-object
        path's static-bounds variant compiles one program per segment."""
        sched = EulerAncestral(steps, spacing="trailing", prediction="v")

        def one(lat, cp, cx, r):
            body = self._mv_body(params, cx, cp, sched)
            return jax.lax.fori_loop(lo, hi, body, (lat, r))

        return jax.vmap(one)(latents, cond_pair, ctx, rngs)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _mv_decode_batch(self, params, latents):
        """latents [B,1,gh,gw,C] -> views [B,6,vs,vs,3]."""
        grid = self.vae.apply(params["vae"], latents[:, 0],
                              method=AutoencoderKL.decode)
        grid = jnp.clip(grid / 2 + 0.5, 0, 1)
        vs = self.lrm_cfg.view_size
        b = grid.shape[0]
        views = grid.reshape(b, 3, vs, 2, vs, 3).transpose(0, 1, 3, 2, 4,
                                                           5)
        return views.reshape(b, 6, vs, vs, 3)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _density_grid_batch(self, params, views, cameras):
        """views [B,6,vs,vs,3], cameras [B,6,16] -> (planes [B,...],
        sdf [B,R,R,R])."""
        planes = self.lrm.apply(params["lrm"], views, cameras,
                                method=TriplaneLRM.forward_planes)
        R = self.lrm_cfg.grid_res
        g = jnp.linspace(-1.0, 1.0, R)
        pts = jnp.stack(jnp.meshgrid(g, g, g, indexing="ij"),
                        axis=-1).reshape(-1, 3)

        def q(p):
            sdf, _, _, _ = self.lrm.apply(params["lrm"], p, pts,
                                          method=TriplaneLRM.query)
            return sdf.reshape(R, R, R)

        return planes, jax.vmap(q)(planes)

    def generate_meshes_batch(self, flags, images) -> list:
        """Object-batched zero123plus + LRM: B no-background images ->
        B colored meshes.  The multiview denoise loop (vmapped over
        objects inside each host-chunked segment), VAE decode and
        triplane/SDF grids each run as ONE [B, ...] device program —
        SURVEY §2.3's "batch the diffusion denoise loops across
        objects" for the image-to-3D stage (VERDICT r2 #3); the
        reference runs zero123plus once per object
        (tools/instantmesh.py:115-182)."""
        if self._params is None:
            self._params = self._init_params()
        imgs01 = np.stack([self._prep_image(im) for im in images])
        self.rng, k = jax.random.split(self.rng)
        ctx = self._encode_context_batch(self._params, imgs01)
        latents, cond_pair, rngs = self._mv_init_batch(
            self._params, jnp.asarray(imgs01 * 2 - 1), k, self.mv_steps)
        lo = 0
        while lo < self.mv_steps:   # host-chunked (tunnel watchdog)
            hi = min(lo + 25, self.mv_steps)
            latents, rngs = self._mv_chunk_batch(
                self._params, latents, cond_pair, ctx, rngs,
                jnp.int32(lo), jnp.int32(hi), self.mv_steps)
            lo = hi
        views = self._mv_decode_batch(self._params, latents)
        cams = jnp.broadcast_to(
            jnp.asarray(zero123plus_cameras(self.lrm_cfg.num_views))[None],
            (len(images), self.lrm_cfg.num_views, 16))
        planes, sdfs = self._density_grid_batch(self._params, views, cams)
        d_all = np.asarray(sdfs)
        meshes = []
        for i in range(len(images)):
            d = d_all[i]
            level = float(np.median(d))
            verts, faces = marching_tetrahedra(d, level=level)
            if len(verts) == 0:
                verts = np.zeros((3, 3), np.float32)
                faces = np.asarray([[0, 1, 2]], np.int32)
            rgb = self._mesh_colors(planes[i], verts)
            meshes.append(Mesh(verts.astype(np.float32),
                               faces.astype(np.int32), rgb))
        return meshes

    def release(self):
        """Terminally free every device param buffer of this backend.

        The jitted methods hold ``self`` static, so the global pjit
        cache pins this instance and its ~2.3B-param tree; explicit
        buffer deletion is the only way to return the HBM (see
        ControlNetDepth.release for the measurement).  Called by
        ``run_batched`` before the pose-optimization stage (the
        reference frees between stages, main_lidar.py:12-16)."""
        for leaf in jax.tree_util.tree_leaves(self._params):
            try:
                leaf.delete()
            except Exception:
                pass
        self._params = None

    def _prep_image(self, image_nobg) -> np.ndarray:
        """RGBA/RGB [H,W,*] in [0,1] -> alpha-matted [vs,vs,3]."""
        from genpc_tpu.models.backends import prep_rgb
        return prep_rgb(image_nobg, self.lrm_cfg.view_size)

    def _mesh_colors(self, planes, verts: np.ndarray) -> np.ndarray:
        """Query vertex colors with verts padded to a 8192 bucket so
        per-object vertex counts don't each compile a fresh program."""
        n = len(verts)
        npad = -(-n // 8192) * 8192
        vp = np.concatenate(
            [verts, np.repeat(verts[-1:], npad - n, axis=0)])
        rgb = np.asarray(self._colors_at(self._params, planes,
                                         jnp.asarray(vp, jnp.float32)))
        return np.clip(rgb[:n], 0, 1).astype(np.float32)

    @functools.partial(jax.jit, static_argnames=("self",))
    def _density_grid(self, params, views, cameras):
        planes = self.lrm.apply(params["lrm"], views, cameras,
                                method=TriplaneLRM.forward_planes)[0]
        R = self.lrm_cfg.grid_res
        g = jnp.linspace(-1.0, 1.0, R)
        pts = jnp.stack(jnp.meshgrid(g, g, g, indexing="ij"),
                        axis=-1).reshape(-1, 3)
        sdf, rgb, deformation, _ = self.lrm.apply(
            params["lrm"], planes, pts, method=TriplaneLRM.query)
        return planes, sdf.reshape(R, R, R), rgb

    @functools.partial(jax.jit, static_argnames=("self",))
    def _colors_at(self, params, planes, pts):
        _, rgb, _, _ = self.lrm.apply(params["lrm"], planes, pts,
                                      method=TriplaneLRM.query)
        return rgb

    # ------------------------------------------------------------------
    def __call__(self, flag: str, image_nobg: np.ndarray,
                 partial_xyz=None, partial_rgb=None, viewpoint=None) -> Mesh:
        if self._params is None:
            self._params = self._init_params()
        img = self._prep_image(image_nobg)
        self.rng, k = jax.random.split(self.rng)
        ctx_pair = self._encode_context(self._params, img)
        views = self._multiview(self._params, jnp.asarray(img * 2 - 1)[None],
                                ctx_pair, k, self.mv_steps)
        cams = jnp.asarray(zero123plus_cameras(
            self.lrm_cfg.num_views))[None]
        planes, sdf, _ = self._density_grid(self._params, views, cams)
        d = np.asarray(sdf)
        level = float(np.median(d))   # guarantees a surface at any init
        verts, faces = marching_tetrahedra(d, level=level)
        if len(verts) == 0:
            verts = np.zeros((3, 3), np.float32)
            faces = np.asarray([[0, 1, 2]], np.int32)
        rgb = self._mesh_colors(planes, verts)
        return Mesh(verts.astype(np.float32), faces.astype(np.int32), rgb)
