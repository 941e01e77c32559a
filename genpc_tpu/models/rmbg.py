"""Background-removal matting network (RMBG-2.0 interface equivalent).

The reference loads the BiRefNet-based RMBG-2.0 from a hard-coded local
path and predicts a sigmoid matte at 1024², composing it as the alpha
channel (reference: tools/RMBG.py:10-68).  Here: a flax encoder-decoder
matting net behind the same contract — image in, RGBA out.  Weights load
from cfg.weights_dir when present; at random init the pipeline should use
the synthetic matte backend instead (models/synthetic.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class MattingConfig:
    channels: Tuple[int, ...] = (32, 64, 128, 256)
    infer_size: int = 1024

    @classmethod
    def preset(cls, name: str) -> "MattingConfig":
        if name == "tiny":
            return cls(channels=(8, 16), infer_size=64)
        return cls()


class MattingNet(nn.Module):
    """U-shaped matting network: strided conv encoder, skip decoder."""
    cfg: MattingConfig

    @nn.compact
    def __call__(self, img):
        x = img
        skips = []
        for i, ch in enumerate(self.cfg.channels):
            x = nn.Conv(ch, (3, 3), padding=1, dtype=jnp.bfloat16,
                        name=f"enc_{i}a")(x)
            x = nn.gelu(x)
            x = nn.Conv(ch, (3, 3), padding=1, dtype=jnp.bfloat16,
                        name=f"enc_{i}b")(x)
            x = nn.gelu(x)
            skips.append(x)
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1,
                        dtype=jnp.bfloat16, name=f"enc_{i}d")(x)
        for i, ch in reversed(list(enumerate(self.cfg.channels))):
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
            x = jnp.concatenate([x, skips[i]], axis=-1)
            x = nn.Conv(ch, (3, 3), padding=1, dtype=jnp.bfloat16,
                        name=f"dec_{i}")(x)
            x = nn.gelu(x)
        return nn.Conv(1, (1, 1), dtype=jnp.float32, name="head")(x)


class RMBGMatting:
    """callable(image [H,W,3]) -> RGBA [H,W,4] (RMBG_pred contract)."""

    def __init__(self, cfg=None, seed: int = 0):
        self.cfg = cfg or {}
        size = (cfg.get("model_size", "tiny") if cfg else "tiny")
        self.net_cfg = MattingConfig.preset(size)
        self.net = MattingNet(self.net_cfg)
        s = self.net_cfg.infer_size
        self.params = self.net.init(jax.random.PRNGKey(seed),
                                    jnp.zeros((1, s, s, 3)))
        weights_dir = self.cfg.get("weights_dir") if self.cfg else None
        if weights_dir:
            from genpc_tpu.models.weights import load_matting
            self.params = load_matting(weights_dir, self.params)
        self._apply = jax.jit(lambda p, x: jax.nn.sigmoid(
            self.net.apply(p, x)))

    def __call__(self, image: np.ndarray) -> np.ndarray:
        img = np.asarray(image, np.float32)
        if img.shape[-1] == 4:
            img = img[..., :3]
        h, w = img.shape[:2]
        s = self.net_cfg.infer_size
        from PIL import Image
        resized = np.asarray(Image.fromarray(
            (np.clip(img, 0, 1) * 255).astype(np.uint8)).resize(
            (s, s), Image.BILINEAR), np.float32) / 255.0
        # imagenet normalization like the reference's transform
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        x = (resized - mean) / std
        matte = np.asarray(self._apply(self.params, jnp.asarray(x)[None]))[0, ..., 0]
        matte = np.asarray(Image.fromarray(
            (np.clip(matte, 0, 1) * 255).astype(np.uint8)).resize(
            (w, h), Image.BILINEAR), np.float32) / 255.0
        return np.concatenate([img, matte[..., None]], axis=-1)
