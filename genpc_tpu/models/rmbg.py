"""Background removal via the BiRefNet matting network (RMBG-2.0).

The reference loads the BiRefNet-based RMBG-2.0 from a hard-coded local
path and predicts a sigmoid matte at 1024², composing it as the alpha
channel (reference: tools/RMBG.py:10-68).  The model here is the
checkpoint-isomorphic BiRefNet (models/birefnet.py); weights strict-graft
from cfg.weights_dir (weights.py:load_matting).  At random init the
pipeline should use the synthetic matte backend instead
(models/synthetic.py).

Preprocessing matches the reference exactly: resize to 1024² bilinear,
normalize with mean .5 / std 1.0 (reference RMBG.py:46-47 — NOT the
imagenet stats), matte resized back to the input size and attached as
alpha.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from genpc_tpu.models.birefnet import BiRefNet, BiRefNetConfig


class RMBGMatting:
    """callable(image [H,W,3]) -> RGBA [H,W,4] (RMBG_pred contract)."""

    def __init__(self, cfg=None, seed: int = 0):
        self.cfg = cfg or {}
        size = (cfg.get("model_size", "tiny") if cfg else "tiny")
        self.net_cfg = BiRefNetConfig.preset(
            "tiny" if size != "full" else "full")
        self.net = BiRefNet(self.net_cfg)
        s = self.net_cfg.img_size
        self.params = self.net.init(jax.random.PRNGKey(seed),
                                    jnp.zeros((1, s, s, 3)))
        weights_dir = self.cfg.get("weights_dir") if self.cfg else None
        if weights_dir:
            from genpc_tpu.models.weights import load_matting
            self.params = load_matting(weights_dir, self.params)
        self._apply = jax.jit(self.net.apply)

    def __call__(self, image: np.ndarray) -> np.ndarray:
        img = np.asarray(image, np.float32)
        if img.shape[-1] == 4:
            img = img[..., :3]
        h, w = img.shape[:2]
        s = self.net_cfg.img_size
        from PIL import Image
        resized = np.asarray(Image.fromarray(
            (np.clip(img, 0, 1) * 255).astype(np.uint8)).resize(
            (s, s), Image.BILINEAR), np.float32) / 255.0
        # reference normalization: (x - 0.5) / 1.0 (tools/RMBG.py:47)
        x = resized - 0.5
        matte = np.asarray(self._apply(self.params,
                                       jnp.asarray(x)[None]))[0, ..., 0]
        matte = np.asarray(Image.fromarray(
            (np.clip(matte, 0, 1) * 255).astype(np.uint8)).resize(
            (w, h), Image.BILINEAR), np.float32) / 255.0
        return np.concatenate([img, matte[..., None]], axis=-1)
