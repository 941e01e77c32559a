"""2D image metrics: PSNR / SSIM / MSE + feature-space FID.

Equivalent of the reference's utils/metric_utils suite
(psnr_ssmi.py PSNR/SSIM/MSE batch driver; fid.py + inception.py FID with
InceptionV3 features) — unused by the main pipeline but part of the
evaluation toolkit.  PSNR/SSIM are pure jnp; FID computes the standard
Frechet distance between Gaussian feature statistics, with the feature
extractor pluggable (InceptionV3 weights are not vendored; any embedding
function works, e.g. the CLIP image tower or raw downsampled pixels).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg


def mse(a, b):
    return jnp.mean((jnp.asarray(a, jnp.float32)
                     - jnp.asarray(b, jnp.float32)) ** 2)


def psnr(a, b, data_range: float = 1.0):
    m = mse(a, b)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(m, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    k = jnp.outer(g, g)
    return k / k.sum()


def ssim(a, b, data_range: float = 1.0):
    """Mean SSIM over channels; a, b: [H,W,C] (or [H,W])."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    k = _gaussian_kernel()[:, :, None, None]
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    def filt(x):
        x = x.transpose(2, 0, 1)[:, None]          # [C,1,H,W]
        out = jax.lax.conv_general_dilated(
            x, jnp.tile(k.transpose(2, 3, 0, 1), (1, 1, 1, 1)),
            (1, 1), "VALID")
        return out[:, 0]

    mu_a, mu_b = filt(a), filt(b)
    var_a = filt(a * a) - mu_a ** 2
    var_b = filt(b * b) - mu_b ** 2
    cov = filt(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2))
    return s.mean()


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray) -> float:
    """FID between two feature sets [N,D] (reference: fid.py:9-81)."""
    mu1, mu2 = feats_a.mean(0), feats_b.mean(0)
    s1 = np.cov(feats_a, rowvar=False)
    s2 = np.cov(feats_b, rowvar=False)
    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(s1 @ s2, disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(s1 + s2 - 2.0 * covmean))


def default_feature_extractor(images: np.ndarray, dim: int = 64
                              ) -> np.ndarray:
    """Fallback embedding: downsampled grayscale pixels (checkpoint-free)."""
    import jax.image
    x = jnp.asarray(images, jnp.float32)
    if x.ndim == 3:
        x = x[None]
    g = x.mean(axis=-1, keepdims=True)
    side = int(np.sqrt(dim))
    g = jax.image.resize(g, (x.shape[0], side, side, 1), "linear")
    return np.asarray(g.reshape(x.shape[0], -1))


def fid(images_a, images_b,
        feature_fn: Optional[Callable] = None) -> float:
    fn = feature_fn or default_feature_extractor
    return frechet_distance(fn(np.asarray(images_a)),
                            fn(np.asarray(images_b)))
