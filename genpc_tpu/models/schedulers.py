"""Diffusion samplers as pure-jnp state machines.

Jit-safe counterparts of the schedulers the reference pipelines use:
  * EulerAncestral — SDXL ControlNet path (reference:
    tools/controlnet_depth.py:46-48, EulerAncestralDiscreteScheduler,
    30 steps);
  * DDIM — deterministic fallback / zero123plus-style sampling;
  * FlowMatchEuler — rectified-flow sampling for the DiT backends
    (FLUX/Qwen-Image, reference: tools/flux_depth.py, tools/qwen_depth.py).

All return static per-step coefficient tables so the whole denoise loop
compiles to one lax.fori_loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def betas_scaled_linear(num_train: int = 1000, beta_start: float = 0.00085,
                        beta_end: float = 0.012) -> np.ndarray:
    """The SD/SDXL 'scaled_linear' beta schedule."""
    return np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                       num_train, dtype=np.float64) ** 2


@dataclass
class EulerAncestral:
    """Euler-ancestral sampler over the discrete sigma schedule.

    spacing='linspace' + prediction='epsilon' is the SDXL ControlNet
    configuration; spacing='trailing' + prediction='v' is zero123plus
    (reference: tools/instantmesh.py:89-91 re-creates the scheduler with
    timestep_spacing='trailing'; the v1.2 checkpoint predicts v).
    """
    num_steps: int
    num_train: int = 1000
    spacing: str = "linspace"
    prediction: str = "epsilon"

    def __post_init__(self):
        betas = betas_scaled_linear(self.num_train)
        alphas_cum = np.cumprod(1.0 - betas)
        sigmas_full = np.sqrt((1 - alphas_cum) / alphas_cum)
        if self.spacing == "trailing":
            ts = (np.arange(self.num_train, 0,
                            -self.num_train / self.num_steps)
                  .round() - 1).astype(np.float64)
        else:   # diffusers default 'linspace'
            ts = np.linspace(0, self.num_train - 1, self.num_steps)[::-1]
        sig = np.interp(ts, np.arange(self.num_train), sigmas_full)
        self.timesteps = jnp.asarray(ts, jnp.float32)
        self.sigmas = jnp.asarray(np.append(sig, 0.0), jnp.float32)
        self.init_noise_sigma = float(np.sqrt(sig[0] ** 2 + 1.0))

    def scale_model_input(self, sample, i):
        return sample / jnp.sqrt(self.sigmas[i] ** 2 + 1.0)

    def add_noise(self, x0, noise, i):
        """Noise clean latents to step i's level (diffusers Euler
        convention: UNSCALED sample = x0 + sigma*noise; feed through
        scale_model_input before the model)."""
        return x0 + self.sigmas[i] * noise

    def pred_x0(self, model_out, i, sample):
        sigma = self.sigmas[i]
        if self.prediction == "v":
            return (sample / (sigma ** 2 + 1.0)
                    - model_out * sigma / jnp.sqrt(sigma ** 2 + 1.0))
        return sample - sigma * model_out

    def step(self, model_out, i, sample, noise):
        """One ancestral step; noise ~ N(0,1) same shape as sample."""
        sigma = self.sigmas[i]
        sigma_next = self.sigmas[i + 1]
        pred_x0 = self.pred_x0(model_out, i, sample)
        var = jnp.maximum(sigma_next ** 2 * (sigma ** 2 - sigma_next ** 2)
                          / jnp.maximum(sigma ** 2, 1e-12), 0.0)
        sigma_up = jnp.sqrt(var)
        sigma_down = jnp.sqrt(jnp.maximum(sigma_next ** 2 - var, 0.0))
        derivative = (sample - pred_x0) / jnp.maximum(sigma, 1e-12)
        sample = sample + derivative * (sigma_down - sigma)
        return sample + noise * sigma_up


@dataclass
class DDIM:
    """Deterministic DDIM (eta=0)."""
    num_steps: int
    num_train: int = 1000

    def __post_init__(self):
        betas = betas_scaled_linear(self.num_train)
        self.alphas_cum = jnp.asarray(np.cumprod(1.0 - betas), jnp.float32)
        step = self.num_train // self.num_steps
        ts = (np.arange(self.num_steps) * step)[::-1].copy()
        self.timesteps = jnp.asarray(ts, jnp.int32)
        self.init_noise_sigma = 1.0

    def scale_model_input(self, sample, i):
        return sample

    def step(self, eps, i, sample, noise=None):
        t = self.timesteps[i]
        a_t = self.alphas_cum[t]
        prev_idx = jnp.maximum(t - self.num_train // self.num_steps, 0)
        a_prev = jnp.where(i == self.num_steps - 1, 1.0,
                           self.alphas_cum[prev_idx])
        x0 = (sample - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps


@dataclass
class FlowMatchEuler:
    """Rectified-flow Euler sampler (FLUX/Qwen-Image class DiTs).

    x_t = (1-t)·x0 + t·noise with t from 1 -> 0; the model predicts the
    velocity v = noise - x0.  Supports the resolution-dependent timestep
    shift the FLUX family uses.
    """
    num_steps: int
    shift: float = 3.0

    def __post_init__(self):
        t = np.linspace(1.0, 1.0 / self.num_steps, self.num_steps)
        t = self.shift * t / (1.0 + (self.shift - 1.0) * t)
        self.timesteps = jnp.asarray(t, jnp.float32)
        self.sigmas = jnp.asarray(np.append(t, 0.0), jnp.float32)
        self.init_noise_sigma = 1.0

    def scale_model_input(self, sample, i):
        return sample

    def t_next(self, i):
        """Flow time after step i (0.0 at the end of sampling)."""
        return self.sigmas[i + 1]

    def step(self, velocity, i, sample, noise=None):
        dt = self.sigmas[i + 1] - self.sigmas[i]
        return sample + velocity * dt


def cfg_combine(eps_uncond, eps_cond, scale):
    """Classifier-free guidance combination."""
    return eps_uncond + scale * (eps_cond - eps_uncond)
