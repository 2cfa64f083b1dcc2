"""EDM-style denoiser wrapping + Euler sampler + CFG guider (sgm stack).

TPU-native rewrite of the sgm diffusion pieces the released t23d-DDPM path
uses (``sgm/configs/txt2img-clipl-compat.yaml``):
``DiscreteDenoiser`` with ``EpsScaling`` over ``LegacyDDPMDiscretization``
sigmas (``sgm/modules/diffusionmodules/denoiser.py:45``,
``denoiser_scaling.py``, ``discretizer.py:42-69``),
``EulerEDMSampler`` (``sampling.py:109-215``) and ``VanillaCFG``
(``guiders.py:24-42``).  The sampling loop is one ``lax.scan``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

ModelFn = Callable[..., jax.Array]  # (x, c_noise, cond) -> output


def _append_dims(x, ndim):
    return x.reshape(x.shape + (1,) * (ndim - x.ndim))


def legacy_ddpm_sigmas(n: int, num_timesteps: int = 1000,
                       linear_start: float = 0.00085,
                       linear_end: float = 0.0120) -> np.ndarray:
    """σ_i = sqrt((1-ᾱ)/ᾱ) over the LDM "linear" (sqrt-space) β schedule,
    flipped to descending (reference ``LegacyDDPMDiscretization``)."""
    betas = np.linspace(linear_start**0.5, linear_end**0.5, num_timesteps,
                        dtype=np.float64)**2
    acp = np.cumprod(1.0 - betas)
    if n < num_timesteps:
        # generate_roughly_equally_spaced_steps
        idx = np.linspace(num_timesteps - 1, 0, n, endpoint=True)[::-1]
        idx = np.round(idx).astype(int)
        acp = acp[idx]
    sigmas = np.sqrt((1 - acp) / acp)
    return sigmas[::-1].copy()  # descending


@dataclasses.dataclass(frozen=True)
class ScalingFns:
    kind: str = 'eps'   # 'eps' | 'v' | 'edm' | 'v-edm-cnoise'
    sigma_data: float = 0.5

    def __call__(self, sigma):
        if self.kind == 'eps':
            c_skip = jnp.ones_like(sigma)
            c_out = -sigma
            c_in = 1 / jnp.sqrt(sigma**2 + 1.0)
            c_noise = sigma
        elif self.kind == 'v':
            c_skip = 1.0 / (sigma**2 + 1.0)
            c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
            c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
            c_noise = sigma
        elif self.kind == 'v-edm-cnoise':
            c_skip = 1.0 / (sigma**2 + 1.0)
            c_out = -sigma / jnp.sqrt(sigma**2 + 1.0)
            c_in = 1.0 / jnp.sqrt(sigma**2 + 1.0)
            c_noise = 0.25 * jnp.log(sigma)
        else:  # edm
            sd = self.sigma_data
            c_skip = sd**2 / (sigma**2 + sd**2)
            c_out = sigma * sd / jnp.sqrt(sigma**2 + sd**2)
            c_in = 1 / jnp.sqrt(sigma**2 + sd**2)
            c_noise = 0.25 * jnp.log(sigma)
        return c_skip, c_out, c_in, c_noise


class DiscreteDenoiser:
    """Quantizes σ to a discretized table and exposes the denoised-x
    parameterization D(x;σ) = c_out·F(c_in·x, c_noise) + c_skip·x."""

    def __init__(self, num_idx: int = 1000, scaling: str = 'eps',
                 quantize_c_noise: bool = True):
        self.sigmas = jnp.asarray(
            legacy_ddpm_sigmas(num_idx, num_idx)[::-1].copy(),
            jnp.float32)  # ascending for index lookup
        self.scaling = ScalingFns(scaling)
        self.quantize_c_noise = quantize_c_noise

    def sigma_to_idx(self, sigma):
        d = jnp.abs(sigma[..., None] - self.sigmas)
        return jnp.argmin(d, axis=-1)

    def __call__(self, network: ModelFn, x, sigma, cond):
        idx = self.sigma_to_idx(sigma)
        sigma_q = jnp.take(self.sigmas, idx)
        c_skip, c_out, c_in, c_noise = self.scaling(sigma_q)
        if self.quantize_c_noise:
            c_noise = self.sigma_to_idx(c_noise if self.scaling.kind
                                        in ('eps', 'v') else sigma_q)
        out = network(_append_dims(c_in, x.ndim) * x, c_noise, cond)
        return (out * _append_dims(c_out, x.ndim)
                + x * _append_dims(c_skip, x.ndim))


def discrete_sigma_sampler(key, batch: int, num_idx: int = 1000):
    """Uniform index sampling over the discrete sigma table (reference
    ``sigma_sampling.DiscreteSampling``)."""
    sigmas = jnp.asarray(legacy_ddpm_sigmas(num_idx, num_idx)[::-1].copy(),
                         jnp.float32)
    idx = jax.random.randint(key, (batch,), 0, num_idx)
    return jnp.take(sigmas, idx)


def edm_training_loss(denoiser: DiscreteDenoiser, network: ModelFn,
                      x0, key, cond, loss_weighting: str = 'eps'):
    """StandardDiffusionLoss with EpsWeighting (reference
    ``sgm/modules/diffusionmodules/loss.py:14-46``): w(σ)=σ^-2 against the
    denoised-x parameterization ⇔ plain eps MSE."""
    k_sigma, k_noise = jax.random.split(key)
    sigma = discrete_sigma_sampler(k_sigma, x0.shape[0],
                                   denoiser.sigmas.shape[0])
    noise = jax.random.normal(k_noise, x0.shape, x0.dtype)
    x_noised = x0 + noise * _append_dims(sigma, x0.ndim)
    denoised = denoiser(network, x_noised, sigma, cond)
    if loss_weighting == 'eps':
        w = 1.0 / sigma**2
    else:
        w = jnp.ones_like(sigma)
    axes = tuple(range(1, x0.ndim))
    return jnp.mean(_append_dims(w, x0.ndim) * (denoised - x0)**2, axis=axes)


def euler_edm_sample(denoiser: DiscreteDenoiser, network: ModelFn, shape,
                     key, cond, uc, num_steps: int = 250,
                     cfg_scale: float = 6.5,
                     s_churn: float = 0.0, s_noise: float = 1.0):
    """EulerEDMSampler + VanillaCFG as one jitted scan.

    cond/uc: pytrees of conditioning with matching structure; they are
    batch-concatenated [uc, c] per the reference guider.
    """
    sigmas = jnp.asarray(legacy_ddpm_sigmas(num_steps), jnp.float32)
    sigmas = jnp.append(sigmas, 0.0)

    key, k0 = jax.random.split(key)
    x = jax.random.normal(k0, shape) * sigmas[0]

    both_cond = jax.tree_util.tree_map(
        lambda u, c: jnp.concatenate([u, c], axis=0), uc, cond)

    def denoise_cfg(x, sigma):
        xx = jnp.concatenate([x, x], axis=0)
        ss = jnp.concatenate([sigma, sigma], axis=0)
        d = denoiser(network, xx, ss, both_cond)
        d_u, d_c = jnp.split(d, 2, axis=0)
        return d_u + cfg_scale * (d_c - d_u)

    def step(carry, i):
        x, key = carry
        sigma = jnp.full((shape[0],), 1.0) * sigmas[i]
        next_sigma = jnp.full((shape[0],), 1.0) * sigmas[i + 1]
        gamma = jnp.where(s_churn > 0,
                          jnp.minimum(s_churn / num_steps, 2**0.5 - 1), 0.0)
        key, k = jax.random.split(key)
        eps = jax.random.normal(k, shape) * s_noise
        sigma_hat = sigma * (gamma + 1.0)
        x = jnp.where(gamma > 0,
                      x + eps * _append_dims(
                          jnp.sqrt(jnp.maximum(sigma_hat**2 - sigma**2, 0.0)),
                          x.ndim), x)
        denoised = denoise_cfg(x, sigma_hat)
        d = (x - denoised) / _append_dims(sigma_hat, x.ndim)
        dt = _append_dims(next_sigma - sigma_hat, x.ndim)
        x = x + d * dt
        return (x, key), None

    (x, _), _ = jax.lax.scan(step, (x, key), jnp.arange(num_steps))
    return x
