"""DPM-Solver++(2M): deterministic multistep ODE sampler.

The reference vendors DPM-Solver alongside DDIM/PLMS
(``ldm/models/diffusion/dpm_solver``, flag-gated); here it is a
first-class sampler because it is the cheapest quality/step tradeoff on
TPU — 20-30 solver steps match 250-step DDIM, turning the 250 DiT
forwards that dominate text→mesh wall-clock into ~25.

Implementation: data-prediction (x0) variant of DPM-Solver++ with 2nd
order multistep correction (Lu et al., 2022), in log-SNR (λ) space, as a
single ``lax.scan`` over precomputed per-step coefficients:

  x_{i+1} = (σ_{i+1}/σ_i) · x_i − α_{i+1} · expm1(−h_i) · D_i
  D_i     = (1 + c_i) · x0(x_i, t_i) − c_i · x0_{i−1},
  c_i     = h_i / (2 h_{i−1})   (0 on the first step)

where α, σ come from the host diffusion's ᾱ tables and h_i = λ_{i+1}−λ_i.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _to_x0(diffusion, model_output, x, t, mixing_logit=None):
    """Model output → x0 prediction per the diffusion's mean_type.

    LSGM mixed prediction mirrors ``GaussianDiffusion.p_mean_variance``:
    v outputs convert to eps FIRST, then the mixing logit blends with the
    analytic N(0,I) denoiser, and the blend is treated as eps."""
    C = x.shape[-1]
    if model_output.shape[-1] == 2 * C:   # learned_range variance half
        model_output = model_output[..., :C]
    mt = diffusion.spec.mean_type
    if diffusion.spec.mixed_prediction and mixing_logit is not None:
        if mt == 'v':
            model_output = diffusion.predict_eps_from_v(x, t, model_output)
            mt = 'eps'
        space = 'x0' if mt == 'x0' else 'eps'
        model_output = diffusion._apply_mixing(model_output, x, t,
                                               mixing_logit, space=space)
    if mt == 'eps':
        return diffusion.predict_xstart_from_eps(x, t, model_output)
    if mt == 'v':
        return diffusion.predict_xstart_from_v(x, t, model_output)
    if mt == 'x0':
        return model_output
    raise ValueError(mt)


def dpm_solver_timesteps(num_train_steps: int, num_steps: int,
                         alphas_cumprod: Optional[np.ndarray] = None,
                         skip_type: str = 'time_uniform') -> np.ndarray:
    """Integer timestep grid T−1 → 0 (num_steps+1 points).

    skip_type:
      * 'time_uniform': uniform in t;
      * 'logsnr': uniform in λ = log(α/σ) (needs ``alphas_cumprod``) —
        the DPM-Solver recommendation for low resolutions; ~10x more
        accurate than time_uniform at 20 steps on the discrete linear
        schedule because uniform-t is wildly non-uniform in λ near t=0.
    Snapped to integers and forced strictly decreasing.
    """
    if skip_type == 'logsnr':
        assert alphas_cumprod is not None
        acp = np.asarray(alphas_cumprod, np.float64)
        lam = 0.5 * (np.log(acp) - np.log1p(-acp))
        targets = np.linspace(lam[num_train_steps - 1], lam[0],
                              num_steps + 1)
        # λ is monotone decreasing in t → invert by interpolation
        ts = np.interp(targets, lam[::-1],
                       np.arange(num_train_steps)[::-1].astype(np.float64))
        ts = np.round(ts).astype(np.int64)
        # enforce strictly decreasing (dedupe snap collisions near t=0)
        for i in range(len(ts) - 2, -1, -1):
            ts[i] = max(ts[i], ts[i + 1] + 1)
        ts[0] = num_train_steps - 1
        return ts.astype(np.int32)
    return np.linspace(num_train_steps - 1, 0, num_steps + 1).round() \
        .astype(np.int32)


def dpm_solver_sample_loop(diffusion, model_fn, shape, key,
                           num_steps: int = 25, model_kwargs=None,
                           noise: Optional[jax.Array] = None,
                           mixing_logit: Optional[jax.Array] = None,
                           skip_type: str = 'logsnr'):
    """Sample via DPM-Solver++(2M).

    Args:
      diffusion: a ``GaussianDiffusion`` (full, unspaced schedule).
      model_fn: (x, t, **model_kwargs) → model output (eps/v/x0 per spec;
        a CFG-wrapped fn from ``make_cfg_model_fn`` works unchanged).
    Returns:
      x at t=0 (the final x0 prediction).
    """
    model_kwargs = model_kwargs or {}
    ts = dpm_solver_timesteps(diffusion.num_timesteps, num_steps,
                              np.asarray(diffusion.alphas_cumprod),
                              skip_type=skip_type)

    acp = np.asarray(diffusion.alphas_cumprod)[ts]
    alpha = np.sqrt(acp)
    sigma = np.sqrt(1.0 - acp)
    lam = np.log(alpha / sigma)
    h = lam[1:] - lam[:-1]                     # (num_steps,) > 0
    c = np.zeros(num_steps)
    # 2M correction weight h_cur/(2·h_prev): D = (1+c)·x0 − c·x0_prev
    # matches the reference ldm/.../dpm_solver.py:750-760
    # (D1_0 = (1/r0)·(m0−m1), r0 = h_prev/h_cur).
    c[1:] = h[1:] / (2.0 * h[:-1])             # multistep coefficient

    consts = {
        't_in': jnp.asarray(ts[:-1], jnp.int32),
        'sig_ratio': jnp.asarray(sigma[1:] / sigma[:-1], jnp.float32),
        'alpha_next': jnp.asarray(alpha[1:], jnp.float32),
        'em1': jnp.asarray(np.expm1(-h), jnp.float32),
        'c': jnp.asarray(c, jnp.float32),
    }

    if noise is None:
        noise = jax.random.normal(key, shape)
    x = noise

    def step(carry, sc):
        x, x0_prev = carry
        t = jnp.full((shape[0],), sc['t_in'])
        out = model_fn(x, diffusion.scale_t(t), **model_kwargs)
        x0 = _to_x0(diffusion, out, x, t, mixing_logit)
        D = (1.0 + sc['c']) * x0 - sc['c'] * x0_prev
        x_next = sc['sig_ratio'] * x - sc['alpha_next'] * sc['em1'] * D
        return (x_next, x0), None

    (x, _), _ = jax.lax.scan(step, (x, jnp.zeros_like(x)), consts)

    # land exactly on the data manifold: final x0 prediction at t=0
    t0 = jnp.zeros((shape[0],), jnp.int32)
    out = model_fn(x, diffusion.scale_t(t0), **model_kwargs)
    return _to_x0(diffusion, out, x, t0, mixing_logit)
