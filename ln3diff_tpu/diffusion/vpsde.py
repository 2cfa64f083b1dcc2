"""Continuous-time VPSDE (LSGM) diffusion with importance-weighted t
sampling and mixed (mixing-logit) prediction.

TPU-native rewrite of ``guided_diffusion/continuous_diffusion.py``
(``DiffusionVPSDE:597-680``, ``_iw_quantities_vpsdelike:284-362``,
prediction conversions :84-101) and the mixed-prediction helper
(``continuous_diffusion_utils.py:748`` ``get_mixed_prediction``).  Used by
the ShapeNet/FFHQ LSGM stage-2 path (``TrainLoop3DDiffusionLSGMJointnoD``
and ``..._crossattn``).

All functions are pure jnp over float t ∈ [time_eps, 1]; the ODE sampler
is a fixed-step ``lax.scan`` (the reference uses torchdiffeq host loops).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class IWQuantities(NamedTuple):
    t: jax.Array              # (B,)
    var_t: jax.Array          # (B, 1, 1, 1) σ²(t)
    m_t: jax.Array            # (B, 1, 1, 1) mean coeff α(t)
    obj_weight_t: jax.Array
    obj_weight_t_ll: jax.Array
    g2_t: jax.Array


@dataclasses.dataclass(frozen=True)
class VPSDE:
    """Linear-β VPSDE: β(t) = β0 + (β1-β0)t with β0=0.1, β1=20
    (DDPM's schedule rescaled to unit time)."""
    beta_start: float = 0.1
    beta_end: float = 20.0
    sigma2_0: float = 0.0
    time_eps: float = 0.01

    def g2(self, t):
        return self.beta_start + (self.beta_end - self.beta_start) * t

    def f(self, t):
        return -0.5 * self.g2(t)

    def var(self, t):
        return 1.0 - (1.0 - self.sigma2_0) * jnp.exp(
            -self.beta_start * t
            - 0.5 * (self.beta_end - self.beta_start) * t * t)

    def e2int_f(self, t):
        return jnp.exp(-0.5 * self.beta_start * t
                       - 0.25 * (self.beta_end - self.beta_start) * t * t)

    def inv_var(self, var):
        c = jnp.log((1 - var) / (1 - self.sigma2_0))
        a = self.beta_end - self.beta_start
        return (-self.beta_start
                + jnp.sqrt(self.beta_start**2 - 2 * a * c)) / a

    # -- q process ---------------------------------------------------------

    def sample_q(self, x_init, noise, var_t, m_t):
        return m_t * x_init + jnp.sqrt(var_t) * noise

    def log_snr(self, m_t, var_t):
        return jnp.log(jnp.square(m_t) / var_t)

    def mixing_component(self, x_noisy, var_t):
        """Optimal eps-denoiser for N(0,I) data: sqrt(σ²)·x_t."""
        return jnp.sqrt(var_t) * x_noisy

    # -- prediction conversions (reference :84-101) ------------------------

    def predict_x0_from_eps(self, z, eps, logsnr):
        return jnp.sqrt(1 + jnp.exp(-logsnr)) * (
            z - eps * jax.lax.rsqrt(1 + jnp.exp(logsnr)))

    def predict_eps_from_x0(self, z, x0, logsnr):
        return jnp.sqrt(1 + jnp.exp(logsnr)) * (
            z - x0 * jax.lax.rsqrt(1 + jnp.exp(-logsnr)))

    def predict_eps_from_z_and_v(self, v_t, var_t, z, m_t):
        return jnp.sqrt(var_t) * z + m_t * v_t

    def predict_x0_from_z_and_v(self, v_t, var_t, z, m_t):
        return jnp.sqrt(var_t) * v_t + m_t * z

    # -- importance-weighted t sampling (reference :284-362) ---------------

    def iw_quantities(self, key, size: int,
                      mode: str = 'll_iw') -> IWQuantities:
        rho = jax.random.uniform(key, (size,))
        eps = self.time_eps
        expand = lambda a: a.reshape(-1, 1, 1, 1)

        if mode == 'll_uniform':
            t = rho * (1 - eps) + eps
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            w = g2_t / (2.0 * var_t)
            w_ll = w
        elif mode == 'll_iw':
            ones = jnp.ones_like(rho)
            s2_1, s2_eps = self.var(ones), self.var(eps * ones)
            log1, logeps = jnp.log(s2_1), jnp.log(s2_eps)
            var_t = jnp.exp(rho * log1 + (1 - rho) * logeps)
            t = self.inv_var(var_t)
            m_t, g2_t = self.e2int_f(t), self.g2(t)
            w = 0.5 * (log1 - logeps) / (1.0 - var_t)
            w_ll = w
        elif mode == 'drop_all_uniform':
            t = rho * (1 - eps) + eps
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            w = jnp.ones_like(t)
            w_ll = g2_t / (2.0 * var_t)
        elif mode == 'drop_sigma2t_iw':
            ones = jnp.ones_like(rho)
            s2_1, s2_eps = self.var(ones), self.var(eps * ones)
            var_t = rho * s2_1 + (1 - rho) * s2_eps
            t = self.inv_var(var_t)
            m_t, g2_t = self.e2int_f(t), self.g2(t)
            w = 0.5 * (s2_1 - s2_eps) / (1.0 - var_t)
            w_ll = w / var_t
        elif mode == 'drop_sigma2t_uniform':
            t = rho * (1 - eps) + eps
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            w = g2_t / 2.0
            w_ll = g2_t / (2.0 * var_t)
        elif mode == 'rescale_iw':
            t = rho * (1 - eps) + eps
            var_t, m_t, g2_t = self.var(t), self.e2int_f(t), self.g2(t)
            w = 0.5 / (1.0 - var_t)
            w_ll = g2_t / (2.0 * var_t)
        else:
            raise ValueError(mode)

        return IWQuantities(t, expand(var_t), expand(m_t), expand(w),
                            expand(w_ll), expand(g2_t))

    # -- probability-flow ODE sampling (reference sample_model_ode) --------

    def sample_ode(self, eps_fn: Callable, shape, key, num_steps: int = 250,
                   temperature: float = 1.0):
        """Integrate dx/dt = f(t)x - 0.5 g²(t) score from t=1 → time_eps
        with the eps-parameterized score: score = -eps/sqrt(var).

        eps_fn: (x, t (B,)) -> eps prediction (mixing already applied).
        """
        key, k0 = jax.random.split(key)
        x = jax.random.normal(k0, shape) * temperature
        t0, t1 = 1.0, self.time_eps
        dt = (t1 - t0) / num_steps
        ts = t0 + dt * jnp.arange(num_steps, dtype=jnp.float32)

        def step(x, t_scalar):
            t = jnp.full((shape[0],), t_scalar)
            var_t = self.var(t).reshape(-1, 1, 1, 1)
            eps_pred = eps_fn(x, t)
            f = self.f(t_scalar)
            g2 = self.g2(t_scalar)
            score = -eps_pred / jnp.sqrt(var_t)
            dx = f * x - 0.5 * g2 * score
            return x + dx * dt, None

        x, _ = jax.lax.scan(step, x, ts)
        return x


def get_mixed_prediction(mixed: bool, param, mixing_logit, mixing_component):
    """reference ``continuous_diffusion_utils.py:748``: blend the network
    output with the analytic N(0,I) denoiser through a learnable logit."""
    if not mixed or mixing_logit is None:
        return param
    coef = jax.nn.sigmoid(mixing_logit)
    return (1 - coef) * mixing_component + coef * param


def vpsde_training_losses(sde: VPSDE, eps_fn: Callable, x0, key,
                          mode: str = 'll_iw',
                          mixing_logit: Optional[jax.Array] = None):
    """LSGM eps-matching loss with IW weights (reference ``ddpm_step``,
    ``nsr/lsgm/train_util_diffusion_lsgm_noD_joint.py:348-402``).

    eps_fn: (x_t, t) -> raw model output (pre-mixing).
    """
    k_t, k_n = jax.random.split(key)
    iw = sde.iw_quantities(k_t, x0.shape[0], mode)
    noise = jax.random.normal(k_n, x0.shape, x0.dtype)
    x_t = sde.sample_q(x0, noise, iw.var_t, iw.m_t)
    pred = eps_fn(x_t, iw.t)
    mixing = sde.mixing_component(x_t, iw.var_t)
    pred = get_mixed_prediction(mixing_logit is not None, pred,
                                mixing_logit, mixing)
    l2 = jnp.square(pred - noise)
    axes = tuple(range(1, x0.ndim))
    loss = jnp.sum(iw.obj_weight_t * l2, axis=axes)
    return {'loss': loss, 'p_eps_objs': l2, 'iw': iw, 'x_t': x_t,
            'pred_eps': pred, 'noise': noise}


def kl_per_group(kl_all: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-group KL statistics (reference
    ``continuous_diffusion_utils.py:256`` ``kl_per_group_vada``):
    kl_all (B, groups) → (per-group mean over batch, per-group coeffs
    proportional to the mean magnitude)."""
    mean = jnp.mean(jnp.abs(kl_all), axis=0)
    return jnp.mean(kl_all, axis=0), mean


def kl_balancer(kl_all: jax.Array, kl_coeff: float = 1.0,
                balance: bool = False) -> jax.Array:
    """NVAE-style KL balancing (reference
    ``continuous_diffusion_utils.py:231``): when ``balance``, each
    latent group's KL is reweighted ∝ its magnitude (stop-gradient) so
    no group collapses; otherwise a plain coefficient.  LN3Diff has a
    single latent group on the released paths, where this reduces to
    ``kl_coeff·mean(kl)`` — kept for API parity with hierarchical
    latents.  kl_all: (B, groups)."""
    if not balance:
        return kl_coeff * jnp.mean(jnp.sum(kl_all, axis=1))
    _, alpha = kl_per_group(kl_all)
    alpha = jax.lax.stop_gradient(
        alpha * (alpha.shape[0] / (jnp.sum(alpha) + 1e-10)))
    return kl_coeff * jnp.mean(jnp.sum(kl_all * alpha, axis=1))


def vpsde_cross_entropy_per_dim(sde: VPSDE, eps_fn: Callable, x0, key,
                                mode: str = 'll_iw',
                                mixing_logit: Optional[jax.Array] = None):
    """q-objective CE: per-element −log p(z) through the prior (reference
    ``ce_ddpm_step`` CE block ``train_util_diffusion_lsgm_noD_joint.py:
    594-608``: ``obj_weight_t_q · ‖pred_eps − noise‖² +
    cross_entropy_const(sde_time_eps)``, ``continuous_diffusion.py:103``).

    ``mode`` must be a likelihood weighting ('ll_uniform' | 'll_iw') —
    the reference asserts the same.  Returns a tensor shaped like x0.
    """
    assert mode in ('ll_uniform', 'll_iw'), mode
    out = vpsde_training_losses(sde, eps_fn, x0, key, mode=mode,
                                mixing_logit=mixing_logit)
    # cross-entropy constant per dim at the ODE cutoff
    const = 0.5 * (1.0 + jnp.log(2.0 * jnp.pi
                                 * sde.var(jnp.asarray(sde.time_eps))))
    return out['iw'].obj_weight_t_ll * out['p_eps_objs'] + const


def kl_per_group_vada(log_q: jax.Array, neg_log_p: jax.Array):
    """Per-sample variational-diffusion KL (reference
    ``continuous_diffusion_utils.py:256`` ``kl_per_group_vada``):
    both args elementwise (B, ...); returns (kl_per_sample (B,),
    kl_diag (per-dim mean over batch and trailing axes)).  The reference
    averages (not sums) over dims — kept."""
    axes = tuple(range(1, log_q.ndim))
    kl_per_sample = jnp.mean(neg_log_p + log_q, axis=axes)
    kl_diag = jnp.mean(neg_log_p + log_q, axis=(0,) + axes[1:]) \
        if log_q.ndim > 2 else jnp.mean(neg_log_p + log_q, axis=0)
    return kl_per_sample, kl_diag
