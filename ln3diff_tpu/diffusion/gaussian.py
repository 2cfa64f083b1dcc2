"""Discrete-time Gaussian diffusion (DDPM / DDIM) with respacing and CFG.

TPU-native rewrite of ``guided_diffusion/gaussian_diffusion.py`` (β schedules
:20-85, q/p math, eps/x0/v prediction :444-458, ``training_losses:1050``,
``p_sample_loop:627``, ``ddim_sample_loop:908``) and ``respace.py:8-136``
(``space_timesteps`` + ``SpacedDiffusion``).

Design differences from the reference (deliberate, for XLA):
  * all schedule tables are precomputed arrays; timestep lookups are
    ``jnp.take`` — no host sync inside the sampler;
  * sampling loops are single jitted ``lax.scan``s over steps — the whole
    250-step DDIM chain compiles to one XLA program (the north-star
    "single jitted scan");
  * classifier-free guidance mirrors the reference's doubled-batch trick
    (``ddim_sample:729-869``) but as a model-fn wrapper;
  * LSGM mixed prediction (mixing logit) enters through
    ``mixed_prediction`` exactly as ``p_mean_variance:273-349``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

ModelFn = Callable[..., jax.Array]  # (x, t, **kwargs) -> model output


def get_named_beta_schedule(name: str, num_steps: int) -> np.ndarray:
    """β schedules (reference :20-85)."""
    if name == 'linear':
        scale = 1000 / num_steps
        return np.linspace(scale * 1e-4, scale * 0.02, num_steps,
                           dtype=np.float64)
    if name == 'cosine':
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2)**2
        betas = []
        for i in range(num_steps):
            t1, t2 = i / num_steps, (i + 1) / num_steps
            betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), 0.999))
        return np.array(betas)
    if name == 'linear_simple':
        return np.array([min(0.999, 0.001 / (1.001 - i / num_steps))
                         for i in range(num_steps)])
    raise NotImplementedError(name)


def space_timesteps(num_timesteps: int, section_counts) -> list[int]:
    """Subsequence of timesteps to retain (reference ``respace.py:8-63``).
    Accepts "ddimN", "N", or a list of per-section counts."""
    if isinstance(section_counts, str):
        if section_counts.startswith('ddim'):
            desired = int(section_counts[len('ddim'):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return list(range(0, num_timesteps, i))
            raise ValueError(
                f'cannot create exactly {desired} steps with an integer'
                ' stride')
        section_counts = [int(x) for x in section_counts.split(',')]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < count:
            raise ValueError(f'cannot divide section of {size} steps into'
                             f' {count}')
        stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur_idx = 0.0
        taken = []
        for _ in range(count):
            taken.append(start_idx + round(cur_idx))
            cur_idx += stride
        all_steps += taken
        start_idx += size
    return sorted(all_steps)


@dataclasses.dataclass(frozen=True)
class DiffusionSpec:
    schedule: str = 'linear'
    steps: int = 1000
    mean_type: str = 'eps'            # 'eps' | 'x0' | 'v'
    var_type: str = 'fixed_small'     # 'fixed_small'|'fixed_large'|'learned_range'
    mixed_prediction: bool = False    # LSGM mixing-logit prediction
    clip_denoised: bool = False
    rescale_timesteps: bool = False
    # 'mse' | 'rescaled_mse' (hybrid: MSE + detached-mean VLB for
    # learned_range) | 'kl' | 'rescaled_kl' (reference LossType,
    # ``gaussian_diffusion.py:1084-1177``)
    loss_type: str = 'mse'


def mean_flat(x: jax.Array) -> jax.Array:
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL of two diagonal Gaussians, elementwise in nats (reference
    ``guided_diffusion/losses.py:12``)."""
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + jnp.square(mean1 - mean2) * jnp.exp(-logvar2))


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi)
                                 * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """log p of uint8-discretized data in [-1, 1] under a Gaussian
    (reference ``losses.py:50``): CDF mass of the 1/255-wide bin."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    cdf_plus = approx_standard_normal_cdf(inv_stdv * (centered + 1.0 / 255))
    cdf_min = approx_standard_normal_cdf(inv_stdv * (centered - 1.0 / 255))
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12))
    log_cdf_delta = jnp.log(jnp.clip(cdf_plus - cdf_min, 1e-12))
    return jnp.where(x < -0.999, log_cdf_plus,
                     jnp.where(x > 0.999, log_one_minus_cdf_min,
                               log_cdf_delta))


class GaussianDiffusion:
    """Schedule tables + all q/p math as pure jnp methods."""

    def __init__(self, spec: DiffusionSpec,
                 use_timesteps: Optional[list[int]] = None):
        self.spec = spec
        betas = get_named_beta_schedule(spec.schedule, spec.steps)
        self.original_num_steps = spec.steps

        if use_timesteps is not None:
            # Respacing (reference SpacedDiffusion): recompute betas over the
            # retained subsequence.
            alphas_cumprod_full = np.cumprod(1.0 - betas)
            last = 1.0
            new_betas, tmap = [], []
            for i, a in enumerate(alphas_cumprod_full):
                if i in set(use_timesteps):
                    new_betas.append(1 - a / last)
                    last = a
                    tmap.append(i)
            betas = np.array(new_betas)
            self.timestep_map = jnp.asarray(tmap, jnp.int32)
        else:
            self.timestep_map = jnp.arange(spec.steps, dtype=jnp.int32)

        self.num_timesteps = len(betas)
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        acp_next = np.append(acp[1:], 0.0)

        f32 = lambda a: jnp.asarray(a, jnp.float32)
        self.betas = f32(betas)
        self.alphas_cumprod = f32(acp)
        self.alphas_cumprod_prev = f32(acp_prev)
        self.alphas_cumprod_next = f32(acp_next)
        self.sqrt_alphas_cumprod = f32(np.sqrt(acp))
        self.sqrt_one_minus_alphas_cumprod = f32(np.sqrt(1 - acp))
        self.sqrt_recip_alphas_cumprod = f32(np.sqrt(1.0 / acp))
        self.sqrt_recipm1_alphas_cumprod = f32(np.sqrt(1.0 / acp - 1))
        post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
        self.posterior_variance = f32(post_var)
        self.posterior_log_variance_clipped = f32(
            np.log(np.append(post_var[1], post_var[1:])))
        self.posterior_mean_coef1 = f32(
            betas * np.sqrt(acp_prev) / (1.0 - acp))
        self.posterior_mean_coef2 = f32(
            (1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp))

    # -- schedule lookups --------------------------------------------------

    @staticmethod
    def _extract(arr: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
        out = jnp.take(arr, t)
        return out.reshape(t.shape + (1,) * (ndim - 1))

    def scale_t(self, t):
        """Model-facing timestep (respacing map + optional rescale)."""
        mapped = jnp.take(self.timestep_map, t)
        if self.spec.rescale_timesteps:
            return mapped.astype(jnp.float32) * (1000.0
                                                 / self.original_num_steps)
        return mapped

    # -- q process ---------------------------------------------------------

    def q_sample(self, x_start, t, noise):
        return (self._extract(self.sqrt_alphas_cumprod, t, x_start.ndim)
                * x_start
                + self._extract(self.sqrt_one_minus_alphas_cumprod, t,
                                x_start.ndim) * noise)

    def q_posterior_mean_variance(self, x_start, x_t, t):
        mean = (self._extract(self.posterior_mean_coef1, t, x_t.ndim)
                * x_start
                + self._extract(self.posterior_mean_coef2, t, x_t.ndim) * x_t)
        var = self._extract(self.posterior_variance, t, x_t.ndim)
        logvar = self._extract(self.posterior_log_variance_clipped, t,
                               x_t.ndim)
        return mean, var, logvar

    # -- prediction conversions (reference :412-458) -----------------------

    def predict_xstart_from_eps(self, x_t, t, eps):
        return (self._extract(self.sqrt_recip_alphas_cumprod, t, x_t.ndim)
                * x_t
                - self._extract(self.sqrt_recipm1_alphas_cumprod, t,
                                x_t.ndim) * eps)

    def predict_eps_from_xstart(self, x_t, t, x0):
        return ((self._extract(self.sqrt_recip_alphas_cumprod, t, x_t.ndim)
                 * x_t - x0)
                / self._extract(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim))

    def predict_xstart_from_v(self, x_t, t, v):
        return (self._extract(self.sqrt_alphas_cumprod, t, x_t.ndim) * x_t
                - self._extract(self.sqrt_one_minus_alphas_cumprod, t,
                                x_t.ndim) * v)

    def predict_eps_from_v(self, x_t, t, v):
        return (self._extract(self.sqrt_alphas_cumprod, t, x_t.ndim) * v
                + self._extract(self.sqrt_one_minus_alphas_cumprod, t,
                                x_t.ndim) * x_t)

    def predict_v(self, x_start, t, noise):
        return (self._extract(self.sqrt_alphas_cumprod, t, x_start.ndim)
                * noise
                - self._extract(self.sqrt_one_minus_alphas_cumprod, t,
                                x_start.ndim) * x_start)

    # -- model output → (mean, var, x0) ------------------------------------

    def _apply_mixing(self, model_output, x_t, t, mixing_logit,
                      space: str = 'eps'):
        """LSGM mixed prediction (reference ``get_mixed_prediction``,
        ``continuous_diffusion_utils.py:748``): the learned logit blends
        the model output with the analytic denoiser of the N(0,I) prior,
        pred = (1-σ(logit))·component + σ(logit)·model_out.

        ``space`` selects the mixing component (reference
        ``gaussian_diffusion.py:548-570``):
          * 'eps': sqrt(1-ᾱ_t)·x_t — model_output must already BE eps
            (v predictions are converted to eps before mixing, reference
            ``p_mean_variance:327-348``);
          * 'x0' : sqrt(ᾱ_t)·x_t  — for START_X models.
        """
        m = jax.nn.sigmoid(mixing_logit)
        table = (self.sqrt_one_minus_alphas_cumprod if space == 'eps'
                 else self.sqrt_alphas_cumprod)
        mixing_component = self._extract(table, t, x_t.ndim) * x_t
        return (1 - m) * mixing_component + m * model_output

    def p_mean_variance(self, model_output, x, t,
                        mixing_logit: Optional[jax.Array] = None):
        """(reference ``p_mean_variance:273-349``)."""
        spec = self.spec
        B = x.shape[0]
        C_axis = -1

        if spec.var_type == 'learned_range':
            model_output, var_values = jnp.split(model_output, 2, axis=C_axis)
            min_log = self._extract(self.posterior_log_variance_clipped, t,
                                    x.ndim)
            max_log = self._extract(jnp.log(self.betas), t, x.ndim)
            frac = (var_values + 1) / 2
            model_log_variance = frac * max_log + (1 - frac) * min_log
            model_variance = jnp.exp(model_log_variance)
        elif spec.var_type == 'fixed_large':
            var = jnp.concatenate([self.posterior_variance[1:2],
                                   self.betas[1:]])
            model_variance = self._extract(var, t, x.ndim)
            model_log_variance = jnp.log(model_variance)
        else:  # fixed_small
            model_variance = self._extract(self.posterior_variance, t, x.ndim)
            model_log_variance = self._extract(
                self.posterior_log_variance_clipped, t, x.ndim)

        mean_type = spec.mean_type
        if spec.mixed_prediction and mixing_logit is not None:
            # Reference p_mean_variance:327-348: v outputs are converted
            # to eps FIRST, then mixed, and the blend is treated as eps.
            if mean_type == 'v':
                model_output = self.predict_eps_from_v(x, t, model_output)
                mean_type = 'eps'
            space = 'x0' if mean_type == 'x0' else 'eps'
            model_output = self._apply_mixing(model_output, x, t,
                                              mixing_logit, space=space)

        if mean_type == 'eps':
            x0 = self.predict_xstart_from_eps(x, t, model_output)
        elif mean_type == 'v':
            x0 = self.predict_xstart_from_v(x, t, model_output)
        else:
            x0 = model_output

        if spec.clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)

        mean, _, _ = self.q_posterior_mean_variance(x0, x, t)
        return mean, model_variance, model_log_variance, x0

    # -- variational bound (reference :1012-1177) --------------------------

    def _vb_terms_bpd(self, model_output, x_start, x_t, t,
                      mixing_logit=None):
        """One VLB term in BITS: KL(q(x_{t-1}|x_t,x0) ‖ p_θ(x_{t-1}|x_t)),
        decoder NLL at t=0 (reference ``_vb_terms_bpd:1012-1049``).
        ``model_output`` is the raw network output (both halves for
        learned_range).  Returns (output (B,), pred_xstart)."""
        true_mean, _, true_log_var = self.q_posterior_mean_variance(
            x_start, x_t, t)
        mean, _, log_var, x0 = self.p_mean_variance(
            model_output, x_t, t, mixing_logit=mixing_logit)
        ln2 = math.log(2.0)
        kl = mean_flat(normal_kl(true_mean, true_log_var, mean,
                                 log_var)) / ln2
        decoder_nll = -mean_flat(discretized_gaussian_log_likelihood(
            x_start, means=mean, log_scales=0.5 * log_var)) / ln2
        return jnp.where(t == 0, decoder_nll, kl), x0

    def prior_bpd(self, x_start):
        """KL(q(x_T|x_0) ‖ N(0,I)) in bits (reference ``_prior_bpd``)."""
        t = jnp.full((x_start.shape[0],), self.num_timesteps - 1,
                     jnp.int32)
        mean = self._extract(self.sqrt_alphas_cumprod, t,
                             x_start.ndim) * x_start
        logvar = self._extract(
            jnp.log(1.0 - self.alphas_cumprod), t, x_start.ndim)
        return mean_flat(normal_kl(mean, logvar, 0.0, 0.0)) / math.log(2.0)

    def calc_bpd_loop(self, model_fn: ModelFn, x_start, key,
                      model_kwargs=None):
        """Full-chain NLL evaluation (reference ``calc_bpd_loop:
        1110-1177``): per-timestep VLB terms + prior bpd, as one scan.

        Returns dict with total_bpd (B,), prior_bpd (B,), vb (B, T),
        mse (B, T) — columns ordered t = T-1 .. 0, matching the
        reference's descending iteration (vb[:, 0] is the LAST timestep,
        ``gaussian_diffusion.py:1205``).
        """
        model_kwargs = model_kwargs or {}
        B = x_start.shape[0]

        def one_t(key, t_scalar):
            t = jnp.full((B,), t_scalar, jnp.int32)
            noise = jax.random.normal(key, x_start.shape, x_start.dtype)
            x_t = self.q_sample(x_start, t, noise)
            out = model_fn(x_t, self.scale_t(t), **model_kwargs)
            vb, x0 = self._vb_terms_bpd(out, x_start, x_t, t)
            eps = self.predict_eps_from_xstart(x_t, t, x0)
            return vb, mean_flat(jnp.square(eps - noise)), \
                mean_flat(jnp.square(x0 - x_start))

        keys = jax.random.split(key, self.num_timesteps)
        vb, mse, xstart_mse = jax.lax.map(
            lambda args: one_t(*args),
            (keys, jnp.arange(self.num_timesteps - 1, -1, -1)))
        prior = self.prior_bpd(x_start)
        total = jnp.sum(vb, axis=0) + prior
        return {'total_bpd': total, 'prior_bpd': prior, 'vb': vb.T,
                'mse': mse.T, 'xstart_mse': xstart_mse.T}

    # -- training losses (reference :1050-1175) ----------------------------

    def training_losses(self, model_fn: ModelFn, x_start, t, key,
                        model_kwargs=None):
        model_kwargs = model_kwargs or {}
        spec = self.spec
        noise = jax.random.normal(key, x_start.shape, x_start.dtype)
        x_t = self.q_sample(x_start, t, noise)
        model_output = model_fn(x_t, self.scale_t(t), **model_kwargs)

        if spec.loss_type in ('kl', 'rescaled_kl'):
            vb, _ = self._vb_terms_bpd(model_output, x_start, x_t, t)
            loss = vb * self.num_timesteps \
                if spec.loss_type == 'rescaled_kl' else vb
            return {'loss': loss, 'vb': vb, 'x_t': x_t,
                    'model_output': model_output}

        terms = {}
        if spec.var_type == 'learned_range':
            # Learn the variance head through the VLB without letting it
            # move the mean prediction (reference :1100-1127: frozen_out
            # detaches the mean half).
            mean_out, var_values = jnp.split(model_output, 2, axis=-1)
            frozen = jnp.concatenate(
                [jax.lax.stop_gradient(mean_out), var_values], axis=-1)
            vb, _ = self._vb_terms_bpd(frozen, x_start, x_t, t)
            if spec.loss_type == 'rescaled_mse':
                vb = vb * (self.num_timesteps / 1000.0)
            terms['vb'] = vb
            model_output = mean_out

        if spec.mean_type == 'eps':
            target = noise
        elif spec.mean_type == 'v':
            target = self.predict_v(x_start, t, noise)
        else:
            target = x_start

        mse = mean_flat((target - model_output)**2)
        terms.update(mse=mse, x_t=x_t, model_output=model_output)
        terms['loss'] = mse + terms['vb'] if 'vb' in terms else mse
        return terms

    # -- samplers (single jitted scans) ------------------------------------

    def p_sample_loop(self, model_fn: ModelFn, shape, key,
                      model_kwargs=None,
                      mixing_logit: Optional[jax.Array] = None):
        """Ancestral DDPM sampling as one ``lax.scan``."""
        model_kwargs = model_kwargs or {}
        key, k0 = jax.random.split(key)
        x = jax.random.normal(k0, shape)

        def step(carry, i):
            x, key = carry
            t = jnp.full((shape[0],), self.num_timesteps - 1 - i, jnp.int32)
            out = model_fn(x, self.scale_t(t), **model_kwargs)
            mean, _, log_var, _ = self.p_mean_variance(out, x, t,
                                                       mixing_logit)
            key, k = jax.random.split(key)
            noise = jax.random.normal(k, shape)
            nonzero = (t > 0).astype(x.dtype).reshape(
                (-1,) + (1,) * (x.ndim - 1))
            x = mean + nonzero * jnp.exp(0.5 * log_var) * noise
            return (x, key), None

        (x, _), _ = jax.lax.scan(step, (x, key),
                                 jnp.arange(self.num_timesteps))
        return x

    def ddim_sample_loop(self, model_fn: ModelFn, shape, key,
                         model_kwargs=None, eta: float = 0.0,
                         mixing_logit: Optional[jax.Array] = None,
                         x_init: Optional[jax.Array] = None):
        """DDIM sampling as one ``lax.scan`` (reference :729-941)."""
        model_kwargs = model_kwargs or {}
        if x_init is None:
            key, k0 = jax.random.split(key)
            x = jax.random.normal(k0, shape)
        else:
            x = x_init

        def step(carry, i):
            x, key = carry
            t = jnp.full((shape[0],), self.num_timesteps - 1 - i, jnp.int32)
            out = model_fn(x, self.scale_t(t), **model_kwargs)
            _, _, _, x0 = self.p_mean_variance(out, x, t, mixing_logit)
            eps = self.predict_eps_from_xstart(x, t, x0)

            alpha_bar = self._extract(self.alphas_cumprod, t, x.ndim)
            alpha_bar_prev = self._extract(self.alphas_cumprod_prev, t,
                                           x.ndim)
            sigma = (eta * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
                     * jnp.sqrt(1 - alpha_bar / alpha_bar_prev))
            key, k = jax.random.split(key)
            noise = jax.random.normal(k, shape)
            mean_pred = (x0 * jnp.sqrt(alpha_bar_prev)
                         + jnp.sqrt(1 - alpha_bar_prev - sigma**2) * eps)
            nonzero = (t > 0).astype(x.dtype).reshape(
                (-1,) + (1,) * (x.ndim - 1))
            x = mean_pred + nonzero * sigma * noise
            return (x, key), None

        (x, _), _ = jax.lax.scan(step, (x, key),
                                 jnp.arange(self.num_timesteps))
        return x

    def plms_sample_loop(self, model_fn: ModelFn, shape, key,
                         model_kwargs=None,
                         mixing_logit: Optional[jax.Array] = None,
                         x_init: Optional[jax.Array] = None):
        """PLMS sampling (pseudo linear multistep, reference
        ``ldm/models/diffusion/plms.py:144-242``): the deterministic DDIM
        transfer applied to an Adams-Bashforth extrapolation over the
        last ≤4 eps evaluations; the first step substitutes a
        two-evaluation Heun-style average.

        One jitted ``lax.scan`` with a (3, *shape) eps-history carry;
        the warm-up step is unrolled outside the scan so no model call
        sits under ``lax.cond``.
        """
        model_kwargs = model_kwargs or {}
        if x_init is None:
            key, k0 = jax.random.split(key)
            x = jax.random.normal(k0, shape)
        else:
            x = x_init

        def eps_at(x, t):
            out = model_fn(x, self.scale_t(t), **model_kwargs)
            _, _, _, x0 = self.p_mean_variance(out, x, t, mixing_logit)
            return self.predict_eps_from_xstart(x, t, x0)

        def transfer(x, t, eps):
            # deterministic DDIM step with the (extrapolated) eps
            x0 = self.predict_xstart_from_eps(x, t, eps)
            alpha_bar_prev = self._extract(self.alphas_cumprod_prev, t,
                                           x.ndim)
            return (x0 * jnp.sqrt(alpha_bar_prev)
                    + jnp.sqrt(1 - alpha_bar_prev) * eps)

        # warm-up (i = 0): Heun average of eps at t and at t-1
        T = self.num_timesteps
        t0 = jnp.full((shape[0],), T - 1, jnp.int32)
        e0 = eps_at(x, t0)
        x_prov = transfer(x, t0, e0)
        e0_next = eps_at(x_prov, jnp.maximum(t0 - 1, 0))
        x = transfer(x, t0, (e0 + e0_next) / 2)
        hist = jnp.stack([e0, jnp.zeros(shape), jnp.zeros(shape)])

        def step(carry, i):
            x, hist, n = carry
            t = jnp.full((shape[0],), T - 1 - i, jnp.int32)
            e_t = eps_at(x, t)
            h0, h1, h2 = hist[0], hist[1], hist[2]
            eps_prime = jax.lax.switch(
                jnp.minimum(n, 3) - 1,
                [lambda: (3 * e_t - h0) / 2,
                 lambda: (23 * e_t - 16 * h0 + 5 * h1) / 12,
                 lambda: (55 * e_t - 59 * h0 + 37 * h1 - 9 * h2) / 24])
            x = transfer(x, t, eps_prime)
            hist = jnp.stack([e_t, h0, h1])
            return (x, hist, n + 1), None

        (x, _, _), _ = jax.lax.scan(
            step, (x, hist, jnp.int32(1)), jnp.arange(1, T))
        return x

    def ddim_reverse_sample_loop(self, model_fn: ModelFn, x, model_kwargs=None,
                                 mixing_logit=None):
        """Deterministic encoding x0 → x_T (reference
        ``ddim_reverse_sample:872``)."""
        model_kwargs = model_kwargs or {}
        shape = x.shape

        def step(carry, i):
            x = carry
            t = jnp.full((shape[0],), i, jnp.int32)
            out = model_fn(x, self.scale_t(t), **model_kwargs)
            _, _, _, x0 = self.p_mean_variance(out, x, t, mixing_logit)
            eps = ((self._extract(self.sqrt_recip_alphas_cumprod, t, x.ndim)
                    * x - x0)
                   / self._extract(self.sqrt_recipm1_alphas_cumprod, t,
                                   x.ndim))
            alpha_bar_next = self._extract(self.alphas_cumprod_next, t,
                                           x.ndim)
            x = x0 * jnp.sqrt(alpha_bar_next) \
                + jnp.sqrt(1 - alpha_bar_next) * eps
            return x, None

        x, _ = jax.lax.scan(step, x, jnp.arange(self.num_timesteps))
        return x


def make_cfg_model_fn(model_fn: ModelFn, cfg_scale: float,
                      uncond_kwargs: dict, guided_channels: int = -1):
    """Classifier-free guidance by batch doubling (reference
    ``forward_with_cfg``, ``dit/dit_models_xformers.py:915`` /
    ``ddim_sample:771-806``).

    Returns a model_fn with the same signature; internally runs cond+uncond
    in one doubled batch so the MXU stays saturated.
    ``guided_channels=-1`` guides all channels."""

    def guided(x, t, **cond_kwargs):
        xx = jnp.concatenate([x, x], axis=0)
        tt = jnp.concatenate([t, t], axis=0)
        kwargs = {}
        for k in cond_kwargs:
            u = uncond_kwargs[k]
            kwargs[k] = jax.tree_util.tree_map(
                lambda c, un: jnp.concatenate([c, un], axis=0),
                cond_kwargs[k], u)
        out = model_fn(xx, tt, **kwargs)
        cond, uncond = jnp.split(out, 2, axis=0)
        if guided_channels == -1:
            return uncond + cfg_scale * (cond - uncond)
        g = uncond[..., :guided_channels] + cfg_scale * (
            cond[..., :guided_channels] - uncond[..., :guided_channels])
        return jnp.concatenate([g, cond[..., guided_channels:]], axis=-1)

    return guided


def make_diffusion(schedule: str = 'linear', steps: int = 1000,
                   mean_type: str = 'eps', var_type: str = 'fixed_small',
                   timestep_respacing: str | None = None,
                   mixed_prediction: bool = False,
                   rescale_timesteps: bool = False,
                   loss_type: str = 'mse') -> GaussianDiffusion:
    spec = DiffusionSpec(schedule=schedule, steps=steps, mean_type=mean_type,
                         var_type=var_type, mixed_prediction=mixed_prediction,
                         rescale_timesteps=rescale_timesteps,
                         loss_type=loss_type)
    use = None
    if timestep_respacing:
        use = space_timesteps(steps, timestep_respacing)
    return GaussianDiffusion(spec, use_timesteps=use)
