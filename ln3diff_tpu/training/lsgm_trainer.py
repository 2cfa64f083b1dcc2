"""LSGM joint trainer: denoiser + VAE trained together (ShapeNet/FFHQ).

Rewrite of ``nsr/lsgm/train_util_diffusion_lsgm_noD_joint.py``
(``TrainLoop3DDiffusionLSGMJointnoD``): the reference wraps DDPM+VAE in
one module for a single DDP instance (``JointDenoiseRecModel:48-89``) —
under pjit no wrapper is needed; the step is one jitted function over both
param trees:

  * ``prepare_ddpm`` — VPSDE ``iw_quantities`` + ``sample_q`` (:250-289);
  * ``ddpm_step`` — eps matching with the mixing-logit normal trick
    (:348-402), prior (p) objective;
  * ``ce_ddpm_step`` — joint VAE reconstruction + cross-entropy (q)
    objective + negative entropy (:485);
  * latent-statistics EMA monitoring (``_setup_latent_stat:60-74``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..diffusion.vpsde import (VPSDE, get_mixed_prediction,
                               vpsde_training_losses)
from ..render.renderer import RenderOptions
from .losses import LossConfig, reconstruction_losses


@dataclasses.dataclass(frozen=True)
class LSGMConfig:
    iw_mode_p: str = 'drop_sigma2t_iw'   # prior objective t-sampling
    iw_mode_q: str = 'll_iw'             # joint CE objective t-sampling
    p_rendering_loss: bool = False       # render-space loss on pred x0
    joint_ce: bool = True                # train VAE through the prior
    ce_balanced_kl: float = 1.0
    train_vae: bool = True


def make_joint_loss_fn(vae_model, denoiser_model, render_opts: RenderOptions,
                       loss_cfg: LossConfig, lsgm_cfg: LSGMConfig,
                       patch_resolution: int, render_resolution: int,
                       sde: VPSDE = VPSDE()):
    """Build the single jitted joint loss:
    params = {'vae': ..., 'ddpm': ...} (+ constants alike).

    batch: the VAE patch-ray batch (img_to_encoder, img, depth, depth_mask,
    c, patch_h, patch_w) + optional 'context' for the denoiser.
    """
    from ..render.ray_sampler import sample_patch_rays, unpack_25d_camera

    def loss_fn(params, constants, batch, rng):
        k_vae, k_render, k_ddpm = jax.random.split(rng, 3)
        vae_vars = {'params': params['vae'],
                    **(constants.get('vae') or {})}
        ddpm_vars = {'params': params['ddpm'],
                     **(constants.get('ddpm') or {})}

        # ---- VAE encode → latent -----------------------------------------
        moments = vae_model.apply(vae_vars, batch['img_to_encoder'],
                                  method=vae_model.encode)
        latent, posterior = vae_model.apply(
            vae_vars, moments, k_vae, True,
            method=vae_model.reparameterize)

        metrics = {}
        total = 0.0

        # ---- reconstruction (q) term -------------------------------------
        if lsgm_cfg.train_vae:
            planes = vae_model.apply(vae_vars, latent,
                                     method=vae_model.decode_latent)
            BV = batch['c'].shape[0]
            V = BV // planes.shape[0]
            planes_v = jnp.repeat(planes, V, axis=0)
            cam2world, intrinsics = unpack_25d_camera(batch['c'])
            ray_o, ray_d = sample_patch_rays(
                cam2world, intrinsics, batch['patch_h'], batch['patch_w'],
                patch_resolution, render_resolution)
            pred = vae_model.apply(vae_vars, planes_v, None, render_opts,
                                   patch_resolution, k_render,
                                   ray_origins=ray_o, ray_directions=ray_d,
                                   method=vae_model.render)

            def crop(img):
                def one(im, h, w):
                    return jax.lax.dynamic_slice(
                        im, (h, w, 0),
                        (patch_resolution, patch_resolution, im.shape[-1]))
                return jax.vmap(one)(img, batch['patch_h'],
                                     batch['patch_w'])

            target = {
                'img': crop(batch['img']),
                'depth': crop(batch['depth'][..., None]),
                'depth_mask': crop(batch['depth_mask'][..., None]),
            }
            rec_total, rec_terms = reconstruction_losses(
                pred, target, loss_cfg, kl=posterior.kl())
            total += rec_total
            metrics.update({f'rec_{k}': v for k, v in rec_terms.items()})

        # ---- DDPM prior (p) term with mixing logit -----------------------
        mixing_logit = params['ddpm'].get('mixing_logit')
        context = batch.get('context')

        def eps_fn(x_t, t):
            return denoiser_model.apply(ddpm_vars, x_t, t, context)

        ddpm_in = jax.lax.stop_gradient(latent) if not lsgm_cfg.joint_ce \
            else latent
        out = vpsde_training_losses(sde, eps_fn, ddpm_in, k_ddpm,
                                    mode=lsgm_cfg.iw_mode_p,
                                    mixing_logit=mixing_logit)
        p_loss = out['loss'].mean()
        total += p_loss
        metrics['p_eps_loss'] = p_loss

        if lsgm_cfg.joint_ce:
            # negative encoder entropy (q objective, reference ce_ddpm_step)
            neg_entropy = -posterior.normal_entropy().mean()
            total += lsgm_cfg.ce_balanced_kl * neg_entropy
            metrics['neg_entropy'] = neg_entropy

        # latent statistic monitoring (reference _setup_latent_stat)
        metrics['latent_mean'] = latent.mean()
        metrics['latent_std'] = latent.std()
        return total, metrics

    return loss_fn
