"""LSGM joint trainer: denoiser + VAE trained together (ShapeNet/FFHQ).

Rewrite of ``nsr/lsgm/train_util_diffusion_lsgm_noD_joint.py``
(``TrainLoop3DDiffusionLSGMJointnoD``): the reference wraps DDPM+VAE in
one module for a single DDP instance (``JointDenoiseRecModel:48-89``) —
under pjit no wrapper is needed; the step is one jitted function over both
param trees:

  * ``prepare_ddpm`` — VPSDE ``iw_quantities`` + ``sample_q`` (:250-289);
  * ``ddpm_step`` — eps matching with the mixing-logit normal trick
    (:348-402), prior (p) objective;
  * ``ce_ddpm_step`` — joint VAE reconstruction + the vada CE (q)
    objective: per-dim −log p through the frozen prior combined with the
    posterior log q and kl-balanced (:485-620,
    ``continuous_diffusion_utils.py:231,256``);
  * ``p_rendering_step`` — render-space loss on the denoised x0
    prediction, reaching both trees (:1037-1163);
  * latent-statistics EMA monitoring (``_setup_latent_stat:60-74``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..diffusion.vpsde import (VPSDE, get_mixed_prediction, kl_balancer,
                               kl_per_group_vada, vpsde_training_losses,
                               vpsde_cross_entropy_per_dim)
from ..render.renderer import RenderOptions
from .losses import LossConfig, reconstruction_losses


@dataclasses.dataclass(frozen=True)
class LSGMConfig:
    iw_mode_p: str = 'drop_sigma2t_iw'   # prior objective t-sampling
    iw_mode_q: str = 'll_iw'             # CE t-sampling ('ll_*' only)
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

    # p_rendering re-renders through the reconstruction rays/targets, so it
    # requires the VAE branch (the reference p_rendering_step asserts
    # args.train_vae the same way).
    assert lsgm_cfg.train_vae or not lsgm_cfg.p_rendering_loss, \
        'p_rendering_loss requires train_vae'

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

        # Prior objective trains the DENOISER on detached latents
        # (reference ce_ddpm_step: ``eps_t_p = eps_t_p.detach()`` — the
        # VAE learns through the q/CE term below, not through p).  With
        # p_rendering the latent flows (reference p_rendering_step:1095
        # keeps eps attached so the render term reaches the encoder).
        ddpm_in = latent if lsgm_cfg.p_rendering_loss \
            else jax.lax.stop_gradient(latent)
        out = vpsde_training_losses(sde, eps_fn, ddpm_in, k_ddpm,
                                    mode=lsgm_cfg.iw_mode_p,
                                    mixing_logit=mixing_logit)
        p_loss = out['loss'].mean()
        total += p_loss
        metrics['p_eps_loss'] = p_loss

        if lsgm_cfg.p_rendering_loss:
            # render-space loss on the denoised x0 prediction (reference
            # ``p_rendering_step``
            # train_util_diffusion_lsgm_noD_joint.py:1037-1163: re-render
            # pred_x0 through the same decoder and supervise with the
            # reconstruction targets; grads flow to VAE AND denoiser).
            iw = out['iw']
            logsnr = sde.log_snr(iw.m_t, iw.var_t)
            pred_x0 = sde.predict_x0_from_eps(out['x_t'], out['pred_eps'],
                                              logsnr)
            planes_p = vae_model.apply(vae_vars, pred_x0,
                                       method=vae_model.decode_latent)
            planes_pv = jnp.repeat(planes_p, V, axis=0)
            pred_p = vae_model.apply(vae_vars, planes_pv, None, render_opts,
                                     patch_resolution, k_render,
                                     ray_origins=ray_o, ray_directions=ray_d,
                                     method=vae_model.render)
            p_rec_total, p_rec_terms = reconstruction_losses(
                pred_p, target, loss_cfg)
            total += p_rec_total
            metrics['p_rendering_loss'] = p_rec_total

        if lsgm_cfg.joint_ce and lsgm_cfg.train_vae:
            # q objective: VAE trained THROUGH the frozen prior — the
            # vada CE (reference ce_ddpm_step CE block :575-620 with
            # ``requires_grad(ddpm, False)``): per-dim
            # −log p = obj_weight_q·‖eps_hat − ε‖² + const, combined with
            # the posterior's log q and balanced (kl_balancer).
            k_q = jax.random.fold_in(k_ddpm, 1)
            frozen = jax.lax.stop_gradient(ddpm_vars)

            def eps_fn_q(x_t, t):
                return denoiser_model.apply(frozen, x_t, t, context)

            neg_log_p = vpsde_cross_entropy_per_dim(
                sde, eps_fn_q, latent, k_q, mode=lsgm_cfg.iw_mode_q,
                mixing_logit=None if mixing_logit is None
                else jax.lax.stop_gradient(mixing_logit))
            # posterior may keep the interleaved (z, 3) channel view — view
            # the flat latent back for the elementwise log q.
            log_q = posterior.log_p(
                latent.reshape(posterior.mean.shape)).reshape(latent.shape)
            kl_vada, _ = kl_per_group_vada(log_q, neg_log_p)
            ce_loss = kl_balancer(kl_vada[:, None],
                                  kl_coeff=lsgm_cfg.ce_balanced_kl)
            total += ce_loss
            metrics['ce_balanced_kl'] = ce_loss
            metrics['log_q'] = log_q.mean()

        # latent statistic monitoring (reference _setup_latent_stat)
        metrics['latent_mean'] = latent.mean()
        metrics['latent_std'] = latent.std()
        return total, metrics

    return loss_fn


@dataclasses.dataclass
class LSGMTrainConfig:
    lr: float = 1e-4
    weight_decay: float = 0.01
    grad_clip: float = 0.5
    ema_rate: float = 0.9999
    patch_resolution: int = 32
    render_resolution: int = 128
    microbatch_steps: int = 1
    log_interval: int = 10
    total_steps: int = 100000


class LSGMTrainer:
    """Joint VAE+denoiser loop (reference
    ``TrainLoop3DDiffusionLSGMJointnoD.run_loop`` — the ShapeNet/FFHQ
    stage-2 trainer).  One pjit step over both param trees; batches are
    VAE patch-ray batches (the denoiser trains on the live latents, not
    pre-extracted dumps)."""

    def __init__(self, vae_cfg, denoiser_model,
                 train_cfg: LSGMTrainConfig = LSGMTrainConfig(),
                 loss_cfg: LossConfig = LossConfig(),
                 lsgm_cfg: LSGMConfig = LSGMConfig(),
                 render_opts: Optional[RenderOptions] = None,
                 mesh=None, seed: int = 0, sde: Optional[VPSDE] = None):
        import numpy as np

        from ..models.vae import TriplaneVAE
        from ..parallel.mesh import MeshConfig, make_mesh

        self.vae = TriplaneVAE(vae_cfg)
        self.vae_cfg = vae_cfg
        self.denoiser = denoiser_model
        self.cfg = train_cfg
        self.loss_cfg = loss_cfg
        self.lsgm_cfg = lsgm_cfg
        self.sde = sde or VPSDE()
        self.render_opts = render_opts or RenderOptions(
            depth_resolution=48, depth_resolution_importance=48,
            ray_start='auto', ray_end='auto', box_warp=0.9,
            filter_out_of_bbox=True)
        self.mesh = mesh if mesh is not None else make_mesh(MeshConfig())
        # per-host decorrelated patch-origin rng (see VAETrainer)
        from ..parallel.mesh import host_rng
        self.rng = host_rng(seed)
        self._init_key = jax.random.PRNGKey(seed)
        self._state = None
        self._step_fn = None

    def init_state(self, example_batch):
        from .train_state import create_train_state, make_optimizer

        imgs = jnp.asarray(example_batch['img_to_encoder'])
        cams = jnp.asarray(example_batch['c'])
        # jitted inits: one compiled program instead of per-op dispatch
        # (matters on tunneled/remote chips)
        init_opts = dataclasses.replace(self.render_opts,
                                        depth_resolution=8,
                                        depth_resolution_importance=8)
        vae_vars = jax.jit(
            lambda k, im, c: self.vae.init(k, im, c, init_opts, 8,
                                           jax.random.PRNGKey(0)),
        )(self._init_key, imgs, cams)
        vae_params = vae_vars.pop('params')
        lat = jnp.zeros((1, self.vae_cfg.latent_size,
                         self.vae_cfg.latent_size,
                         self.vae_cfg.latent_channels))
        ctx = example_batch.get('context')
        ddpm_vars = jax.jit(self.denoiser.init)(jax.random.PRNGKey(1), lat,
                                                jnp.zeros((1,)), ctx)
        ddpm_params = ddpm_vars.pop('params')
        tx = make_optimizer(self.cfg.lr, self.cfg.weight_decay,
                            grad_clip=self.cfg.grad_clip)
        self._state = create_train_state(
            {'vae': vae_params, 'ddpm': ddpm_params}, tx,
            ema_rates=(('ema', self.cfg.ema_rate),),
            constants={'vae': vae_vars or None,
                       'ddpm': ddpm_vars or None})
        return self._state

    def build(self, example_batch):
        from .train_state import build_train_step

        if self._state is None:
            self.init_state(example_batch)
        loss_fn = make_joint_loss_fn(
            self.vae, self.denoiser, self.render_opts, self.loss_cfg,
            self.lsgm_cfg, self.cfg.patch_resolution,
            self.cfg.render_resolution, self.sde)
        self._step_fn = build_train_step(
            loss_fn, self.mesh, ema_rates=(('ema', self.cfg.ema_rate),),
            microbatch_steps=self.cfg.microbatch_steps)
        return self

    def prepare_batch(self, raw: dict) -> dict:
        import numpy as np

        from ..render.ray_sampler import sample_patch_origins

        cfg = self.cfg
        n = raw['c'].shape[0]
        bbox = raw.get('bbox')
        if bbox is not None:
            scale = cfg.render_resolution / self.vae_cfg.img_resolution
            bbox = (np.asarray(bbox) * scale).astype('int32')
        h0, w0 = sample_patch_origins(self.rng, n, cfg.patch_resolution,
                                      cfg.render_resolution, bbox)
        out = {k: jnp.asarray(v) for k, v in raw.items()
               if k in ('img_to_encoder', 'img', 'depth', 'depth_mask',
                        'c', 'context')}
        out['patch_h'] = jnp.asarray(h0)
        out['patch_w'] = jnp.asarray(w0)
        return out

    def run_loop(self, data, num_steps: Optional[int] = None,
                 step_offset: int = 0, guard=None):
        from ..utils import logger

        assert self._step_fn is not None, 'call build() first'
        num_steps = num_steps or self.cfg.total_steps
        state = self._state
        for i in range(num_steps):
            batch = self.prepare_batch(next(data))
            state, metrics = self._step_fn(
                state, batch,
                jax.random.fold_in(jax.random.PRNGKey(1234),
                                   step_offset + i))
            if (i + 1) % self.cfg.log_interval == 0:
                logger.log_loss_dict(
                    {k: float(v) for k, v in metrics.items()})
                logger.logkv('step', step_offset + i + 1)
                logger.dumpkvs()
            if guard is not None and guard.should_stop():
                logger.log(f'preemption signal: stopping after step '
                           f'{step_offset + i + 1}')
                break
        self._state = state
        return state
