"""Stage-2 latent-diffusion trainer: one loop, three objectives.

TPU-native replacement for the reference's trainer-class explosion
(``nsr/lsgm/flow_matching_trainer.py:303`` FM, ``sgm_DiffusionEngine.py:210``
EDM, ``train_util_diffusion_lsgm_noD_joint.py:250-489`` VPSDE/DDPM): the
objective is a config choice; the step trains on pre-extracted VAE latents
(÷ ``triplane_scaling_divider``) with a conditioner providing context
embeddings (ucg dropout handled by the conditioner), pjit over the mesh.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.edm import DiscreteDenoiser, edm_training_loss
from ..diffusion.gaussian import GaussianDiffusion, make_diffusion
from ..diffusion.transport import Transport, TransportSpec
from ..parallel.mesh import make_mesh, MeshConfig
from ..utils import logger
from .train_state import (TrainState, build_train_step, create_train_state,
                          make_optimizer)


@dataclasses.dataclass(frozen=True)
class LDMTrainConfig:
    objective: str = 'flow_matching'   # 'flow_matching' | 'ddpm' | 'edm'
    lr: float = 1e-4
    weight_decay: float = 0.01
    grad_clip: float = 0.5
    ema_rate: float = 0.9999
    triplane_scaling_divider: float = 0.96806   # reference objaverse value
    # ddpm objective options
    schedule: str = 'linear'
    diffusion_steps: int = 1000
    mean_type: str = 'v'
    var_type: str = 'fixed_small'     # 'learned_range' trains the VLB head
    loss_type: str = 'mse'            # 'rescaled_mse' = hybrid MSE+VLB
    # 'uniform' | 'loss-second-moment' (reference --schedule_sampler lognormal
    # analog: importance-sample t ∝ sqrt(E[loss²]), resample.py)
    schedule_sampler: str = 'uniform'
    microbatch_steps: int = 1
    # pipeline parallelism (mesh 'pipe' axis > 1, DiT denoisers only):
    # microbatches flowing through the GPipe schedule per forward
    # (parallel/pipeline.py).  Bubble = (pp-1)/(pp_microbatches+pp-1);
    # per-stage batch shard must divide evenly.
    pp_microbatches: int = 4
    log_interval: int = 10
    total_steps: int = 1000000


class LDMTrainer:
    """model_fn: (params, constants, x, t, context) -> prediction."""

    def __init__(self, model, train_cfg: LDMTrainConfig = LDMTrainConfig(),
                 mesh=None, seed: int = 0,
                 conditioner: Optional[Callable] = None):
        self.model = model
        self.cfg = train_cfg
        self.mesh = mesh if mesh is not None else make_mesh(MeshConfig())
        self.conditioner = conditioner
        # pipeline parallelism: route the DiT trunk through the GPipe
        # schedule whenever the mesh carries a real 'pipe' axis.  The
        # embed/head and every other objective component stay GSPMD-auto.
        self._use_pp = self.mesh.shape.get('pipe', 1) > 1
        if self._use_pp:
            from ..models.dit import DiT_TriLatent
            assert isinstance(model, DiT_TriLatent), (
                'pipeline parallelism drives the scan-stacked DiT trunk; '
                f'got {type(model).__name__}')
        self._init_key = jax.random.PRNGKey(seed)
        self._state = None
        self._step_fn = None

        if train_cfg.objective == 'ddpm':
            self.diffusion = make_diffusion(
                schedule=train_cfg.schedule, steps=train_cfg.diffusion_steps,
                mean_type=train_cfg.mean_type, var_type=train_cfg.var_type,
                loss_type=train_cfg.loss_type)
            if train_cfg.schedule_sampler == 'loss-second-moment':
                # works with grad accumulation too: t is drawn for the
                # FULL (microbatch_steps · micro_bs) batch and shaped
                # (S, micro_bs) so the scan slices per-microbatch
                # timesteps; the per-sample loss feedback rides the
                # metrics dict stacked (train_state exempts 'per_sample*'
                # keys from the scan mean-collapse).
                from ..diffusion.resample import LossSecondMomentResampler
                self.resampler = LossSecondMomentResampler(
                    self.diffusion.num_timesteps)
                # per-host decorrelated: each host importance-samples t
                # for its own batch shard (reference resample.py draws
                # per-rank; the loss history syncs via all_gather there,
                # here via update_with_losses on host-local losses)
                from ..parallel.mesh import host_rng
                self._resampler_rng = host_rng(seed)
            else:
                self.resampler = None
        elif train_cfg.objective == 'edm':
            self.denoiser = DiscreteDenoiser(num_idx=1000, scaling='eps')
        else:
            self.transport = Transport(TransportSpec())

    def init_state(self, example_batch):
        if self.cfg.microbatch_steps > 1:
            # batches arrive pre-shaped (S, micro_bs, ...) for the grad-
            # accumulation scan — init on one microbatch slice.
            example_batch = jax.tree_util.tree_map(
                lambda v: v[0] if jnp.ndim(v) >= 2 else v, example_batch)
        x = jnp.asarray(example_batch['latent'])
        t = jnp.zeros((x.shape[0],))
        ctx = example_batch['context']
        # jitted init: one compiled program instead of per-op dispatch
        # (matters on tunneled/remote chips)
        variables = jax.jit(self.model.init)(self._init_key, x, t, ctx)
        params = variables.pop('params')
        if self._use_pp:
            # lay the stacked trunk out pipe-sharded from step 0 so each
            # stage holds (and the optimizer/EMA update) only its own
            # depth/pp layer slice — no per-step re-gather of the stack.
            from ..parallel.mesh import pipeline_parallel_rules
            params = jax.device_put(
                params, pipeline_parallel_rules(params, self.mesh))
        tx = make_optimizer(self.cfg.lr, self.cfg.weight_decay,
                            grad_clip=self.cfg.grad_clip)
        self._state = create_train_state(
            params, tx, ema_rates=(('ema', self.cfg.ema_rate),),
            constants=variables)
        return self._state

    def _loss_fn(self, params, constants, batch, rng):
        cfg = self.cfg
        x0 = batch['latent'] / cfg.triplane_scaling_divider
        ctx = batch['context']

        def model_fn(xt, t, **kw):
            variables = {'params': params, **(constants or {})}
            if self._use_pp:
                from ..parallel.pipeline import dit_pipeline_apply
                return dit_pipeline_apply(
                    self.model, variables, xt, t, ctx, mesh=self.mesh,
                    n_micro=cfg.pp_microbatches,
                    remat=getattr(self.model.cfg, 'remat', False))
            return self.model.apply(variables, xt, t, ctx)

        if cfg.objective == 'flow_matching':
            out = self.transport.training_losses(model_fn, x0, rng)
            loss = out['loss'].mean()
            return loss, {'fm_mse': loss}
        if cfg.objective == 'ddpm':
            k_t, k_n = jax.random.split(rng)
            if 't' in batch:
                # importance-sampled timesteps from the host-side
                # resampler (reference schedule_sampler); weights undo
                # the sampling bias.
                t, t_w = batch['t'], batch['t_weights']
            else:
                t = jax.random.randint(k_t, (x0.shape[0],), 0,
                                       self.diffusion.num_timesteps)
                t_w = 1.0
            out = self.diffusion.training_losses(model_fn, x0, t, k_n)
            loss = (t_w * out['loss']).mean()
            metrics = {'ddpm_mse': out.get('mse', out['loss']).mean()}
            if 'vb' in out:
                metrics['vb'] = out['vb'].mean()
            if 't' in batch:
                metrics['per_sample_loss'] = \
                    jax.lax.stop_gradient(out['loss'])
            return loss, metrics
        # edm
        def network(xt, c_noise, cond):
            return model_fn(xt, c_noise.astype(jnp.float32))
        loss = edm_training_loss(self.denoiser, network, x0, rng, ctx).mean()
        return loss, {'edm_mse': loss}

    def build(self, example_batch):
        if self._state is None:
            self.init_state(example_batch)
        self._step_fn = build_train_step(
            self._loss_fn, self.mesh,
            ema_rates=(('ema', self.cfg.ema_rate),),
            microbatch_steps=self.cfg.microbatch_steps)
        return self

    def run_loop(self, data: Iterator[dict], num_steps: int,
                 step_offset: int = 0, eval_fn=None,
                 eval_interval: int = 0, guard=None):
        """eval_fn(state, step): in-training sampling eval hook
        (reference eval_cldm cadence).  guard: optional
        ``preemption.PreemptionGuard`` — stop at the next step boundary
        once a preemption signal lands."""
        assert self._step_fn is not None, 'call build() first'
        state = self._state
        resampler = getattr(self, 'resampler', None)
        for i in range(num_steps):
            batch = {k: jnp.asarray(v) if not isinstance(v, dict) else
                     jax.tree_util.tree_map(jnp.asarray, v)
                     for k, v in next(data).items()}
            if resampler is not None:
                # latent is (B, h, w, C) or, under grad accumulation,
                # (S, micro_bs, h, w, C) — draw t for every sample and
                # shape it to match so the microbatch scan slices it.
                lead = batch['latent'].shape[:1] \
                    if self.cfg.microbatch_steps == 1 \
                    else batch['latent'].shape[:2]
                n = int(np.prod(lead))
                t_np, w_np = resampler.sample(self._resampler_rng, n)
                batch['t'] = jnp.asarray(t_np).reshape(lead)
                batch['t_weights'] = jnp.asarray(w_np).reshape(lead)
            state, metrics = self._step_fn(
                state, batch,
                jax.random.fold_in(jax.random.PRNGKey(42), step_offset + i))
            if resampler is not None:
                resampler.update_with_losses(
                    t_np, np.asarray(metrics.pop('per_sample_loss')))
            if (i + 1) % self.cfg.log_interval == 0:
                logger.log_loss_dict(
                    {k: float(v) for k, v in metrics.items()})
                logger.logkv('step', step_offset + i + 1)
                logger.dumpkvs()
            if eval_fn is not None and eval_interval \
                    and (i + 1) % eval_interval == 0:
                self._state = state
                eval_fn(state, step_offset + i + 1)
            if guard is not None and guard.should_stop():
                logger.log(f'preemption signal: stopping after step '
                           f'{step_offset + i + 1}')
                break
        self._state = state
        return state


class ControlNetTrainer(LDMTrainer):
    """Hint-conditioned fine-tuning (reference
    ``scripts/vit_triplane_cldm_train.py`` +
    ``nsr/lsgm/crossattn_cldm_objv.py:775`` ControlNet subclass): a
    frozen pre-trained U-Net plus a trainable ControlNet branch whose
    zero-conv residuals are added to the U-Net skips.

    Only the ControlNet params train — the U-Net weights live in the
    optimizer-free ``constants`` tree (the reference freezes via
    ``requires_grad(False)``; under jit we simply keep them out of
    ``params``).  Batches carry 'latent', 'context' and 'hint'
    (B, H, W, C control image).
    """

    def __init__(self, unet_model, controlnet_model, unet_params,
                 train_cfg: LDMTrainConfig = LDMTrainConfig(
                     objective='ddpm'),
                 mesh=None, seed: int = 0):
        super().__init__(unet_model, train_cfg, mesh=mesh, seed=seed)
        assert train_cfg.objective == 'ddpm', \
            'reference cldm trains the DDPM objective'
        self.controlnet = controlnet_model
        self._unet_params = unet_params

    def init_state(self, example_batch):
        from .train_state import create_train_state, make_optimizer

        x = jnp.asarray(example_batch['latent'])
        t = jnp.zeros((x.shape[0],))
        ctx = example_batch['context']
        hint = jnp.asarray(example_batch['hint'])
        cn_vars = jax.jit(self.controlnet.init)(
            self._init_key, x, hint, t,
            ctx.get('crossattn') if isinstance(ctx, dict) else ctx)
        params = cn_vars.pop('params')
        tx = make_optimizer(self.cfg.lr, self.cfg.weight_decay,
                            grad_clip=self.cfg.grad_clip)
        self._state = create_train_state(
            params, tx, ema_rates=(('ema', self.cfg.ema_rate),),
            constants={'unet': self._unet_params, **cn_vars})
        return self._state

    def _loss_fn(self, params, constants, batch, rng):
        cfg = self.cfg
        x0 = batch['latent'] / cfg.triplane_scaling_divider
        ctx = batch['context']
        hint = batch['hint']
        crossattn = ctx.get('crossattn') if isinstance(ctx, dict) else ctx
        frozen_unet = jax.lax.stop_gradient(constants['unet'])

        def model_fn(xt, t, **kw):
            controls = self.controlnet.apply({'params': params}, xt, hint,
                                             t, crossattn)
            return self.model.apply({'params': frozen_unet}, xt, t,
                                    crossattn, control=controls)

        k_t, k_n = jax.random.split(rng)
        t = jax.random.randint(k_t, (x0.shape[0],), 0,
                               self.diffusion.num_timesteps)
        out = self.diffusion.training_losses(model_fn, x0, t, k_n)
        loss = out['loss'].mean()
        return loss, {'cldm_mse': loss}
