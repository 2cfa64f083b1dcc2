"""Stage-1 VAE trainer: patch-ray multi-view reconstruction training.

TPU-native rewrite of the reference VAE trainer stack
(``nsr/train_util.py:50-507`` base, ``nsr/train_nv_util.py:675-860``
``TrainLoop3DRecNVPatchSingleForward[MV]`` — patch-ray sampling, fg-bbox
crops, multi-view roll supervision) collapsed into one pjit train step:

  * the V input views of each instance are encoded into ONE latent; all V
    views are rendered back from it and supervised — this subsumes the
    reference's "roll" novel-view supervision (every rendered view is a
    novel view w.r.t. the pooled latent);
  * patch rendering: the trainer renders ``patch_resolution²`` rays at
    host-sampled fg-biased patch origins (reference ``PatchRaySampler``)
    and supervises against dynamic GT crops (``lax.dynamic_slice``);
  * grad accumulation / DDP / EMA via ``train_state.build_train_step``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vae import TriplaneVAE, TriplaneVAEConfig
from ..parallel.mesh import make_mesh, MeshConfig
from ..render.ray_sampler import (sample_patch_origins, sample_patch_rays,
                                  unpack_25d_camera)
from ..render.renderer import RenderOptions
from ..utils import logger
from .losses import LossConfig, reconstruction_losses
from .train_state import (TrainState, build_train_step, create_train_state,
                          make_optimizer)


@dataclasses.dataclass(frozen=True)
class VAETrainConfig:
    lr: float = 1e-4
    weight_decay: float = 0.01
    grad_clip: float = 0.5
    ema_rate: float = 0.9999
    batch_instances: int = 1          # instances per step (per host)
    patch_resolution: int = 32        # patch-ray size (reference 32-64)
    render_resolution: int = 128      # full supervision resolution
    microbatch_steps: int = 1
    # which views the render loss supervises (reference
    # TrainLoop3DRecNVPatch* supervises held-out nv_* views only):
    # 'nv' = held-out novel views when the batch carries them,
    # 'input' = encoder input views, 'both' = concatenation.
    supervise_views: str = 'nv'
    # per-submodule learning rates (reference AdamW param groups,
    # nsr/train_util.py — e.g. --vit_decoder_lr): top-level param
    # subtree name → lr.
    lr_groups: tuple = ()
    # route the render's point pipeline through the fused Pallas kernel
    # (fwd + custom-VJP bwd, ops/fused_render.py) — the training-path
    # analogue of the serving fusion.  TPU only (CPU falls back to the
    # identical jnp math automatically).  Default off: at patch-32
    # training shapes the kernel grid is too small to pipeline and it
    # measures slower than the jnp path (161.3 vs 154.4 ms/step on v5e,
    # docs/TPU_PERF_NOTES.md); opt in for full-frame fine-tunes.
    use_fused_osg: bool = False
    log_interval: int = 10
    save_interval: int = 10000
    total_steps: int = 100000


def _crop(img, h0, w0, size):
    """Dynamic per-sample crop, vmapped. img: (B,H,W,C), h0/w0: (B,)."""
    def one(im, h, w):
        return jax.lax.dynamic_slice(
            im, (h, w, 0), (size, size, im.shape[-1]))
    return jax.vmap(one)(img, h0, w0)


class VAETrainer:
    """Owns model/state/step; drives the loop (reference ``run_loop``)."""

    def __init__(self, model_cfg: TriplaneVAEConfig,
                 train_cfg: VAETrainConfig = VAETrainConfig(),
                 loss_cfg: LossConfig = LossConfig(),
                 render_opts: Optional[RenderOptions] = None,
                 mesh=None, seed: int = 0,
                 lpips_fn=None, adversarial=None):
        self.model = TriplaneVAE(model_cfg)
        self.model_cfg = model_cfg
        self.cfg = train_cfg
        self.loss_cfg = loss_cfg
        self.render_opts = render_opts or RenderOptions(
            depth_resolution=48, depth_resolution_importance=48,
            ray_start='auto', ray_end='auto', box_warp=0.9,
            filter_out_of_bbox=True)
        self.mesh = mesh if mesh is not None else make_mesh(MeshConfig())
        # host-side patch-origin rng: per-host decorrelated — on a pod
        # every process feeds its own batch shard, so identical origins
        # would crop the same window on every host (reference: per-rank
        # DataLoader rngs decorrelate implicitly).
        from ..parallel.mesh import host_rng
        self.rng = host_rng(seed)
        self.lpips_fn = lpips_fn
        # optional AdversarialHead (reference nv_rec_patch_mvE_disc /
        # E3DGE_with_AdvLoss): D trains on (GT patch, rendered patch).
        self.adversarial = adversarial

        self._state = None
        self._step_fn = None
        self._init_key = jax.random.PRNGKey(seed)

    # -- state -------------------------------------------------------------

    def init_state(self, example_batch) -> TrainState:
        imgs = jnp.asarray(example_batch['img_to_encoder'])
        cams = jnp.asarray(example_batch['c'])
        # jit the init: eager flax init dispatches thousands of tiny ops
        # one-by-one — minutes over a tunneled/remote chip vs ~seconds
        # as one compiled program.
        init_opts = dataclasses.replace(self.render_opts,
                                        depth_resolution=8,
                                        depth_resolution_importance=8)
        variables = jax.jit(
            lambda k, im, c: self.model.init(k, im, c, init_opts, 8,
                                             jax.random.PRNGKey(0)),
        )(self._init_key, imgs, cams)
        params = variables.pop('params')
        tx = make_optimizer(self.cfg.lr, self.cfg.weight_decay,
                            grad_clip=self.cfg.grad_clip,
                            lr_groups=dict(self.cfg.lr_groups) or None)
        self._state = create_train_state(
            params, tx, ema_rates=(('ema', self.cfg.ema_rate),),
            constants=variables)
        return self._state

    # -- the jitted step ---------------------------------------------------

    def _loss_fn(self, params, constants, batch, rng):
        cfg = self.cfg
        model = self.model
        opts = self.render_opts
        patch = cfg.patch_resolution

        k_vae, k_render = jax.random.split(rng)
        variables = {'params': params, **(constants or {})}

        imgs = batch['img_to_encoder']        # (B*V, H, W, 10)

        moments = model.apply(variables, imgs, method=model.encode)
        latent, posterior = model.apply(
            variables, moments, k_vae, True, method=model.reparameterize)
        planes = model.apply(variables, latent, method=model.decode_latent)
        B = planes.shape[0]

        # Supervision views: held-out novel views when the batch carries
        # the paired nv_* schema (reference train_nv_util.py:675-860 —
        # the rendered views are never the encoder's inputs), else the
        # input views back from the pooled latent.
        use_nv = 'nv_c' in batch and cfg.supervise_views != 'input'
        sources = []
        if use_nv:
            sources.append('nv_')
        if not use_nv or cfg.supervise_views == 'both':
            sources.append('')

        def render_and_target(prefix):
            cams = batch[f'{prefix}c']
            h0 = batch[f'{prefix}patch_h']
            w0 = batch[f'{prefix}patch_w']
            n = cams.shape[0] // B
            planes_v = jnp.repeat(planes, n, axis=0)
            cam2world, intrinsics = unpack_25d_camera(cams)
            ray_o, ray_d = sample_patch_rays(cam2world, intrinsics, h0, w0,
                                             patch, cfg.render_resolution)
            pred = model.apply(variables, planes_v, None, opts, patch,
                               k_render, ray_origins=ray_o,
                               ray_directions=ray_d,
                               use_fused_osg=cfg.use_fused_osg,
                               method=model.render)
            target = {
                'img': _crop(batch[f'{prefix}img'], h0, w0, patch),
                'depth': _crop(batch[f'{prefix}depth'][..., None], h0, w0,
                               patch),
                'depth_mask': _crop(batch[f'{prefix}depth_mask'][..., None],
                                    h0, w0, patch),
            }
            return pred, target

        preds, targets = zip(*(render_and_target(p) for p in sources))
        pred = {k: jnp.concatenate([p[k] for p in preds])
                for k in preds[0]}
        target = {k: jnp.concatenate([t[k] for t in targets])
                  for k in targets[0]}
        total, terms = reconstruction_losses(
            pred, target, self.loss_cfg, kl=posterior.kl(),
            step=batch.get('step'), lpips_fn=self.lpips_fn)
        if self.adversarial is not None:
            g_adv = self.adversarial.generator_loss(pred['image_raw'])
            total = total + g_adv
            terms = dict(terms, g_adv=g_adv)
        return total, {k: v for k, v in terms.items()}

    def build(self, example_batch):
        if self._state is None:
            self.init_state(example_batch)
        self._step_fn = build_train_step(
            self._loss_fn, self.mesh,
            ema_rates=(('ema', self.cfg.ema_rate),),
            microbatch_steps=self.cfg.microbatch_steps)
        return self

    def _disc_step(self, state, batch):
        """One discriminator update on (GT patch, rendered patch)."""
        cfg = self.cfg
        variables = {'params': state.params, **(state.constants or {})}
        model = self.model
        patch = cfg.patch_resolution
        moments = model.apply(variables, batch['img_to_encoder'],
                              method=model.encode)
        latent, _ = model.apply(variables, moments, None, False,
                                method=model.reparameterize)
        planes = model.apply(variables, latent, method=model.decode_latent)
        BV = batch['c'].shape[0]
        V = BV // planes.shape[0]
        planes_v = jnp.repeat(planes, V, axis=0)
        cam2world, intrinsics = unpack_25d_camera(batch['c'])
        ray_o, ray_d = sample_patch_rays(cam2world, intrinsics,
                                         batch['patch_h'], batch['patch_w'],
                                         patch, cfg.render_resolution)
        fake = model.apply(variables, planes_v, None, self.render_opts,
                           patch, None, ray_origins=ray_o,
                           ray_directions=ray_d,
                           use_fused_osg=cfg.use_fused_osg,
                           method=model.render)['image_raw']
        real = _crop(batch['img'], batch['patch_h'], batch['patch_w'],
                     patch)
        return self.adversarial.disc_step(real, fake)

    # -- host-side batch prep ---------------------------------------------

    def prepare_batch(self, raw: dict) -> dict:
        """Sample fg-biased patch origins (host RNG → static shapes) for
        the input views and, when present, the paired nv_* views."""
        cfg = self.cfg
        keep = ('img_to_encoder', 'img', 'depth', 'depth_mask', 'c',
                'nv_img', 'nv_depth', 'nv_depth_mask', 'nv_c')
        out = {k: jnp.asarray(v) for k, v in raw.items() if k in keep}
        for prefix in ('', 'nv_'):
            if f'{prefix}c' not in raw:
                continue
            n = raw[f'{prefix}c'].shape[0]
            # bbox convention: render-resolution coords (PostProcess /
            # make_multiview_batch both emit these).
            bbox = raw.get(f'{prefix}bbox')
            if bbox is not None:
                bbox = np.asarray(bbox, np.int32)
            h0, w0 = sample_patch_origins(self.rng, n, cfg.patch_resolution,
                                          cfg.render_resolution, bbox)
            out[f'{prefix}patch_h'] = jnp.asarray(h0)
            out[f'{prefix}patch_w'] = jnp.asarray(w0)
        return out

    # -- loop --------------------------------------------------------------

    def run_loop(self, data: Iterator[dict], num_steps: Optional[int] = None,
                 step_offset: int = 0, eval_fn=None,
                 eval_interval: int = 0, guard=None):
        """eval_fn(state, step) is the in-training visual-eval hook
        (reference eval_novelview_loop / log_control_images cadence).
        guard: optional ``preemption.PreemptionGuard`` — stop at the
        next step boundary once a preemption signal lands."""
        assert self._step_fn is not None, 'call build() first'
        num_steps = num_steps or self.cfg.total_steps
        state = self._state
        for i in range(num_steps):
            raw = next(data)
            batch = self.prepare_batch(raw)
            # live step for the KL-anneal schedule (losses.kl_coeff)
            batch['step'] = jnp.asarray(step_offset + i, jnp.float32)
            state, metrics = self._step_fn(
                state, batch, jax.random.fold_in(
                    jax.random.PRNGKey(1234), step_offset + i))
            if self.adversarial is not None:
                d_metrics = self._disc_step(state, batch)
                metrics = dict(metrics, **d_metrics)
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
