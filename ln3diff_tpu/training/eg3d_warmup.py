"""EG3D warm-up trainer: distill a frozen EG3D generator into the VAE.

Rebuild of the reference ``TrainLoop3DRecEG3D``
(``nsr/train_util_with_eg3d.py:33-382``): a pretrained EG3D
``TriPlaneGenerator`` acts as a frozen teacher — each step samples
z ~ N(0, I) and a camera, renders the teacher with truncation ψ=0.7 and
zeroed pose-conditioning (``run_G``, ``:88-133``), and supervises the
VAE (student) on the synthetic batch:

- 2D reconstruction: L2 on the rendered image + depth
  (the reference's ``loss_class`` 2D terms);
- shape: SmoothL1 between teacher/student densities at shared query
  coordinates (``calc_shape_rec_loss``, ``losses/builder.py:599-643``;
  lambdas ``script_util.py:1053-1055``) — here the coords are uniform
  box samples, replacing the reference's renderer-internal
  coarse/fine-coord plumbing (same supervision, static shapes);
- feature: MSE between teacher and student triplanes × 0.1
  (``loss_feature_volume``, ``train_util_with_eg3d.py:293-296`` — the
  planes ARE the feature volume both models decode from);
- w-code: MSE between the teacher's final w and the student's learned
  SR style ``sr_ws`` × 0.1 (``loss_ws`` vs ``sr_w_code``, ``:298-301``),
  when the student carries a StyleGAN SR head.

TPU-first: one jitted step, teacher params as non-donated constants
(frozen — no optimizer state), student state donated, cameras sampled
host-side (static shapes), coords via traced ``jax.random``.

Offline note: pretrained EG3D weights ship as torch-pickle ``.pkl``
(legacy persistence) and are unavailable here; the trainer accepts any
teacher param pytree (e.g. from ``training/checkpoint.py``), and runs
with a random-init teacher for tests/smoke.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.eg3d import TriPlaneGenerator, TriPlaneGeneratorConfig
from ..models.vae import TriplaneVAE, TriplaneVAEConfig
from ..render.camera import fov_to_intrinsics, gaussian_pose
from ..render.renderer import RenderOptions
from ..utils import logger
from .train_state import TrainState, create_train_state, make_optimizer


@dataclasses.dataclass(frozen=True)
class WarmupConfig:
    lr: float = 2e-4
    weight_decay: float = 0.01
    grad_clip: Optional[float] = 0.5
    ema_rate: float = 0.9999
    batch_size: int = 4
    render_resolution: int = 64
    truncation_psi: float = 0.7          # run_G, train_util_with_eg3d.py:117
    num_shape_points: int = 4096         # σ-supervision coords per item
    lambda_img: float = 1.0
    lambda_depth: float = 0.5
    lambda_shape: float = 0.005          # shape_uniform_lambda
    lambda_plane: float = 0.1            # loss_feature_volume weight
    lambda_ws: float = 0.1               # loss_ws weight
    # FFHQ-style pose distribution (reference eval/pose sampling)
    cam_radius: float = 2.7
    cam_fov: float = 18.837
    cam_h_stddev: float = 0.3
    cam_v_stddev: float = 0.155
    log_interval: int = 10
    total_steps: int = 10001


def smooth_l1(pred, target, beta: float = 1.0):
    """torch.nn.SmoothL1Loss (the reference ``criterion3d_rec``)."""
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


class EG3DWarmupTrainer:
    """Frozen-teacher distillation loop (reference ``TrainLoop3DRecEG3D``)."""

    def __init__(self, model_cfg: TriplaneVAEConfig,
                 gen_cfg: TriPlaneGeneratorConfig = TriPlaneGeneratorConfig(),
                 warm_cfg: WarmupConfig = WarmupConfig(),
                 render_opts: Optional[RenderOptions] = None,
                 teacher_params=None, seed: int = 0, model=None):
        # model: any TriplaneVAE-API module (TriplaneVAE / ShapeNetVAE /
        # FFHQVAE — the reference warm-up targets the FFHQ arch)
        self.model = TriplaneVAE(model_cfg) if model is None else model
        self.model_cfg = model_cfg
        # encoder input geometry differs between the conv-encoder config
        # (img_resolution/encoder_in_channels) and the DINOv2 ViT configs
        self.enc_res = getattr(model_cfg, 'img_resolution', 0) \
            or model_cfg.encoder_vit.img_size
        self.enc_ch = getattr(model_cfg, 'encoder_in_channels', 3)
        self.gen = TriPlaneGenerator(gen_cfg)
        self.gen_cfg = gen_cfg
        self.cfg = warm_cfg
        self.opts = render_opts or RenderOptions(
            depth_resolution=48, depth_resolution_importance=48,
            ray_start=2.25, ray_end=3.3, box_warp=1.0, white_back=False)
        self.rng = np.random.default_rng([seed, jax.process_index()])
        self._seed = seed

        key = jax.random.PRNGKey(seed)
        k_gen, k_vae = jax.random.split(key)
        B = warm_cfg.batch_size
        cam = jnp.asarray(self._sample_cameras(B))
        z = jnp.zeros((B, gen_cfg.z_dim))
        c = jnp.zeros((B, gen_cfg.c_dim))
        init_opts = dataclasses.replace(self.opts, depth_resolution=8,
                                        depth_resolution_importance=8)
        # keep the FULL teacher variables: truncation ψ<1 reads the
        # tracked w_avg from the 'stats' collection at apply time
        if teacher_params is None:
            self.teacher_variables = jax.jit(
                lambda k: self.gen.init(k, z, cam, init_opts, 8, c))(k_gen)
        else:
            # caller brings the params — build only the structure (zeros
            # w_avg etc.) without paying the full generator init
            shapes = jax.eval_shape(
                lambda k: self.gen.init(k, z, cam, init_opts, 8, c), k_gen)
            self.teacher_variables = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), shapes)
            self.teacher_params = teacher_params

        imgs = jnp.zeros((B, self.enc_res, self.enc_res, self.enc_ch))
        variables = jax.jit(
            lambda k: self.model.init(k, imgs, cam, init_opts, 8,
                                      jax.random.PRNGKey(0)))(k_vae)
        params = variables.pop('params')
        tx = make_optimizer(warm_cfg.lr, warm_cfg.weight_decay,
                            grad_clip=warm_cfg.grad_clip)
        self.state = create_train_state(
            params, tx, ema_rates=(('ema', warm_cfg.ema_rate),),
            constants=variables)
        self._step_fn = None

    @property
    def teacher_params(self):
        """Teacher 'params' collection (checkpoint-loader target)."""
        return self.teacher_variables['params']

    @teacher_params.setter
    def teacher_params(self, params):
        self.teacher_variables = dict(self.teacher_variables, params=params)

    def load_teacher_state_dict(self, flat_sd, prefix: str = 'G_ema.'):
        """Install a REAL teacher from a torch-named flat state dict —
        the output of ``utils/legacy_pkl.legacy_pkl_to_npz`` on a legacy
        EG3D ``.pkl``.  Runs the torch→jax converter and installs both
        the params and the tracked ``w_avg`` (without it, ψ<1 would
        truncate toward the zero vector instead of the teacher's mean)."""
        from ..conditioning.convert_ln3diff import convert_eg3d_generator
        params, stats = convert_eg3d_generator(flat_sd, prefix)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        tv = dict(self.teacher_variables, params=params)
        if stats:
            tv['stats'] = jax.tree_util.tree_map(jnp.asarray, stats)
        self.teacher_variables = tv

    # -- host-side camera sampling ------------------------------------------

    def _sample_cameras(self, batch_size: int) -> np.ndarray:
        cfg = self.cfg
        cam2world = gaussian_pose(
            self.rng, np.pi / 2, np.pi / 2,
            horizontal_stddev=cfg.cam_h_stddev,
            vertical_stddev=cfg.cam_v_stddev,
            radius=cfg.cam_radius, batch_size=batch_size)
        intr = fov_to_intrinsics(cfg.cam_fov)
        c25 = np.concatenate(
            [cam2world.reshape(batch_size, 16),
             np.tile(intr.reshape(1, 9), (batch_size, 1))], axis=1)
        return c25.astype(np.float32)

    # -- the jitted step ------------------------------------------------------

    def _loss_fn(self, params, teacher, constants, camera25, rng):
        cfg = self.cfg
        res = cfg.render_resolution
        B = camera25.shape[0]
        k_z, k_pts, k_vae = jax.random.split(rng, 3)

        # teacher forward — zeroed pose conditioning, ψ=0.7 (run_G)
        z = jax.random.normal(k_z, (B, self.gen_cfg.z_dim))
        c0 = jnp.zeros((B, self.gen_cfg.c_dim))
        t_out = self.gen.apply(
            teacher, z, camera25, self.opts, res, c0,
            truncation_psi=cfg.truncation_psi, return_ws=True)
        t_out = jax.lax.stop_gradient(t_out)

        # student forward: encode the teacher's render, decode, re-render
        # the same camera (rec_model(img=pool(img), c=c), :232-235)
        enc_res = self.enc_res
        enc_in = t_out['image_raw']
        if enc_res != res:
            enc_in = jax.image.resize(enc_in, (B, enc_res, enc_res, 3),
                                      'bilinear')
        s_out = self.model.apply(
            {'params': params, **constants}, enc_in, camera25, self.opts,
            res, k_vae)

        losses = {
            'img': jnp.mean((s_out['image_raw'] - t_out['image_raw'])**2),
            'depth': smooth_l1(s_out['image_depth'], t_out['image_depth']),
        }

        # σ at shared uniform box coords (calc_shape_rec_loss)
        half = self.opts.box_warp / 2.0
        coords = jax.random.uniform(
            k_pts, (B, cfg.num_shape_points, 3), minval=-half, maxval=half)
        _, sigma_t = self.gen.apply(teacher, t_out['planes'],
                                    coords, self.opts.box_warp,
                                    method=TriPlaneGenerator.query_points)
        _, sigma_s = self.model.apply(
            {'params': params, **constants}, s_out['planes'], coords,
            self.opts.box_warp, method=self.model.query_points)
        losses['shape'] = smooth_l1(sigma_s,
                                    jax.lax.stop_gradient(sigma_t))

        # triplane feature match (loss_feature_volume)
        if cfg.lambda_plane > 0:
            s_planes = s_out['planes']
            if self.model_cfg.use_background:
                s_planes = s_planes[..., :s_planes.shape[-1] // 2]
            losses['plane'] = jnp.mean((s_planes - t_out['planes'])**2)

        # w-code match (loss_ws vs sr_w_code)
        if cfg.lambda_ws > 0 and 'sr_ws' in params:
            losses['ws'] = jnp.mean(
                (params['sr_ws'][None] - t_out['ws'][:, -1])**2)

        weights = {'img': cfg.lambda_img, 'depth': cfg.lambda_depth,
                   'shape': cfg.lambda_shape, 'plane': cfg.lambda_plane,
                   'ws': cfg.lambda_ws}
        total = sum(weights[k] * v for k, v in losses.items())
        metrics = dict(losses, loss=total)
        return total, metrics

    def build(self):
        def step(state: TrainState, teacher, camera25, rng):
            (_, metrics), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True)(
                    state.params, teacher, state.constants, camera25, rng)
            new_state = state.apply_gradients(
                grads=grads, ema_rates=(('ema', self.cfg.ema_rate),))
            metrics['grad_norm'] = optax_global_norm(grads)
            return new_state, metrics

        self._step_fn = jax.jit(step, donate_argnums=(0,))
        return self._step_fn

    def run_loop(self, num_steps: Optional[int] = None, ckpt=None,
                 save_interval: int = 0, guard=None):
        if self._step_fn is None:
            self.build()
        cfg = self.cfg
        num_steps = num_steps or cfg.total_steps
        for i in range(num_steps):
            cam = jnp.asarray(self._sample_cameras(cfg.batch_size))
            self.state, metrics = self._step_fn(
                self.state, self.teacher_variables, cam,
                jax.random.fold_in(jax.random.PRNGKey(self._seed), i))
            if (i + 1) % cfg.log_interval == 0:
                logger.log_loss_dict(
                    {k: float(v) for k, v in metrics.items()})
                logger.logkv('step', i + 1)
                logger.dumpkvs()
            if ckpt is not None and save_interval \
                    and (i + 1) % save_interval == 0:
                ckpt.save(i + 1, self.state)
            if guard is not None and guard.should_stop():
                logger.log(f'preemption: stopping after step {i + 1}')
                break
        return self.state


def optax_global_norm(tree) -> jax.Array:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))
