"""Stage-2 latent-diffusion training entry.

Mirrors reference ``scripts/vit_triplane_diffusion_train.py`` /
``vit_triplane_sit_train.py``: trains a denoiser on pre-extracted VAE
latents with a conditioner; the objective ({flow_matching, ddpm, edm,
vpsde_joint}) replaces the reference's trainer-name map ({flow_matching,
adm, sgm_legacy, vpsde_*}).  ``vpsde_joint`` is the LSGM joint path
(ShapeNet/FFHQ): VAE + U-Net denoiser trained together on image batches
(reference ``TrainLoop3DDiffusionLSGMJointnoD``).  Without a latent
directory it falls back to random latents (pipeline smoke mode).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def latent_stream(latent_dir: str, batch: int, shape, context_dim: int,
                  seed: int = 0):
    import numpy as np
    rng = np.random.default_rng(seed)
    files = sorted(glob.glob(os.path.join(latent_dir, '*.npy'))) \
        if latent_dir else []
    if files:
        latents = np.concatenate(
            [np.load(f).astype(np.float32) for f in files], axis=0)
    else:
        latents = rng.standard_normal((max(batch, 8),) + tuple(shape)
                                      ).astype(np.float32)
    n = latents.shape[0]
    while True:
        idx = rng.integers(0, n, size=batch)
        yield {
            'latent': latents[idx],
            'context': {'crossattn': rng.standard_normal(
                (batch, 77, context_dim)).astype(np.float32)},
        }


def run_lsgm_joint(cfg, args):
    """LSGM joint VAE+U-Net training (reference trainer names
    ``vpsde_lsgm_joint_noD`` / ``vpsde_crossattn``)."""
    import dataclasses as _dc

    from ln3diff_tpu.data.synthetic import load_memory_data
    from ln3diff_tpu.models.unet import UNetConfig, UNetModel
    from ln3diff_tpu.training.checkpoint import CheckpointManager
    from ln3diff_tpu.training.lsgm_trainer import (LSGMTrainConfig,
                                                   LSGMTrainer)
    from ln3diff_tpu.utils import logger

    vae_cfg = cfg.vae_config()
    num_views = max(vae_cfg.num_views, 1)
    denoiser = UNetModel(UNetConfig(
        in_channels=vae_cfg.ldm_z_channels,
        out_channels=vae_cfg.ldm_z_channels,
        model_channels=int(getattr(args, 'unet_channels', 320))))
    train_cfg = LSGMTrainConfig(
        lr=cfg.lr, patch_resolution=cfg.patch_rendering_resolution,
        microbatch_steps=cfg.microbatch_steps,
        log_interval=cfg.log_interval, total_steps=cfg.total_steps)

    data = load_memory_data(cfg.batch_size, num_views,
                            vae_cfg.img_resolution,
                            train_cfg.render_resolution, seed=cfg.seed)
    trainer = LSGMTrainer(vae_cfg, denoiser, train_cfg,
                          render_opts=cfg.render_opts(), seed=cfg.seed)
    trainer.build(next(data))

    ckpt = CheckpointManager(os.path.join(cfg.logdir, 'checkpoints'))
    if cfg.resume_checkpoint:
        restored = ckpt.restore(trainer._state)
        if restored is not None:
            trainer._state = restored
            logger.log(f'resumed from step {int(restored.step)}')

    from scripts_lib import train_until
    train_until(trainer, data, cfg.total_steps, cfg.save_interval, ckpt,
                logger)
    ckpt.close()


def main():
    from ln3diff_tpu.config import (ExperimentConfig, add_config_to_argparser,
                                    add_preset_argument, args_to_config,
                                    denoiser_preset)

    parser = argparse.ArgumentParser()
    add_config_to_argparser(parser, ExperimentConfig())
    add_preset_argument(parser)
    parser.add_argument('--latent_dir', type=str, default='')
    parser.add_argument('--latent_size', type=int, default=0,
                        help='override denoiser input size (latent h=w)')
    parser.add_argument('--remat', default='dots',
                        choices=['none', 'full', 'dots'],
                        help='rematerialize scanned DiT blocks in the '
                             'backward pass (required for DiT-L/2 on a '
                             '16 GB chip: without it the saved f32 '
                             'attention scores alone need ~10 GB)')
    parser.add_argument('--denoiser_scale', default='',
                        help="override preset, e.g. 'DiT-B/2'")
    parser.add_argument('--unet_channels', type=int, default=320,
                        help='U-Net width for --objective vpsde_joint')
    parser.add_argument('--pp', type=int, default=1,
                        help='pipeline-parallel stages: shard the DiT '
                             'trunk over a `pipe` mesh axis (GPipe '
                             'schedule, parallel/pipeline.py). '
                             'Remaining devices become the data axis.')
    parser.add_argument('--pp_microbatches', type=int, default=4,
                        help='microbatches per pipelined forward; bubble '
                             'fraction (pp-1)/(n+pp-1) — use >= 4*pp')
    args = parser.parse_args()
    cfg = args_to_config(args)

    from ln3diff_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax

    from ln3diff_tpu.models.dit import DiT_TriLatent, DiTConfig
    from ln3diff_tpu.models.unet import UNetConfig, UNetModel
    from ln3diff_tpu.parallel.mesh import initialize_distributed
    from ln3diff_tpu.training.checkpoint import CheckpointManager
    from ln3diff_tpu.training.ldm_trainer import LDMTrainConfig, LDMTrainer
    from ln3diff_tpu.utils import logger

    initialize_distributed()
    logger.configure(cfg.logdir)
    with open(os.path.join(cfg.logdir, 'args.json'), 'w') as f:
        f.write(cfg.to_json())

    if cfg.objective == 'vpsde_joint':
        return run_lsgm_joint(cfg, args)

    import dataclasses as _dc
    den_cfg = denoiser_preset(cfg.denoiser)
    if args.denoiser_scale:
        from ln3diff_tpu.models.dit import dit_registry
        den_cfg = dit_registry(args.denoiser_scale,
                               input_size=den_cfg.input_size,
                               in_channels=den_cfg.in_channels)
    if args.latent_size and hasattr(den_cfg, 'input_size'):
        den_cfg = _dc.replace(den_cfg, input_size=args.latent_size)
    if isinstance(den_cfg, UNetConfig):
        model = UNetModel(den_cfg)
        latent_hw = 32
        context_dim = den_cfg.context_dim
    else:
        if args.remat != 'none':
            den_cfg = _dc.replace(den_cfg, remat=True,
                                  remat_policy=args.remat)
        model = DiT_TriLatent(den_cfg)
        latent_hw = den_cfg.input_size
        context_dim = den_cfg.context_dim

    train_cfg = LDMTrainConfig(
        objective=cfg.objective, lr=cfg.lr,
        triplane_scaling_divider=cfg.triplane_scaling_divider,
        microbatch_steps=cfg.microbatch_steps,
        pp_microbatches=args.pp_microbatches,
        log_interval=cfg.log_interval, total_steps=cfg.total_steps)

    data = latent_stream(args.latent_dir, cfg.batch_size,
                         (latent_hw, latent_hw, 12), context_dim, cfg.seed)

    mesh = None
    if args.pp > 1:
        from ln3diff_tpu.parallel.mesh import MeshConfig, make_mesh
        mesh = make_mesh(MeshConfig(pipe=args.pp))
    trainer = LDMTrainer(model, train_cfg, mesh=mesh, seed=cfg.seed)
    trainer.build(next(data))

    ckpt = CheckpointManager(os.path.join(cfg.logdir, 'checkpoints'))
    if cfg.resume_checkpoint:
        restored = ckpt.restore(trainer._state)
        if restored is not None:
            trainer._state = restored
            logger.log(f'resumed from step {int(restored.step)}')

    from scripts_lib import train_until
    train_until(trainer, data, cfg.total_steps, cfg.save_interval, ckpt,
                logger)
    ckpt.close()


if __name__ == '__main__':
    main()
