"""Stage-1 VAE training entry.

Mirrors reference ``scripts/vit_triplane_train.py:46-348``: builds the
3D VAE, the data stream and the patch-ray reconstruction trainer; the
``--overfitting`` flag selects the in-memory single-instance dataset
(reference ``load_memory_data``).  ``--inference`` runs the novel-view
eval loop and optionally dumps latents for stage-2 (reference
``eval_novelview_loop(save_latent=True)``, ``nsr/train_nv_util.py:1177``).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    from ln3diff_tpu.config import (ExperimentConfig, add_config_to_argparser,
                                    add_preset_argument, args_to_config)

    parser = argparse.ArgumentParser()
    add_config_to_argparser(parser, ExperimentConfig())
    add_preset_argument(parser)
    parser.add_argument('--overfitting', default=True,
                        type=lambda s: str(s).lower() in ('1', 'true'))
    parser.add_argument('--inference', default=False,
                        type=lambda s: str(s).lower() in ('1', 'true'))
    parser.add_argument('--save_latent', default=False,
                        type=lambda s: str(s).lower() in ('1', 'true'))
    parser.add_argument('--num_views', type=int, default=4)
    parser.add_argument('--encoder_resolution', type=int, default=256)
    parser.add_argument('--render_resolution', type=int, default=128)
    args = parser.parse_args()
    cfg = args_to_config(args)

    from ln3diff_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import dataclasses
    import numpy as np
    import jax

    from ln3diff_tpu.data.synthetic import load_memory_data
    from ln3diff_tpu.parallel.mesh import initialize_distributed, make_mesh
    from ln3diff_tpu.training.checkpoint import CheckpointManager
    from ln3diff_tpu.training.losses import LossConfig
    from ln3diff_tpu.training.vae_trainer import VAETrainConfig, VAETrainer
    from ln3diff_tpu.utils import logger

    initialize_distributed()
    logger.configure(cfg.logdir)
    with open(os.path.join(cfg.logdir, 'args.json'), 'w') as f:
        f.write(cfg.to_json())

    base_cfg = cfg.vae_config()
    latent_size = args.encoder_resolution // 8  # SD encoder /8 downsample
    model_cfg = dataclasses.replace(
        base_cfg, num_views=args.num_views,
        img_resolution=args.encoder_resolution, latent_size=latent_size,
        dit2=dataclasses.replace(
            base_cfg.dit2,
            tokens_per_plane=(latent_size // base_cfg.patch_size)**2))
    train_cfg = VAETrainConfig(
        lr=cfg.lr, patch_resolution=cfg.patch_rendering_resolution,
        render_resolution=args.render_resolution,
        microbatch_steps=cfg.microbatch_steps,
        log_interval=cfg.log_interval, save_interval=cfg.save_interval,
        total_steps=cfg.total_steps)

    data = load_memory_data(cfg.batch_size, args.num_views,
                            args.encoder_resolution, args.render_resolution,
                            seed=cfg.seed)

    trainer = VAETrainer(model_cfg, train_cfg, LossConfig(),
                         render_opts=cfg.render_opts(), seed=cfg.seed)
    example = next(data)
    trainer.build(example)

    ckpt = CheckpointManager(os.path.join(cfg.logdir, 'checkpoints'))
    if cfg.resume_checkpoint:
        restored = ckpt.restore(trainer._state)
        if restored is not None:
            trainer._state = restored
            logger.log(f'resumed from step {int(restored.step)}')

    if args.inference:
        from scripts_lib.eval_vae import eval_novelview_loop
        eval_novelview_loop(trainer, data, cfg,
                            save_latent=args.save_latent)
        return

    from scripts_lib import train_until
    train_until(trainer, data, cfg.total_steps, cfg.save_interval, ckpt,
                logger)
    ckpt.close()


if __name__ == '__main__':
    main()
