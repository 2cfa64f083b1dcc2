"""Adversarial stage-1 VAE training entry (GAN-assisted reconstruction).

Mirrors reference ``scripts/vit_triplane_cvD_train.py`` /
``vit_triplane_cvD_train_ffhq.py`` (trainer classes ``TrainLoop3DcvD*``,
``nsr/cvD/nvsD_canoD.py:50`` and the ``nv_rec_patch_mvE_disc`` trainer
name): the patch-ray VAE trainer plus a patch discriminator on rendered
vs. ground-truth views, hinge D loss + R1, adaptive generator weight
(``dnnlib.util.calculate_adaptive_weight``).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    from ln3diff_tpu.config import (ExperimentConfig, add_config_to_argparser,
                                    args_to_config)

    parser = argparse.ArgumentParser()
    add_config_to_argparser(parser, ExperimentConfig())
    parser.add_argument('--num_views', type=int, default=4)
    parser.add_argument('--encoder_resolution', type=int, default=256)
    parser.add_argument('--render_resolution', type=int, default=128)
    parser.add_argument('--disc_lr', type=float, default=2e-4)
    parser.add_argument('--r1_gamma', type=float, default=1.0)
    parser.add_argument('--disc_weight', type=float, default=0.1,
                        help='generator adversarial loss weight '
                             '(reference --lambda_adv)')
    parser.add_argument('--disc_type', default='stylegan',
                        choices=['stylegan', 'vision_aided'],
                        help='vision_aided = frozen-CLIP multilevel D '
                             '(reference vision_aided_loss cvD, '
                             'nsr/train_util_cvD.py:98; backbone is '
                             'randomly initialized offline — see '
                             'training/vision_aided.py)')
    args = parser.parse_args()
    cfg = args_to_config(args)

    from ln3diff_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import dataclasses

    from ln3diff_tpu.data.synthetic import load_memory_data
    from ln3diff_tpu.models.stylegan import DiscriminatorConfig
    from ln3diff_tpu.parallel.mesh import initialize_distributed
    from ln3diff_tpu.training.checkpoint import CheckpointManager
    from ln3diff_tpu.training.gan import AdversarialHead, GANConfig
    from ln3diff_tpu.training.losses import LossConfig
    from ln3diff_tpu.training.vae_trainer import VAETrainConfig, VAETrainer
    from ln3diff_tpu.utils import logger

    initialize_distributed()
    logger.configure(cfg.logdir)
    with open(os.path.join(cfg.logdir, 'args.json'), 'w') as f:
        f.write(cfg.to_json())

    base_cfg = cfg.vae_config()
    latent_size = args.encoder_resolution // 8
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

    if args.disc_type == 'vision_aided':
        from ln3diff_tpu.training.vision_aided import (VisionAidedConfig,
                                                       VisionAidedHead)
        adv = VisionAidedHead(
            VisionAidedConfig(disc_lr=args.disc_lr,
                              adv_lambda=args.disc_weight),
            seed=cfg.seed)
    else:
        adv = AdversarialHead(
            GANConfig(disc=DiscriminatorConfig(
                          img_resolution=cfg.patch_rendering_resolution),
                      disc_lr=args.disc_lr, r1_gamma=args.r1_gamma,
                      adv_lambda=args.disc_weight),
            seed=cfg.seed)

    data = load_memory_data(cfg.batch_size, args.num_views,
                            args.encoder_resolution, args.render_resolution,
                            seed=cfg.seed)

    trainer = VAETrainer(model_cfg, train_cfg, LossConfig(),
                         render_opts=cfg.render_opts(), seed=cfg.seed,
                         adversarial=adv)
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
