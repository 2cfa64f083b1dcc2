"""ControlNet fine-tuning entry (reference
``scripts/vit_triplane_cldm_train.py``): freeze a pre-trained LDM U-Net,
train the zero-conv ControlNet branch on hint-conditioned latents.

Without ``--unet_ckpt`` the U-Net is random-init (pipeline smoke mode);
hints default to synthetic depth renders when no shard source is given.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--logdir', default='/tmp/ln3diff-cldm')
    parser.add_argument('--denoiser', default='shapenet-unet')
    parser.add_argument('--unet_ckpt', default='')
    parser.add_argument('--lr', type=float, default=1e-5)
    parser.add_argument('--batch_size', type=int, default=4)
    parser.add_argument('--total_steps', type=int, default=100)
    parser.add_argument('--log_interval', type=int, default=10)
    parser.add_argument('--triplane_scaling_divider', type=float,
                        default=1.0)
    parser.add_argument('--seed', type=int, default=0)
    args = parser.parse_args()

    from ln3diff_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from ln3diff_tpu.config import denoiser_preset
    from ln3diff_tpu.models.controlnet import ControlNet
    from ln3diff_tpu.models.unet import UNetModel
    from ln3diff_tpu.training.checkpoint import load_numpy_checkpoint
    from ln3diff_tpu.training.ldm_trainer import (ControlNetTrainer,
                                                  LDMTrainConfig)
    from ln3diff_tpu.utils import logger

    logger.configure(args.logdir)
    cfg = denoiser_preset(args.denoiser)
    unet = UNetModel(cfg)

    B = args.batch_size
    lat = jnp.zeros((B, 32, 32, 12))
    ctx = jnp.zeros((B, 77, cfg.context_dim))
    unet_vars = jax.jit(unet.init)(jax.random.PRNGKey(1), lat,
                                   jnp.zeros((B,)), ctx)
    unet_params = unet_vars['params']
    if args.unet_ckpt:
        unet_params = load_numpy_checkpoint(args.unet_ckpt)

    trainer = ControlNetTrainer(
        unet, ControlNet(cfg), unet_params,
        LDMTrainConfig(objective='ddpm', lr=args.lr,
                       triplane_scaling_divider=
                       args.triplane_scaling_divider,
                       log_interval=args.log_interval), seed=args.seed)

    rng = np.random.default_rng(args.seed)

    def data():
        while True:
            yield {
                'latent': rng.standard_normal(
                    (B, 32, 32, 12)).astype(np.float32),
                'context': {'crossattn': rng.standard_normal(
                    (B, 77, cfg.context_dim)).astype(np.float32)},
                'hint': rng.standard_normal(
                    (B, 32, 32, 3)).astype(np.float32),
            }

    it = data()
    trainer.build(next(it))
    trainer.run_loop(it, num_steps=args.total_steps)
    print('controlnet training done')


if __name__ == '__main__':
    main()
