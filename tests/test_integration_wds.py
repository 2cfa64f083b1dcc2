"""Full data-path integration: shard creation → PostProcess → VAE trainer
step (the production training data flow, end to end on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from ln3diff_tpu.data.objaverse import PostProcess
from ln3diff_tpu.data.synthetic import make_multiview_batch
from ln3diff_tpu.data.wds import ShardWriter, load_wds_data
from ln3diff_tpu.models.dit import DiT2Config
from ln3diff_tpu.models.vae import TriplaneVAEConfig
from ln3diff_tpu.parallel.mesh import MeshConfig, make_mesh
from ln3diff_tpu.render.renderer import RenderOptions
from ln3diff_tpu.training.losses import LossConfig
from ln3diff_tpu.training.vae_trainer import VAETrainConfig, VAETrainer


def test_shards_to_train_step(tmp_path):
    # 1. create shards from synthetic instances
    writer = ShardWriter(str(tmp_path / 'objv-%06d.tar'), maxcount=4)
    for i in range(3):
        b = make_multiview_batch(num_views=2, resolution=32,
                                 render_resolution=32, seed=i)
        writer.write(f'{i:06d}', {
            'rgb.npy': ((b['img_hr'] + 1) / 2).astype(np.float32),
            'depth.npy': b['depth'].astype(np.float32),
            'alpha.npy': b['depth_mask'].astype(np.float32),
            'c.npy': b['c'],
            'caption.txt': f'sphere {i}',
        })
    writer.close()

    # 2. wds pipeline with the G-Objaverse PostProcess
    pp = PostProcess(reso_encoder=32, reso_render=16, num_views_input=2)
    it = load_wds_data(writer.paths, batch_size=1, transform=pp,
                       shuffle_buffer=2, seed=0)
    raw = next(it)
    # batch of 1 instance with V=2 views: collate added a leading axis
    assert raw['img_to_encoder'].shape == (1, 2, 32, 32, 10)

    def flatten_views(r):
        return {
            'img_to_encoder': r['img_to_encoder'].reshape(-1, 32, 32, 10),
            'img': r['img'].reshape(-1, 16, 16, 3),
            'depth': r['depth'].reshape(-1, 16, 16),
            'depth_mask': r['depth_mask'].reshape(-1, 16, 16),
            'c': r['c'].reshape(-1, 25),
            'bbox': r['bbox'].reshape(-1, 4),
        }

    # 3. one VAE train step on the shard batch
    cfg = TriplaneVAEConfig(
        encoder_in_channels=10, encoder_ch=8, encoder_ch_mult=(1, 2),
        encoder_res_blocks=1, img_resolution=32, num_views=2,
        ldm_z_channels=4, latent_size=16,
        dit2=DiT2Config(tokens_per_plane=64, hidden_size=32, depth=2,
                        num_heads=2, dtype=jnp.float32),
        patch_size=2, conv_sr_ch=8, conv_sr_ch_mult=(1, 2),
        conv_sr_res_blocks=1, plane_channels=8, decoder_output_dim=8,
        dtype=jnp.float32)
    trainer = VAETrainer(
        cfg, VAETrainConfig(patch_resolution=8, render_resolution=16),
        LossConfig(lpips_lambda=0.0),
        render_opts=RenderOptions(depth_resolution=4,
                                  depth_resolution_importance=4,
                                  box_warp=1.0),
        mesh=make_mesh(MeshConfig(data=1), devices=jax.devices()[:1]))
    flat = flatten_views(raw)
    trainer.build(flat)
    batch = trainer.prepare_batch(flat)
    state, metrics = trainer._step_fn(trainer._state, batch,
                                      jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics['loss']))
