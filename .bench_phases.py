"""Phase-level timing of the text→mesh path (where do the 3.99s go?)."""
import dataclasses
import os
import tempfile
import time

import numpy as np

from ln3diff_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from ln3diff_tpu.config import RENDER_PRESETS, denoiser_preset, vae_preset
from ln3diff_tpu.conditioning.clip import CLIPTextModel, SimpleCLIPTokenizer
from ln3diff_tpu.diffusion.gaussian import make_diffusion
from ln3diff_tpu.models.dit import DiT_TriLatent
from ln3diff_tpu.models.vae import TriplaneVAE
from ln3diff_tpu.pipeline import SamplerSpec, TextTo3DPipeline

render_resolution, num_frames, mesh_grid = 128, 24, 128
den_cfg = denoiser_preset('t23d-dit-l2')
denoiser = DiT_TriLatent(den_cfg)
vae_cfg = vae_preset('objaverse-s')
vae = TriplaneVAE(vae_cfg)
text_model = CLIPTextModel()
tokenizer = SimpleCLIPTokenizer()

x0 = jnp.zeros((2, 32, 32, 12))
ctx0 = {'crossattn': jnp.zeros((2, 77, 768))}
den_vars = jax.jit(denoiser.init)(jax.random.PRNGKey(1), x0,
                                  jnp.zeros((2,)), ctx0)
render_opts = RENDER_PRESETS['objverse_tuneray_aug_resolution_64_64_auto']
vae_vars = vae.init(
    jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 12)), jnp.zeros((1, 25)),
    dataclasses.replace(render_opts, depth_resolution=4,
                        depth_resolution_importance=4), 8,
    method=vae.init_decoder_paths)
text_vars = jax.jit(text_model.init)(jax.random.PRNGKey(3),
                                     jnp.zeros((1, 77), jnp.int32))

pipeline = TextTo3DPipeline(
    lambda p, x, t, c: denoiser.apply(p, x, t, c), den_vars,
    lambda p, l: vae.apply(p, l, method=vae.decode_latent), vae_vars,
    lambda p, planes, cam: vae.apply(
        p, planes, cam, render_opts, render_resolution, None,
        use_fused_osg=True, method=vae.render)['image_raw'],
    lambda p, planes, coords: vae.apply(
        p, planes, coords, render_opts.box_warp, use_fused_osg=True,
        method=vae.query_points),
    sampler=SamplerSpec(kind='ddim', num_steps=250, cfg_scale=6.5),
    diffusion=make_diffusion(steps=1000, timestep_respacing='ddim250'))

encode_text = jax.jit(
    lambda v, ids: text_model.apply(v, ids)['last_hidden_state'])


def phases(prompt, seed):
    t = {}
    t0 = time.perf_counter()
    cond = {'crossattn': encode_text(text_vars,
                                     jnp.asarray(tokenizer([prompt])))}
    uncond = {'crossattn': encode_text(text_vars,
                                       jnp.asarray(tokenizer([''])))}
    np.asarray(cond['crossattn'])
    t['text'] = time.perf_counter() - t0

    t0 = time.perf_counter()
    latents = pipeline.sample_latents(jax.random.PRNGKey(seed), 1, cond,
                                      uncond)
    np.asarray(latents)
    t['sample250'] = time.perf_counter() - t0

    t0 = time.perf_counter()
    planes = pipeline._decode_jit(vae_vars, latents / 0.96806)
    np.asarray(planes[..., :1])
    t['decode'] = time.perf_counter() - t0

    t0 = time.perf_counter()
    video = pipeline.render_orbit(planes, num_frames,
                                  render_resolution=render_resolution)
    np.asarray(video[..., :1])
    t['orbit24'] = time.perf_counter() - t0

    t0 = time.perf_counter()
    with tempfile.TemporaryDirectory() as td:
        pipeline.export_mesh(planes, os.path.join(td, 'm.obj'),
                             grid_size=mesh_grid)
    t['mesh'] = time.perf_counter() - t0
    return t


phases('warmup prompt', 0)
for p, s in (('a sports car', 1), ('an airplane', 2)):
    t = phases(p, s)
    total = sum(t.values())
    print({k: round(v, 3) for k, v in t.items()}, 'total',
          round(total, 3), flush=True)
