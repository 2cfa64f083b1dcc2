"""Stage-resolved full-run timing, f32 vs bf16 arms, one process.
Replicates pipeline.__call__'s interleaved schedule with host timers."""
import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ln3diff_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np
from ln3diff_tpu.config import RENDER_PRESETS, denoiser_preset, vae_preset
from ln3diff_tpu.conditioning.clip import CLIPTextModel, SimpleCLIPTokenizer
from ln3diff_tpu.diffusion.gaussian import make_diffusion
from ln3diff_tpu.models.dit import DiT_TriLatent
from ln3diff_tpu.models.vae import TriplaneVAE
from ln3diff_tpu.pipeline import SamplerSpec, TextTo3DPipeline, \
    _frames_to_uint8
from ln3diff_tpu.render.mesh import dispatch_vertex_colors, march_grid, \
    rotate_x
from ln3diff_tpu.utils.misc import cast_floating

den_cfg = dataclasses.replace(denoiser_preset('t23d-dit-l2'),
                              exact_gelu=False)
denoiser = DiT_TriLatent(den_cfg)
vae = TriplaneVAE(vae_preset('objaverse'))
text_model = CLIPTextModel()
tokenizer = SimpleCLIPTokenizer()
x0 = jnp.zeros((2, 32, 32, 12))
ctx0 = {'crossattn': jnp.zeros((2, 77, 768))}
den_vars = cast_floating(jax.jit(denoiser.init)(
    jax.random.PRNGKey(1), x0, jnp.zeros((2,)), ctx0), jnp.bfloat16)
render_opts = RENDER_PRESETS['objverse_tuneray_aug_resolution_64_64_auto']
vae_vars = vae.init(
    jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 12)), jnp.zeros((1, 25)),
    dataclasses.replace(render_opts, depth_resolution=4,
                        depth_resolution_importance=4), 8,
    method=vae.init_decoder_paths)
text_vars = jax.jit(text_model.init)(jax.random.PRNGKey(3),
                                     jnp.zeros((1, 77), jnp.int32))

pipe = TextTo3DPipeline(
    lambda p, x, t, c: denoiser.apply(p, x, t, c), den_vars,
    lambda p, l: vae.apply(p, l, method=vae.decode_latent), vae_vars,
    lambda p, planes, cam: vae.apply(
        p, planes, cam, render_opts, 192, None,
        use_fused_osg=True, method=vae.render)['image_raw'],
    lambda p, planes, coords: vae.apply(
        p, planes, coords, render_opts.box_warp, use_fused_osg=True,
        method=vae.query_points),
    sampler=SamplerSpec(kind='ddim', num_steps=250, cfg_scale=6.5),
    diffusion=make_diffusion(steps=1000, timestep_respacing='ddim250'))
encode_text = jax.jit(
    lambda v, ids: text_model.apply(v, ids)['last_hidden_state'])


def staged_run(prompt, seed, render_dtype):
    t = {}
    t0 = time.perf_counter()
    both = encode_text(text_vars, jnp.asarray(tokenizer([prompt, ''])))
    cond = {'crossattn': both[:1]}
    uncond = {'crossattn': both[1:]}
    latents = pipe.sample_latents(jax.random.PRNGKey(seed), 1, cond,
                                  uncond)
    planes = pipe._decode_jit(vae_vars, latents)
    float(jnp.sum(planes.astype(jnp.float32)))
    t['sample+decode'] = time.perf_counter() - t0

    if render_dtype is not None:
        planes = planes.astype(render_dtype)
    t1 = time.perf_counter()
    sigma_grid = pipe.dispatch_mesh_sigma(planes, 192)
    t['sigma_dispatch'] = time.perf_counter() - t1
    t1 = time.perf_counter()
    v1 = pipe.render_orbit(planes, 24, render_resolution=192,
                           frame_slice=(0, 6))
    t['head_frames_dispatch'] = time.perf_counter() - t1
    t1 = time.perf_counter()
    sigma_np = np.asarray(sigma_grid)
    t['sigma_pull'] = time.perf_counter() - t1
    t1 = time.perf_counter()
    verts, faces = march_grid(sigma_np, 192)
    t['march'] = time.perf_counter() - t1
    t1 = time.perf_counter()
    rgb_dev = dispatch_vertex_colors(pipe._mesh_decoder(planes), verts)
    t['color_dispatch'] = time.perf_counter() - t1
    t1 = time.perf_counter()
    v2 = pipe.render_orbit(planes, 24, render_resolution=192,
                           frame_slice=(6, 24))
    t['tail_frames_dispatch'] = time.perf_counter() - t1
    t1 = time.perf_counter()
    if rgb_dev is not None:
        np.asarray(rgb_dev)
    t['color_pull'] = time.perf_counter() - t1
    t1 = time.perf_counter()
    video = _frames_to_uint8(jnp.concatenate([v1, v2], axis=1))
    np.asarray(video)
    t['video_pull'] = time.perf_counter() - t1
    t['TOTAL'] = time.perf_counter() - t0
    t['nverts'] = len(verts)
    return t


for dt in (None, jnp.bfloat16):
    staged_run('a wooden chair', 0, dt)      # warm
for prompt, seed in [('a sports car', 1), ('an airplane', 2)]:
    for dt in (None, jnp.bfloat16):
        name = 'f32 ' if dt is None else 'bf16'
        t = staged_run(prompt, seed, dt)
        print(f'[{name}] ' + '  '.join(
            f'{k}={v:.2f}' if k != 'nverts' else f'{k}={v}'
            for k, v in t.items()))
