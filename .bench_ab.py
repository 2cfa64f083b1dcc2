"""A/B: full text->mesh wall with render_dtype f32 vs bf16, alternating
runs in ONE process so tunnel drift hits both arms equally."""
import sys, os, time, tempfile, dataclasses
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
from ln3diff_tpu.pipeline import SamplerSpec, TextTo3DPipeline
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


def make_pipe(render_dtype):
    return TextTo3DPipeline(
        lambda p, x, t, c: denoiser.apply(p, x, t, c), den_vars,
        lambda p, l: vae.apply(p, l, method=vae.decode_latent), vae_vars,
        lambda p, planes, cam: vae.apply(
            p, planes, cam, render_opts, 192, None,
            use_fused_osg=True, method=vae.render)['image_raw'],
        lambda p, planes, coords: vae.apply(
            p, planes, coords, render_opts.box_warp, use_fused_osg=True,
            method=vae.query_points),
        sampler=SamplerSpec(kind='ddim', num_steps=250, cfg_scale=6.5),
        diffusion=make_diffusion(steps=1000, timestep_respacing='ddim250'),
        render_dtype=render_dtype)


pipes = {'f32': make_pipe(None), 'bf16': make_pipe(jnp.bfloat16)}
encode_text = jax.jit(
    lambda v, ids: text_model.apply(v, ids)['last_hidden_state'])


def run(pipe, prompt, seed):
    t0 = time.perf_counter()
    both = encode_text(text_vars, jnp.asarray(tokenizer([prompt, ''])))
    cond = {'crossattn': both[:1]}
    uncond = {'crossattn': both[1:]}
    with tempfile.TemporaryDirectory() as td:
        out = pipe(jax.random.PRNGKey(seed), cond, uncond, batch=1,
                   num_frames=24, mesh_path=os.path.join(td, 'm.obj'),
                   mesh_grid=192, render_resolution=192, video_uint8=True)
        np.asarray(out['video'])
    return time.perf_counter() - t0


for name, pipe in pipes.items():
    run(pipe, 'a wooden chair', 0)          # warm both arms
prompts = [('a sports car', 1), ('an airplane', 2), ('a ceramic vase', 3)]
walls = {'f32': [], 'bf16': []}
for prompt, seed in prompts:
    for name in ('f32', 'bf16'):
        walls[name].append(run(pipes[name], prompt, seed))
for name, ws in walls.items():
    print(f'{name}: min {min(ws):.2f}  all ' +
          ' '.join(f'{w:.2f}' for w in ws))
