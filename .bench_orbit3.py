"""192^2 orbit, bf16 planes: frames_per_call 1 vs 2 (same process)."""
import dataclasses, time, sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ln3diff_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np
from ln3diff_tpu.config import RENDER_PRESETS, vae_preset
from ln3diff_tpu.models.vae import TriplaneVAE
from ln3diff_tpu.pipeline import TextTo3DPipeline

vae = TriplaneVAE(vae_preset('objaverse'))
render_opts = RENDER_PRESETS['objverse_tuneray_aug_resolution_64_64_auto']
vae_vars = vae.init(
    jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 12)), jnp.zeros((1, 25)),
    dataclasses.replace(render_opts, depth_resolution=4,
                        depth_resolution_importance=4), 8,
    method=vae.init_decoder_paths)
planes = vae.apply(vae_vars, jax.random.normal(
    jax.random.PRNGKey(0), (1, 32, 32, 12)), method=vae.decode_latent)
planes = planes.astype(jnp.bfloat16)
float(jnp.sum(planes.astype(jnp.float32)))

def render_fn(p, pl, cam):
    return vae.apply(p, pl, cam, render_opts, 192, None,
                     use_fused_osg=True, method=vae.render)['image_raw']

pipe = TextTo3DPipeline(None, None, None, vae_vars, render_fn, None)

for fpc in (1, 2, 4):
    try:
        v = pipe.render_orbit(planes, 24, render_resolution=192,
                              frames_per_call=fpc)
        float(jnp.sum(v.astype(jnp.float32)))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            v = pipe.render_orbit(planes, 24, render_resolution=192,
                                  frames_per_call=fpc)
            float(jnp.sum(v.astype(jnp.float32)))
            best = min(best, time.perf_counter() - t0)
        print(f'frames_per_call={fpc}: {best:.3f} s', flush=True)
    except Exception as e:
        print(f'frames_per_call={fpc}: FAILED {type(e).__name__}: '
              f'{str(e)[:200]}', flush=True)
