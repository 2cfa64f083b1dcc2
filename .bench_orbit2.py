import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from ln3diff_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from ln3diff_tpu.config import RENDER_PRESETS, vae_preset
from ln3diff_tpu.models.vae import TriplaneVAE
from ln3diff_tpu.pipeline import TextTo3DPipeline

vae_cfg = vae_preset('objaverse-s')
vae = TriplaneVAE(vae_cfg)
render_opts = RENDER_PRESETS['objverse_tuneray_aug_resolution_64_64_auto']
vae_vars = vae.init(
    jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 12)), jnp.zeros((1, 25)),
    dataclasses.replace(render_opts, depth_resolution=4,
                        depth_resolution_importance=4), 8,
    method=vae.init_decoder_paths)

planes = vae.apply(vae_vars, jax.random.normal(
    jax.random.PRNGKey(0), (1, 32, 32, 12)), method=vae.decode_latent)
float(jnp.sum(planes))


def render_fn(p, pl, cam):
    return vae.apply(p, pl, cam, render_opts, 128, None,
                     use_fused_osg=True, method=vae.render)['image_raw']


def render_rays_fn(p, pl, o, d):
    return vae.apply(p, pl, o, d, render_opts, True,
                     method=vae.render_rays_flat)


base = TextTo3DPipeline(None, None, None, vae_vars, render_fn, None)
folded = TextTo3DPipeline(None, None, None, vae_vars, render_fn, None,
                          render_rays_fn=render_rays_fn)

for name, pipe in (('per-frame', base), ('ray-folded', folded)):
    v = pipe.render_orbit(planes, 24, render_resolution=128)
    float(jnp.sum(v))
    t0 = time.perf_counter()
    v = pipe.render_orbit(planes, 24, render_resolution=128)
    float(jnp.sum(v))
    print(f'{name}: {time.perf_counter() - t0:.3f} s', flush=True)

a = np.asarray(base.render_orbit(planes, 24, render_resolution=128))
b = np.asarray(folded.render_orbit(planes, 24, render_resolution=128))
print('max|Δ|', np.abs(a - b).max(), flush=True)
