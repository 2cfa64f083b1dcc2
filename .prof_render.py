import sys, os, dataclasses
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ln3diff_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax
import jax.numpy as jnp
from ln3diff_tpu.config import RENDER_PRESETS, vae_preset
from ln3diff_tpu.models.vae import TriplaneVAE
from ln3diff_tpu.render.camera import orbit_cameras
from scripts.scripts_lib.profile_device import profile_fn

vae = TriplaneVAE(vae_preset('objaverse'))
opts = RENDER_PRESETS['objverse_tuneray_aug_resolution_64_64_auto']
vars_ = vae.init(
    jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 12)), jnp.zeros((1, 25)),
    dataclasses.replace(opts, depth_resolution=4,
                        depth_resolution_importance=4), 8,
    method=vae.init_decoder_paths)
planes = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 256, 256, 32),
                           jnp.float32) * 0.3
cam = jnp.asarray(orbit_cameras(1, 1.8, 30.0, 20.0))

render = jax.jit(lambda p, pl, c: vae.apply(
    p, pl, c, opts, 192, None, use_fused_osg=True,
    method=vae.render)['image_raw'])
rows = profile_fn(lambda: render(vars_, planes.astype(jnp.bfloat16), cam), iters=10, top=18,
                  quiet=True)
for total_us, count, name, long_name in rows:
    print(f'== {name}  {total_us/count:.1f} us/call x{count}')
    print(long_name[:700])
    print()
