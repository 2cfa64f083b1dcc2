import time

import jax
import jax.numpy as jnp
import numpy as np

from ln3diff_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from ln3diff_tpu.ops.fused_render import FusedOSG
from ln3diff_tpu.render import renderer as R
from ln3diff_tpu.render.camera import orbit_cameras
from ln3diff_tpu.render.ray_sampler import sample_full_rays, unpack_25d_camera

res, C = 128, 32
rng = np.random.default_rng(0)
planes = jnp.asarray(rng.standard_normal((1, 3, 256, 256, C)),
                     jnp.float32) * 0.1
w1 = jnp.asarray(rng.standard_normal((C, 64)), jnp.float32) * 0.1
b1 = jnp.zeros(64)
w2 = jnp.asarray(rng.standard_normal((64, 33)), jnp.float32) * 0.1
b2 = jnp.zeros(33)
fused = FusedOSG(w1=w1, b1=b1, w2=w2, b2=b2)
opts = R.RenderOptions(depth_resolution=64, depth_resolution_importance=64,
                       ray_start='auto', ray_end='auto', box_warp=0.9,
                       filter_out_of_bbox=True, deterministic=True)
cams = jnp.asarray(orbit_cameras(24, 1.8, 30.0, 20.0))


def render_chunk(planes_f, cam_chunk):
    c2w, intr = unpack_25d_camera(cam_chunk)
    o, d = sample_full_rays(c2w, intr, res)
    return R.render_rays(None, planes_f, None, o, d, opts,
                         fused_osg=fused).feature_samples


jfn = jax.jit(render_chunk)

for fpc in (1, 2, 3, 4, 6):
    planes_f = jnp.repeat(planes, fpc, axis=0)
    # warm
    float(jnp.sum(jfn(planes_f, cams[:fpc])))
    t0 = time.perf_counter()
    for f0 in range(0, 24, fpc):
        r = jfn(planes_f, jax.lax.dynamic_slice_in_dim(cams, f0, fpc))
    float(jnp.sum(r))
    dt = time.perf_counter() - t0
    print(f'frames_per_call={fpc}: orbit24 = {dt*1000:.0f} ms', flush=True)
