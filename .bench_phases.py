"""Phase-level timing: orbit render and mesh sigma query, f32 vs bf16
planes, same process (cancels tunnel drift)."""
import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ln3diff_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np
from ln3diff_tpu.config import RENDER_PRESETS, vae_preset
from ln3diff_tpu.models.vae import TriplaneVAE
from ln3diff_tpu.pipeline import TextTo3DPipeline

vae = TriplaneVAE(vae_preset('objaverse'))
opts = RENDER_PRESETS['objverse_tuneray_aug_resolution_64_64_auto']
vars_ = vae.init(
    jax.random.PRNGKey(2), jnp.zeros((1, 32, 32, 12)), jnp.zeros((1, 25)),
    dataclasses.replace(opts, depth_resolution=4,
                        depth_resolution_importance=4), 8,
    method=vae.init_decoder_paths)
planes_f32 = jax.random.normal(jax.random.PRNGKey(0),
                               (1, 3, 256, 256, 32), jnp.float32) * 0.3

pipe = TextTo3DPipeline(
    None, None, None, vars_,
    lambda p, planes, cam: vae.apply(
        p, planes, cam, opts, 192, None, use_fused_osg=True,
        method=vae.render)['image_raw'],
    lambda p, planes, coords: vae.apply(
        p, planes, coords, opts.box_warp, use_fused_osg=True,
        method=vae.query_points))


def timeit(label, fn, iters=3):
    fn()                                    # warm
    best = 1e9
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f'{label}: {best*1e3:.0f} ms')


for name, pl_arr in [('f32', planes_f32),
                     ('bf16', planes_f32.astype(jnp.bfloat16))]:
    def orbit():
        v = pipe.render_orbit(pl_arr, num_frames=24, render_resolution=192)
        float(jnp.sum(v.astype(jnp.float32)))
    def sigma():
        s = pipe.dispatch_mesh_sigma(pl_arr, 192)
        np.asarray(s)
    timeit(f'orbit 24x192^2 [{name}]', orbit)
    timeit(f'sigma 192^3     [{name}]', sigma)
