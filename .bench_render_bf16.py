import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ln3diff_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np
from ln3diff_tpu.config import RENDER_PRESETS, vae_preset
from ln3diff_tpu.models.vae import TriplaneVAE
from ln3diff_tpu.render.camera import orbit_cameras

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


def drain(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def time_render(pl_arr, iters=8):
    out = render(vars_, pl_arr, cam)
    drain(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = render(vars_, pl_arr, cam)
        drain(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best, out


t_f32, img_f32 = time_render(planes)
print(f'f32 planes:  {t_f32*1e3:.1f} ms/frame')
t_bf16, img_bf16 = time_render(planes.astype(jnp.bfloat16))
print(f'bf16 planes: {t_bf16*1e3:.1f} ms/frame')
a = np.asarray(img_f32, np.float32)
b = np.asarray(img_bf16, np.float32)
err = np.abs(a - b)
print(f'abs err max {err.max():.5f} mean {err.mean():.6f} '
      f'(image range [-1,1])')
psnr = 10 * np.log10(4.0 / np.mean((a - b) ** 2))
print(f'psnr {psnr:.1f} dB')
