import time, jax, jax.numpy as jnp, numpy as np
from ln3diff_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from ln3diff_tpu.render.renderer import RenderOptions, render_rays
from ln3diff_tpu.render.ray_sampler import sample_full_rays

B, res, C = 1, 192, 32
planes = jnp.asarray(np.random.randn(B,3,256,256,C).astype(np.float32)*0.1)
c2w = np.eye(4, dtype=np.float32)[None]; c2w[:,2,3] = -1.8
intr = np.array([[1.58,0,.5],[0,1.58,.5],[0,0,1]],np.float32)[None]
o, d = sample_full_rays(jnp.asarray(c2w), jnp.asarray(intr), res)
opts = RenderOptions(depth_resolution=64, depth_resolution_importance=64,
                     ray_start='auto', ray_end='auto', box_warp=0.9,
                     filter_out_of_bbox=True, deterministic=True,
                     unify_bf16=True)

def decoder(feats, dirs):
    x = jnp.mean(feats, axis=1)
    h = x @ jnp.ones((C,64), jnp.float32)*0.01
    h = jax.nn.softplus(h)
    out = h @ jnp.ones((64,33), jnp.float32)*0.01
    return jax.nn.sigmoid(out[...,1:]), out[...,:1]

f = jax.jit(lambda planes, o, d: jnp.sum(render_rays(None, planes, decoder, o, d, opts).feature_samples))
t0=time.time(); v=float(f(planes, o, d))
print('compile+first run', round(time.time()-t0,1), flush=True)
N=10
t0=time.perf_counter()
for _ in range(N): r=f(planes,o,d)
v=float(r)
per=(time.perf_counter()-t0)/N
rays=B*res*res
print(f'render {res}x{res} 64+64: {per*1000:.1f} ms -> {rays/per/1e6:.2f} Mrays/s', flush=True)
