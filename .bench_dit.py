import time

import jax
import jax.numpy as jnp
import numpy as np

from ln3diff_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from ln3diff_tpu.config import denoiser_preset
from ln3diff_tpu.models.dit import DiT_TriLatent

den_cfg = denoiser_preset('t23d-dit-l2')
denoiser = DiT_TriLatent(den_cfg)
x = jnp.zeros((2, 32, 32, 12))
t = jnp.zeros((2,))
ctx = {'crossattn': jnp.zeros((2, 77, 768))}
v = jax.jit(denoiser.init)(jax.random.PRNGKey(1), x, t, ctx)

count = sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(v['params']))
print(f'params {count/1e6:.0f}M', flush=True)


def run(params, n=100):
    fn = jax.jit(lambda p, x, t, c: denoiser.apply(p, x, t, c))
    y = fn(params, x, t, ctx)
    float(jnp.sum(y))
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn(params, x, t, ctx)
    float(jnp.sum(y))
    dt = (time.perf_counter() - t0) / n
    return dt


dt32 = run(v)
print(f'f32 params: {dt32*1000:.2f} ms/step = {1/dt32:.0f} steps/s',
      flush=True)

v16 = jax.tree_util.tree_map(
    lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, v)
dt16 = run(v16)
print(f'bf16 params: {dt16*1000:.2f} ms/step = {1/dt16:.0f} steps/s',
      flush=True)

# numerical drift check
fn = jax.jit(lambda p, x, t, c: denoiser.apply(p, x, t, c))
key = jax.random.PRNGKey(0)
xr = jax.random.normal(key, x.shape)
y32 = fn(v, xr, t, ctx)
y16 = fn(v16, xr, t, ctx)
print('max|Δ|', float(jnp.max(jnp.abs(y32 - y16))),
      'rms', float(jnp.sqrt(jnp.mean((y32 - y16) ** 2))), flush=True)
