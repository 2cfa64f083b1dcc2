"""Single-call DiT-L/2 step: XLA sdpa vs fused VMEM attention (no scan)."""
import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ln3diff_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np
from ln3diff_tpu.config import denoiser_preset
from ln3diff_tpu.models.dit import DiT_TriLatent

cfg = denoiser_preset('t23d-dit-l2')
x0 = jnp.zeros((2, 32, 32, 12))
ctx0 = {'crossattn': jnp.zeros((2, 77, 768))}
t0_ = jnp.zeros((2,))
model_x = DiT_TriLatent(dataclasses.replace(cfg, exact_gelu=False))
model_f = DiT_TriLatent(dataclasses.replace(cfg, exact_gelu=False, fused_attention=True))
variables = jax.jit(model_x.init)(jax.random.PRNGKey(1), x0, t0_, ctx0)
fx = jax.jit(lambda v, x: model_x.apply(v, x, t0_ + 10.0, ctx0))
ff = jax.jit(lambda v, x: model_f.apply(v, x, t0_ + 10.0, ctx0))
xin = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 12))

def drain(x):
    return float(jnp.sum(x.astype(jnp.float32)))

def bench(fn, iters=30):
    drain(fn(variables, xin))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(variables, xin)
        drain(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best

t_start = time.perf_counter()
a = np.asarray(fx(variables, xin), np.float32)
print('xla compiled in', time.perf_counter() - t_start, flush=True)
t_start = time.perf_counter()
b = np.asarray(ff(variables, xin), np.float32)
print('fused compiled in', time.perf_counter() - t_start, flush=True)
print('max abs diff:', np.abs(a - b).max(), flush=True)
print(f'xla   {bench(fx)*1e3:.3f} ms/step', flush=True)
print(f'fused {bench(ff)*1e3:.3f} ms/step', flush=True)
