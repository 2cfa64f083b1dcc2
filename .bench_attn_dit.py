"""Same-process A/B: DiT-L/2 serving step, XLA sdpa vs fused Pallas attention."""
import sys, os, time, dataclasses
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ln3diff_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np
from ln3diff_tpu.config import denoiser_preset
from ln3diff_tpu.models.dit import DiT_TriLatent

cfg = denoiser_preset('t23d-dit-l2')
x0 = jnp.zeros((2, 32, 32, 12))
ctx0 = {'crossattn': jnp.zeros((2, 77, 768))}
t0_ = jnp.zeros((2,))

model_x = DiT_TriLatent(dataclasses.replace(cfg, exact_gelu=False))
model_f = DiT_TriLatent(dataclasses.replace(cfg, exact_gelu=False,
                                            fused_attention=True))
variables = jax.jit(model_x.init)(jax.random.PRNGKey(1), x0, t0_, ctx0)

# 50-step scan to amortize dispatch: mimics the sampler loop structure
def make_loop(model):
    def step(x, _):
        out = model.apply(variables, x, t0_ + 10.0, ctx0)
        return out[..., :12] * 0.999, None
    def loop(x):
        y, _ = jax.lax.scan(step, x, None, length=25)
        return y
    return jax.jit(loop)

loop_x, loop_f = make_loop(model_x), make_loop(model_f)
xin = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 12))

def drain(x):
    return float(jnp.sum(x.astype(jnp.float32)))

def bench(fn, reps=3):
    drain(fn(xin))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        drain(fn(xin))
        best = min(best, time.perf_counter() - t0)
    return best

a = np.asarray(loop_x(xin), np.float32)
b = np.asarray(loop_f(xin), np.float32)
print('max abs diff over 50 steps:', np.abs(a - b).max())
tx = bench(loop_x)
tf = bench(loop_f)
print(f'xla   {tx/25*1e3:.3f} ms/step')
print(f'fused {tf/25*1e3:.3f} ms/step')
