import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ln3diff_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax
import jax.numpy as jnp
import numpy as np
from ln3diff_tpu.ops.fused_attention import fused_attention

B, L, H, d = 2, 768, 16, 64
key = jax.random.PRNGKey(0)
kq, kk, kv = jax.random.split(key, 3)
q = jax.random.normal(kq, (B, L, H, d), jnp.bfloat16)
k = jax.random.normal(kk, (B, L, H, d), jnp.bfloat16)
v = jax.random.normal(kv, (B, L, H, d), jnp.bfloat16)

xla = jax.jit(lambda q, k, v: jax.nn.dot_product_attention(q, k, v))
fus = jax.jit(lambda q, k, v: fused_attention(q, k, v))


def drain(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def bench(fn, iters=200):
    drain(fn(q, k, v))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(q, k, v)
        drain(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


a = np.asarray(xla(q, k, v), np.float32)
b = np.asarray(fus(q, k, v), np.float32)
print('max abs diff', np.abs(a - b).max(), ' (values ~N(0,1) combos)')
t_x = bench(xla)
t_f = bench(fus)
print(f'xla  {t_x*1e6:.1f} us/call')
print(f'fused {t_f*1e6:.1f} us/call')
