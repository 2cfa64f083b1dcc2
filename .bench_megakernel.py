"""Round-5 mega-kernel microbench: qkv+attention fused Pallas kernel vs
the XLA chain at DiT-L/2 serving shapes (B=2, L=768, D=1024, H=16)."""
import time
import numpy as np
from ln3diff_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from ln3diff_tpu.ops.fused_attention import fused_qkv_attention, split_qkv_weights

B, L, D, H = 2, 768, 1024, 16
dt = jnp.bfloat16
x0 = (jax.random.normal(jax.random.PRNGKey(0), (B, L, D)) * 0.1).astype(dt)
wqkv = (jax.random.normal(jax.random.PRNGKey(1), (D, 3*D)) * 0.02).astype(dt)
bqkv = jnp.zeros((3*D,), dt)
(wq, wk, wv), (bq, bk, bv) = split_qkv_weights(wqkv, bqkv, H)

N = 1000

def xla_chain(x0):
    def body(x, _):
        qkv = x @ wqkv + bqkv
        q, k, v = jnp.split(qkv, 3, axis=-1)
        def heads(t): return t.reshape(B, L, H, D // H)
        y = jax.nn.dot_product_attention(heads(q), heads(k), heads(v))
        y = y.reshape(B, L, D)
        return (0.5 * y + 0.5 * x).astype(dt), ()
    out, _ = jax.lax.scan(body, x0, None, length=N)
    return out

def mega_chain(x0):
    def body(x, _):
        y = fused_qkv_attention(x, wq, wk, wv, bq, bk, bv, num_heads=H)
        return (0.5 * y + 0.5 * x).astype(dt), ()
    out, _ = jax.lax.scan(body, x0, None, length=N)
    return out

for name, fn in [('xla', xla_chain), ('mega', mega_chain)]:
    f = jax.jit(fn)
    r = f(x0); np.asarray(r)          # compile + drain
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(f(x0))
        times.append((time.perf_counter() - t0) / N * 1e6)
    print(f'{name}: {min(times):.1f} us/call (min of {[round(t,1) for t in times]})')
