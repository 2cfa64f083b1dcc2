import time, jax, jax.numpy as jnp, numpy as np
from ln3diff_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
B, n, M, C = 1, 3, 2359296, 32
rows_tbl = jnp.asarray(np.random.randn(3*257*257, 4*C).astype(np.float32))
idx = jnp.asarray(np.random.randint(0, 3*257*257, (B, n, M), dtype=np.int32))
w = jnp.asarray(np.random.rand(B, n, M, 4).astype(np.float32))

def v_einsum(tbl, idx, w):
    rows = jnp.take(tbl, idx.reshape(-1), axis=0).reshape(B, n, M, 4, C)
    return jnp.einsum('bnmk,bnmkc->bnmc', w, rows)

def v_fma(tbl, idx, w):
    rows = jnp.take(tbl, idx.reshape(-1), axis=0).reshape(B, n, M, 4 * C)
    out = (w[..., 0:1] * rows[..., :C] + w[..., 1:2] * rows[..., C:2*C]
           + w[..., 2:3] * rows[..., 2*C:3*C] + w[..., 3:4] * rows[..., 3*C:])
    return out

def timeit(name, f, n_it=5):
    v = jax.jit(f)
    float(jnp.sum(v(rows_tbl, idx, w)))
    t0 = time.perf_counter()
    for _ in range(n_it):
        r = v(rows_tbl, idx, w)
    float(jnp.sum(r))
    print(name, f'{(time.perf_counter()-t0)/n_it*1000:.1f} ms', flush=True)

timeit('gather+einsum', v_einsum)
timeit('gather+4FMA  ', v_fma)
timeit('gather only  ', lambda tbl, idx, w: jnp.take(tbl, idx.reshape(-1), axis=0))
