"""Kernel TILE sweep at the 192^2-frame pass shape, bf16 rows."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ln3diff_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax
import jax.numpy as jnp
from ln3diff_tpu.ops.fused_render import osg_pointwise_fused

M = 36864 * 64
C = 32
key = jax.random.PRNGKey(0)
rows = jax.random.normal(key, (3, M, 4 * C), jnp.bfloat16)
tx = jax.random.uniform(jax.random.PRNGKey(1), (3, M))
ty = jax.random.uniform(jax.random.PRNGKey(2), (3, M))
live = jnp.ones((3, M))
inbox = jnp.ones((M,))
w1 = jax.random.normal(jax.random.PRNGKey(3), (C, 64)) * 0.2
b1 = jnp.zeros((64,))
w2 = jax.random.normal(jax.random.PRNGKey(4), (64, 33)) * 0.2
b2 = jnp.zeros((33,))


def bench(tile, iters=5):
    fn = jax.jit(lambda *a: osg_pointwise_fused(*a, inbox=inbox,
                                                tile=tile))
    try:
        rgb, sig = fn(rows, tx, ty, live, w1, b1, w2, b2)
        float(jnp.sum(sig.astype(jnp.float32)))
    except Exception as e:
        print(f'TILE={tile}: FAILED {type(e).__name__}: {str(e)[:160]}')
        return
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            rgb, sig = fn(rows, tx, ty, live, w1, b1, w2, b2)
        float(jnp.sum(sig.astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f'TILE={tile}: {best*1e3:.1f} ms/pass')


for tile in (1024, 2048, 4096, 8192):
    bench(tile)
