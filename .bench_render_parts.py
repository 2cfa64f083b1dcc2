import time, jax, jax.numpy as jnp, numpy as np
from ln3diff_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from ln3diff_tpu.render import renderer as R
from ln3diff_tpu.render.ray_marcher import march_rays

B, res, C, S = 1, 192, 32, 64
Rr = res * res
planes = jnp.asarray(np.random.randn(B, 3, 256, 256, C).astype(np.float32) * .1)
coords = jnp.asarray(np.random.uniform(-.4, .4, (B, Rr * S, 3)).astype(np.float32))
depths = jnp.asarray(np.sort(np.random.uniform(1, 3, (B, Rr, S, 1)).astype(np.float32), axis=2))
colors = jnp.asarray(np.random.randn(B, Rr, S, C).astype(np.float32))
dens = jnp.asarray(np.random.randn(B, Rr, S, 1).astype(np.float32))
weights = jnp.asarray(np.random.uniform(0, 1, (B, Rr, S - 1, 1)).astype(np.float32))


def timeit(name, f, *args, n=5):
    v = jax.jit(f)
    r = v(*args)
    jnp.sum(jax.tree_util.tree_leaves(r)[0]).block_until_ready()
    float(jnp.sum(jax.tree_util.tree_leaves(v(*args))[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        r = v(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    print(name, f'{(time.perf_counter()-t0)/n*1000:.1f} ms', flush=True)


timeit('sample_from_planes (M=2.36M)', lambda p, c: R.sample_from_planes(p, c, 0.9), planes, coords)
timeit('march_rays', lambda c, d, z: march_rays(c, d, z), colors, dens, depths)
timeit('sample_importance', lambda z, w: R.sample_importance(None, z, w, 64, det=True), depths, weights)
timeit('unify(sort+gather)', lambda z, c, d: R.unify_samples(z, c, d, z, c, d), depths, colors, dens)
timeit('ray_limits', lambda o, d: R.math_utils.get_ray_limits_box(o, d, .9),
       coords[:, :Rr], coords[:, :Rr])
