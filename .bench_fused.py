import time

import jax
import jax.numpy as jnp
import numpy as np

from ln3diff_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from ln3diff_tpu.ops.fused_render import FusedOSG, osg_pointwise_fused
from ln3diff_tpu.render import renderer as R
from ln3diff_tpu.render.ray_sampler import sample_full_rays

B, res, C, S = 1, 192, 32, 64
Rr = res * res
M = Rr * S
rng = np.random.default_rng(0)
planes = jnp.asarray(rng.standard_normal((B, 3, 256, 256, C)),
                     jnp.float32) * 0.1
coords = jnp.asarray(rng.uniform(-0.4, 0.4, (B, M, 3)), jnp.float32)
w1 = jnp.asarray(rng.standard_normal((C, 64)), jnp.float32) * 0.1
b1 = jnp.zeros(64)
w2 = jnp.asarray(rng.standard_normal((64, 33)), jnp.float32) * 0.1
b2 = jnp.zeros(33)
fused = FusedOSG(w1=w1, b1=b1, w2=w2, b2=b2)


def timeit(name, f, *args, n=5):
    v = jax.jit(f)
    float(jnp.sum(jax.tree_util.tree_leaves(v(*args))[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        r = v(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    print(name, f'{(time.perf_counter() - t0) / n * 1000:.1f} ms', flush=True)


packed = R.pack_corner_table(planes)
proj = R.project_onto_planes(coords * (2 / .9))


def stock(pk, pj):
    feats = R.sample_packed_planes(pk, pj, 256, 256)
    x = jnp.mean(feats, axis=1)
    h = jax.nn.softplus(x @ w1 + b1)
    out = h @ w2 + b2
    return jax.nn.sigmoid(out[..., 1:]) * 1.002 - 0.001, out[..., :1]


def fused_fn(pk, pj):
    rows, tx, ty, live = R.packed_gather(pk, pj, 256, 256)
    return fused(rows, tx, ty, live)


r0 = jax.jit(stock)(packed, proj)
r1 = jax.jit(fused_fn)(packed, proj)
print('pass max|Δrgb|', float(jnp.max(jnp.abs(r0[0][0] - r1[0][0]))),
      'max|Δσ|', float(jnp.max(jnp.abs(r0[1][0] - r1[1][0]))), flush=True)
timeit('per-pass stock (gather+lerp+MLP)', stock, packed, proj)
timeit('per-pass fused (gather+kernel)  ', fused_fn, packed, proj)

# full render
opts = R.RenderOptions(depth_resolution=64, depth_resolution_importance=64,
                       ray_start='auto', ray_end='auto', box_warp=0.9,
                       filter_out_of_bbox=True, deterministic=True)
c2w = np.eye(4, dtype=np.float32)[None]
c2w[:, 2, 3] = -1.8
intr = np.array([[1.58, 0, .5], [0, 1.58, .5], [0, 0, 1]], np.float32)[None]
o, d = sample_full_rays(jnp.asarray(c2w), jnp.asarray(intr), res)


def decoder(feats, dd):
    x = jnp.mean(feats, axis=1)
    h = jax.nn.softplus(x @ w1 + b1)
    out = h @ w2 + b2
    return jax.nn.sigmoid(out[..., 1:]) * 1.002 - 0.001, out[..., :1]


f_stock = lambda p, oo, dd: R.render_rays(None, p, decoder, oo, dd,
                                          opts).feature_samples
f_fused = lambda p, oo, dd: R.render_rays(None, p, decoder, oo, dd, opts,
                                          fused_osg=fused).feature_samples
a = jax.jit(f_stock)(planes, o, d)
b = jax.jit(f_fused)(planes, o, d)
print('render max|Δ|', float(jnp.max(jnp.abs(a - b))), flush=True)
timeit('FULL render stock', f_stock, planes, o, d, n=5)
timeit('FULL render fused', f_fused, planes, o, d, n=5)
