import time, jax, jax.numpy as jnp, numpy as np
from ln3diff_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from ln3diff_tpu.render import renderer as R
from ln3diff_tpu.render.ray_marcher import march_rays

B, res, C, S = 1, 192, 32, 64
Rr = res * res
M = Rr * S
planes = jnp.asarray(np.random.randn(B, 3, 256, 256, C).astype(np.float32) * .1)
coords = jnp.asarray(np.random.uniform(-.4, .4, (B, M, 3)).astype(np.float32))
dirs = jnp.asarray(np.random.randn(B, M, 3).astype(np.float32))
depths = jnp.asarray(np.sort(np.random.uniform(1, 3, (B, Rr, 2 * S, 1)).astype(np.float32), axis=2))
colors = jnp.asarray(np.random.randn(B, Rr, 2 * S, C).astype(np.float32))
dens = jnp.asarray(np.random.randn(B, Rr, 2 * S, 1).astype(np.float32))
w1 = jnp.asarray(np.random.randn(C, 64).astype(np.float32) * .1)
w2 = jnp.asarray(np.random.randn(64, 33).astype(np.float32) * .1)
feats = jnp.asarray(np.random.randn(B, 3, M, C).astype(np.float32))


def timeit(name, f, *args, n=5):
    v = jax.jit(f)
    float(jnp.sum(jax.tree_util.tree_leaves(v(*args))[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        r = v(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    print(name, f'{(time.perf_counter()-t0)/n*1000:.1f} ms', flush=True)


timeit('pack_corner_table', lambda p: R.pack_corner_table(p), planes)
packed = R.pack_corner_table(planes)
proj = R.project_onto_planes(coords * (2 / .9))
timeit('sample_packed (gather+lerp)', lambda pk, pj: R.sample_packed_planes(pk, pj, 256, 256), packed, proj)
timeit('proj+indices only', lambda c: R.project_onto_planes(c), coords)


def mlp(feats):
    x = jnp.mean(feats, axis=1)
    h = jax.nn.softplus(x @ w1)
    return h @ w2


timeit('OSG MLP (mean+2fc, M=2.36M)', mlp, feats)
timeit('march (127 samples)', lambda c, d, z: march_rays(c[:, :, :-1], d[:, :, :-1], z[:, :, :-1]), colors, dens, depths)
timeit('unify f32', lambda z, c, d: R.unify_samples(z[:, :, :S], c[:, :, :S], d[:, :, :S], z[:, :, S:], c[:, :, S:], d[:, :, S:]), depths, colors, dens)
timeit('unify bf16', lambda z, c, d: R.unify_samples(z[:, :, :S], c[:, :, :S], d[:, :, :S], z[:, :, S:], c[:, :, S:], d[:, :, S:], payload_dtype=jnp.bfloat16), depths, colors, dens)

# full render with real decoder weights
def decoder(feats, dd):
    x = jnp.mean(feats, axis=1)
    h = jax.nn.softplus(x @ w1)
    out = h @ w2
    return jax.nn.sigmoid(out[..., 1:]), out[..., :1]

opts = R.RenderOptions(depth_resolution=64, depth_resolution_importance=64,
                       ray_start='auto', ray_end='auto', box_warp=0.9,
                       filter_out_of_bbox=True, deterministic=True)
from ln3diff_tpu.render.ray_sampler import sample_full_rays
c2w = np.eye(4, dtype=np.float32)[None]; c2w[:, 2, 3] = -1.8
intr = np.array([[1.58, 0, .5], [0, 1.58, .5], [0, 0, 1]], np.float32)[None]
o, d = sample_full_rays(jnp.asarray(c2w), jnp.asarray(intr), res)
timeit('FULL render', lambda p, oo, dd: R.render_rays(None, p, decoder, oo, dd, opts).feature_samples, planes, o, d, n=3)
