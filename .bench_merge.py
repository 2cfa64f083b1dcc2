import time

import jax
import jax.numpy as jnp
import numpy as np

from ln3diff_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

B, res, C, S2 = 1, 192, 32, 128
Rr = res * res
depths = jnp.asarray(np.random.uniform(1, 3, (B, Rr, S2)).astype(np.float32))
colors = jnp.asarray(np.random.randn(B, Rr, S2, C).astype(np.float32))
dens = jnp.asarray(np.random.randn(B, Rr, S2).astype(np.float32))


def timeit(name, f, *args, n=10):
    v = jax.jit(f)
    float(jnp.sum(jax.tree_util.tree_leaves(v(*args))[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        r = v(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    print(name, f'{(time.perf_counter() - t0) / n * 1000:.1f} ms', flush=True)


def compose_from_sorted(key_s, dens_s):
    deltas = key_s[..., 1:] - key_s[..., :-1]
    dens_mid = jax.nn.softplus((dens_s[..., :-1] + dens_s[..., 1:]) * 0.5 - 1.0)
    alpha = 1.0 - jnp.exp(-dens_mid * deltas)
    alpha_shift = jnp.concatenate(
        [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1)
    transmittance = jnp.cumprod(alpha_shift, axis=-1)
    w = alpha * transmittance[..., :-1]
    w_pad = jnp.concatenate([jnp.zeros_like(w[..., :1]), w,
                             jnp.zeros_like(w[..., :1])], -1)
    u_sorted = (w_pad[..., :-1] + w_pad[..., 1:]) * 0.5
    return u_sorted, w


def march_argsort(all_depths, all_colors, all_dens):
    S = all_depths.shape[-1]
    iota = jnp.broadcast_to(jnp.arange(S, dtype=jnp.float32), all_depths.shape)
    key_s, dens_s, idx_s = jax.lax.sort((all_depths, all_dens, iota),
                                        dimension=2, num_keys=1)
    u_sorted, w = compose_from_sorted(key_s, dens_s)
    inv = jnp.argsort(idx_s, axis=-1)
    u = jnp.take_along_axis(u_sorted, inv, axis=-1)
    rgb = jnp.einsum('brs,brsc->brc', u, all_colors)
    return rgb, jnp.sum(w, -1)


def march_resort(all_depths, all_colors, all_dens):
    S = all_depths.shape[-1]
    iota = jnp.broadcast_to(jnp.arange(S, dtype=jnp.float32), all_depths.shape)
    key_s, dens_s, idx_s = jax.lax.sort((all_depths, all_dens, iota),
                                        dimension=2, num_keys=1)
    u_sorted, w = compose_from_sorted(key_s, dens_s)
    _, u = jax.lax.sort((idx_s, u_sorted), dimension=2, num_keys=1)
    rgb = jnp.einsum('brs,brsc->brc', u, all_colors)
    return rgb, jnp.sum(w, -1)


def march_scatter(all_depths, all_colors, all_dens):
    # one-hot matmul inverse permutation: u = onehot(idx_s) @ u_sorted
    S = all_depths.shape[-1]
    iota = jnp.broadcast_to(jnp.arange(S, dtype=jnp.float32), all_depths.shape)
    key_s, dens_s, idx_s = jax.lax.sort((all_depths, all_dens, iota),
                                        dimension=2, num_keys=1)
    u_sorted, w = compose_from_sorted(key_s, dens_s)
    oh = (idx_s[..., None] == jnp.arange(S, dtype=jnp.float32)).astype(
        u_sorted.dtype)                       # (B,R,S,S) big! skip if slow
    u = jnp.einsum('brs,brst->brt', u_sorted, oh)
    rgb = jnp.einsum('brs,brsc->brc', u, all_colors)
    return rgb, jnp.sum(w, -1)


r1 = jax.jit(march_argsort)(depths, colors, dens)
r2 = jax.jit(march_resort)(depths, colors, dens)
print('resort max diff', float(jnp.max(jnp.abs(r1[0] - r2[0]))))
timeit('march argsort+gather', march_argsort, depths, colors, dens)
timeit('march resort        ', march_resort, depths, colors, dens)
timeit('march onehot-scatter ', march_scatter, depths, colors, dens)
