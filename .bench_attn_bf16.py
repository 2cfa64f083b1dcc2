"""A/B: DiT-L/2 step time with f32-score sdpa vs bf16-score manual attention.

Measures (a) op-level attention micro-bench, (b) full DiT-L/2 single-call
step, (c) numeric deviation of the model output.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ln3diff_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

import ln3diff_tpu.models.dit as dit_mod
from ln3diff_tpu.config import denoiser_preset
from ln3diff_tpu.models.dit import DiT_TriLatent

B, L, H, d = 2, 768, 16, 64


def sdpa_ref(q, k, v):
    return jax.nn.dot_product_attention(q, k, v)


def sdpa_bf16(q, k, v):
    # logits accumulated f32 on MXU, STORED bf16 (half HBM traffic);
    # softmax stats in f32
    s = jnp.einsum('blhd,bmhd->bhlm', q, k,
                   preferred_element_type=jnp.float32)
    s = (s * (1.0 / np.sqrt(d))).astype(jnp.bfloat16)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp((s - m).astype(jnp.bfloat16))
    den = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    p = (e / den.astype(jnp.bfloat16))
    o = jnp.einsum('bhlm,bmhd->blhd', p, v,
                   preferred_element_type=jnp.float32)
    return o.astype(q.dtype)


def timeit(fn, *args, n=50):
    y = fn(*args)
    jax.tree_util.tree_map(lambda t: float(jnp.sum(t.astype(jnp.float32))), y)
    t0 = time.perf_counter()
    for _ in range(n):
        y = fn(*args)
    jax.tree_util.tree_map(lambda t: float(jnp.sum(t.astype(jnp.float32))), y)
    return (time.perf_counter() - t0) / n


key = jax.random.PRNGKey(0)
q, k, v = (jax.random.normal(kk, (B, L, H, d), jnp.bfloat16)
           for kk in jax.random.split(key, 3))

f_ref = jax.jit(sdpa_ref)
f_b16 = jax.jit(sdpa_bf16)
t_ref = timeit(f_ref, q, k, v)
t_b16 = timeit(f_b16, q, k, v)
dev = float(jnp.max(jnp.abs(f_ref(q, k, v).astype(jnp.float32)
                            - f_b16(q, k, v).astype(jnp.float32))))
print(f'op-level: f32-score {t_ref*1e6:.0f} us  bf16-score {t_b16*1e6:.0f} '
      f'us  max|dev| {dev:.2e}', flush=True)

# ---- in-context: patch _sdpa and run the full model ----
cfg = dataclasses.replace(denoiser_preset('t23d-dit-l2'), exact_gelu=False)
model = DiT_TriLatent(cfg)
x = jnp.zeros((2, 32, 32, 12))
t = jnp.zeros((2,))
ctx = {'crossattn': jnp.zeros((2, 77, 768))}
vars_ = jax.jit(model.init)(jax.random.PRNGKey(1), x, t, ctx)
vars16 = jax.tree_util.tree_map(
    lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, vars_)

xr = jax.random.normal(jax.random.PRNGKey(2), x.shape)

orig = dit_mod._sdpa
for name, impl in (('f32-score', orig), ('bf16-score', sdpa_bf16)):
    dit_mod._sdpa = impl
    step = jax.jit(lambda v_, x_, t_, c_: model.apply(v_, x_, t_, c_))
    dt = timeit(step, vars16, xr, t, ctx, n=100)
    y = step(vars16, xr, t, ctx)
    print(f'DiT-L/2 {name}: {dt*1000:.2f} ms/step  '
          f'out[0,0,0,:2]={np.asarray(y[0,0,0,:2])}', flush=True)
dit_mod._sdpa = orig
