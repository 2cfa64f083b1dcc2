import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ln3diff_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax
import jax.numpy as jnp
from ln3diff_tpu.config import denoiser_preset
from ln3diff_tpu.models.dit import DiT_TriLatent
from scripts.scripts_lib.profile_device import profile_fn

import dataclasses
cfg = dataclasses.replace(denoiser_preset("t23d-dit-l2"), exact_gelu=False)
model = DiT_TriLatent(cfg)
x = jnp.zeros((2, 32, 32, 12))
ctx = {'crossattn': jnp.zeros((2, 77, 768))}
v = jax.jit(model.init)(jax.random.PRNGKey(0), x, jnp.zeros((2,)), ctx)
step = jax.jit(lambda v, x, t, c: model.apply(v, x, t, c))
rows = profile_fn(lambda: step(v, x, jnp.zeros((2,)), ctx), iters=20,
                  top=14, quiet=True)
for total_us, count, name, long_name in rows:
    print(f'== {name}  {total_us/count:.1f} us/call x{count}')
    print(long_name[:3000])
    print()
