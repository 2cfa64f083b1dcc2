"""Round-5: batched serving throughput — 4 prompts through one CFG scan,
then per-instance orbit + mesh (reference serves at batch 4, ~16 GiB;
README.md:314)."""
import os, time
import numpy as np
from ln3diff_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax
import bench

pipe, encode = bench._build_pipeline()
from ln3diff_tpu.render.mesh import dispatch_vertex_colors, march_grid

prompts = ['a wooden chair', 'a sports car', 'a ceramic vase', 'an airplane']
conds = [encode(p) for p in prompts]
# batch the four conditionings into one scan: cond context (4, 77, 768)
import jax.numpy as jnp
cond = {'crossattn': jnp.concatenate([c['crossattn'] for c, _ in conds])}
uncond = {'crossattn': jnp.concatenate([u['crossattn'] for _, u in conds])}

def run(seed):
    t0 = time.perf_counter()
    lat = pipe.sample_latents(jax.random.PRNGKey(seed), 4, cond, uncond)
    planes = pipe._decode_jit(pipe.vae_params, lat).astype(pipe.render_dtype)
    walls = {'sample+decode': time.perf_counter() - t0}
    for i in range(4):
        p_i = planes[i:i + 1]
        sg = pipe.dispatch_mesh_sigma(p_i, 192, smooth=True)
        video = pipe.render_orbit(p_i, 24, render_resolution=192)
        sg_np = np.asarray(sg)
        verts, faces = march_grid(sg_np, 192)
        rgb = dispatch_vertex_colors(pipe._mesh_decoder(p_i), verts,
                                     as_uint8=True)
        np.asarray(video)
        if rgb is not None:
            np.asarray(rgb)
    walls['total'] = time.perf_counter() - t0
    return walls

run(0)  # compile pass
for s in (1, 2):
    w = run(s)
    print(f"seed {s}: 4 prompts in {w['total']:.2f}s "
          f"({w['total']/4:.2f} s/prompt amortized; "
          f"sample+decode {w['sample+decode']:.2f}s)", flush=True)
