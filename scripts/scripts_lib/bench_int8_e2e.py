"""On-chip int8-vs-bf16 END-TO-END quality bound at the bench spec
(round-5, VERDICT #4).

Builds the flagship t23d pipeline twice from identical weights — bf16
parity mode and W8A8 int8 serving mode (``ops/int8.quantize_dit``) —
runs the full 250-step CFG DDIM sample from the same seed, then
compares: final-latent deviation, decoded-plane deviation, rendered
orbit PSNR, and mesh-level σ-field agreement (crossing-cell IoU +
triangle-count drift).  Results go into docs/TPU_PERF_NOTES.md; the
scaled gated version runs in CI (tests/test_int8.py::TestInt8EndToEnd).

    python scripts/scripts_lib/bench_int8_e2e.py [--frames 8] [--seeds 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--frames', type=int, default=8)
    parser.add_argument('--mesh_grid', type=int, default=192)
    parser.add_argument('--seeds', type=int, default=2)
    args = parser.parse_args()

    from ln3diff_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    import bench

    t0 = time.perf_counter()

    def log(msg):
        print(f'[int8-e2e +{time.perf_counter() - t0:6.1f}s] {msg}',
              flush=True)

    os.environ.pop('LN3DIFF_BENCH_INT8', None)
    log('building bf16 pipeline')
    pipe_a, encode = bench._build_pipeline()
    os.environ['LN3DIFF_BENCH_INT8'] = '1'
    log('building int8 pipeline (same weights, quantized)')
    pipe_b, _ = bench._build_pipeline()
    os.environ.pop('LN3DIFF_BENCH_INT8', None)

    from ln3diff_tpu.render.mesh import march_grid

    for seed, prompt in list(enumerate(['a wooden chair', 'a sports car',
                                        'a ceramic vase']))[:args.seeds]:
        cond, uncond = encode(prompt)
        key = jax.random.PRNGKey(seed)
        lat_a = np.asarray(pipe_a.sample_latents(key, 1, cond, uncond),
                           np.float32)
        lat_b = np.asarray(pipe_b.sample_latents(key, 1, cond, uncond),
                           np.float32)
        rel = float(np.linalg.norm(lat_b - lat_a) / np.linalg.norm(lat_a))
        log(f'[seed {seed}] latent rel={rel:.4f} '
            f'max|Δ|={np.abs(lat_b - lat_a).max():.4f} '
            f'(|lat| rms {np.sqrt((lat_a ** 2).mean()):.3f})')

        # both latents decode through the SAME (bf16) VAE
        pa = pipe_a._decode_jit(pipe_a.vae_params, jnp.asarray(lat_a))
        pb = pipe_a._decode_jit(pipe_a.vae_params, jnp.asarray(lat_b))
        pa_r = pa.astype(pipe_a.render_dtype)
        pb_r = pb.astype(pipe_a.render_dtype)
        prel = float(jnp.linalg.norm((pb - pa).astype(jnp.float32))
                     / jnp.linalg.norm(pa.astype(jnp.float32)))

        va = np.asarray(pipe_a.render_orbit(pa_r, args.frames,
                                            render_resolution=192),
                        np.float32)
        vb = np.asarray(pipe_a.render_orbit(pb_r, args.frames,
                                            render_resolution=192),
                        np.float32)
        mse = float(np.mean((va - vb) ** 2))
        psnr = 10 * np.log10(4.0 / max(mse, 1e-12))
        log(f'[seed {seed}] planes rel={prel:.4f}; render PSNR '
            f'{psnr:.1f} dB over {args.frames}x192^2 frames')

        g = args.mesh_grid
        sa = np.asarray(pipe_a.dispatch_mesh_sigma(pa_r, g, smooth=True),
                        np.float32)
        sb = np.asarray(pipe_a.dispatch_mesh_sigma(pb_r, g, smooth=True),
                        np.float32)
        cross_a = sa.reshape(g, g, g) > 10.0
        cross_b = sb.reshape(g, g, g) > 10.0
        inter = np.logical_and(cross_a, cross_b).sum()
        union = np.logical_or(cross_a, cross_b).sum()
        iou = float(inter) / max(float(union), 1.0)
        va_, fa = march_grid(sa, g)
        vb_, fb = march_grid(sb, g)
        tri_drift = abs(len(fb) - len(fa)) / max(len(fa), 1)
        log(f'[seed {seed}] mesh: inside-voxel IoU {iou:.4f}, tris '
            f'{len(fa)} vs {len(fb)} (drift {tri_drift:.3%}), '
            f'max|Δσ|={np.abs(sb - sa).max():.3f}')


if __name__ == '__main__':
    main()
