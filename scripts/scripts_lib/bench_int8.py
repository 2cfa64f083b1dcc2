"""On-chip A/B: bf16 vs W8A8 int8 DiT-L/2 sampling-scan throughput.

The DiT phase is 2.4 s of the 4.4 s text→mesh wall and its matmuls run
at 81–90% of the *bf16* MXU peak (TPU_PERF_NOTES closing profiles); the
v5e int8 MXU peak is ~2× bf16, so W8A8 (``ops/int8.py``) is the one
remaining protocol-compatible lever.  This measures the same CFG-doubled
forward inside a ``lax.scan`` (the sampling shape: B=2, 32² latents,
250 steps) for both paths, plus output deviation.

Run serialized (one process per chip), never overlapped with CPU test
runs: ``python scripts/scripts_lib/bench_int8.py [steps]``.
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))

from ln3diff_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from ln3diff_tpu.models.dit import DiT_TriLatent, dit_registry
from ln3diff_tpu.ops.int8 import quantize_params_like


def build(quantized: bool, variables=None, fused_attention: bool = False):
    if 'unet' in sys.argv[2:]:
        # ShapeNet/FFHQ LSGM U-Net release arch (320ch, roll_out)
        import dataclasses

        from ln3diff_tpu.config import denoiser_preset
        from ln3diff_tpu.models.unet import UNetModel
        cfg = dataclasses.replace(denoiser_preset('shapenet-unet'),
                                  quantized=quantized)
        model = UNetModel(cfg)
        x = jnp.zeros((2, 32, 32, 12), jnp.float32)
        t = jnp.zeros((2,), jnp.int32)
        ctx = jnp.zeros((2, 77, 768), jnp.float32)
    else:
        cfg = dit_registry('DiT-L/2', exact_gelu=False, quantized=quantized,
                           fused_attention=fused_attention)
        model = DiT_TriLatent(cfg)
        x = jnp.zeros((2, 32, 32, 12), jnp.float32)
        t = jnp.zeros((2,), jnp.int32)
        ctx = {'crossattn': jnp.zeros((2, 77, 768), jnp.float32)}
    if variables is None:
        variables = jax.jit(lambda k: model.init(k, x, t, ctx))(
            jax.random.PRNGKey(0))
    return model, cfg, variables, (x, t, ctx)


def scan_steps(model, variables, args, n_steps: int):
    x0, _, ctx = args
    params = variables['params']
    constants = {k: v for k, v in variables.items() if k != 'params'}

    def fn(params, x0):
        def body(x, i):
            y = model.apply({'params': params, **constants}, x,
                            jnp.full((2,), i, jnp.int32), ctx)
            # eps-ish update keeps the carry live without a scheduler
            return x - 0.001 * y, None

        x, _ = jax.lax.scan(body, x0, jnp.arange(n_steps))
        return x

    return jax.jit(fn), params, x0


def time_scan(fn, params, x0, iters=3):
    out = fn(params, x0)
    _ = float(jnp.sum(out))                    # drain through a host read
    best = float('inf')
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(params, x0)
        _ = float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    print(f'devices: {jax.devices()}', flush=True)

    model, cfg, variables, args = build(False)
    # perturb the zero-init projections so the deviation check is live
    leaves, treedef = jax.tree_util.tree_flatten(variables['params'])
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [w + 0.02 * jax.random.normal(k, w.shape, w.dtype)
              for w, k in zip(leaves, keys)]
    variables = dict(variables,
                     params=jax.tree_util.tree_unflatten(treedef, leaves))
    fn, params, x0 = scan_steps(model, variables, args, n_steps)
    wall = time_scan(fn, params, x0)
    print(f'bf16:  {wall:.3f}s for {n_steps} steps '
          f'= {1e3 * wall / n_steps:.2f} ms/step '
          f'({n_steps / wall:.1f} steps/s)', flush=True)

    # reuse the bf16 variables — build(True, variables=...) skips a full
    # (minutes-cold) quantized-init compile whose output we'd discard
    qmodel, qcfg, _, _ = build(True, variables=variables,
                               fused_attention='fused' in sys.argv[2:])
    q_struct = jax.eval_shape(
        lambda k: qmodel.init(k, *args[:2], args[2]), jax.random.PRNGKey(0))
    q_params = jax.jit(
        lambda p: quantize_params_like(q_struct['params'], p))(
            variables['params'])
    extras = {k: v for k, v in variables.items() if k != 'params'}
    qfn, q_params, x0 = scan_steps(
        qmodel, {'params': q_params, **extras}, args, n_steps)
    qwall = time_scan(qfn, q_params, x0)
    print(f'int8:  {qwall:.3f}s for {n_steps} steps '
          f'= {1e3 * qwall / n_steps:.2f} ms/step '
          f'({n_steps / qwall:.1f} steps/s)', flush=True)

    # single-forward deviation at matched inputs
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 12))
    t = jnp.full((2,), 100, jnp.int32)
    y = model.apply(variables, x, t, args[2])
    yq = qmodel.apply({'params': q_params, **extras}, x, t, args[2])
    rel = float(jnp.linalg.norm((yq - y).astype(jnp.float32))
                / jnp.linalg.norm(y.astype(jnp.float32)))
    print(f'speedup: {wall / qwall:.3f}x; single-forward rel dev {rel:.4f}',
          flush=True)


if __name__ == '__main__':
    main()
