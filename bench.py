"""Benchmark: DiT-L/2 denoise steps/sec on one chip (bf16, CFG-doubled
batch), the hot metric of the <5 s text→mesh north star.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 50 steps/s — the rate needed for 250 DDIM steps inside the 5 s
budget (BASELINE.md north star; the reference publishes no numeric rate).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    from ln3diff_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from ln3diff_tpu.diffusion.gaussian import make_diffusion
    from ln3diff_tpu.models.dit import DiT_TriLatent, dit_registry

    cfg = dit_registry('DiT-L/2', input_size=32, in_channels=4,
                       dtype=jnp.bfloat16)
    model = DiT_TriLatent(cfg)

    B = 2  # CFG-doubled batch of 1: the north-star single-prompt case
    x = jnp.ones((B, 32, 32, 12), jnp.float32)
    t = jnp.full((B,), 500.0, jnp.float32)
    ctx = {'crossattn': jnp.ones((B, 77, 768), jnp.float32)}
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, ctx)

    diffusion = make_diffusion(steps=1000, timestep_respacing='ddim250')
    n_steps = diffusion.num_timesteps

    # NOTE: params must be explicit jit args — closing over the pytree
    # embeds it as HLO constants and stalls compilation.
    @jax.jit
    def sample(variables, key, crossattn):
        return diffusion.ddim_sample_loop(
            lambda xx, tt: model.apply(variables, xx, tt,
                                       {'crossattn': crossattn}),
            (B, 32, 32, 12), key)

    # warmup/compile
    out = sample(variables, jax.random.PRNGKey(0), ctx['crossattn'])
    out.block_until_ready()

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        out = sample(variables, jax.random.PRNGKey(i + 1), ctx['crossattn'])
        out.block_until_ready()
        times.append(time.perf_counter() - t0)

    wall = min(times)
    steps_per_sec = n_steps / wall
    baseline = 50.0  # steps/s for 250 steps in 5 s
    print(json.dumps({
        'metric': 'dit_l2_denoise_steps_per_sec',
        'value': round(steps_per_sec, 2),
        'unit': 'steps/s (DiT-L/2, single prompt CFG-doubled, 250-step DDIM scan)',
        'vs_baseline': round(steps_per_sec / baseline, 3),
    }))


if __name__ == '__main__':
    main()
