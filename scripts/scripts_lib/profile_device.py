"""Device-op profiler: capture a ``jax.profiler`` trace of a callable and
print the per-op fusion table (time, count, HLO long name).

This is the workflow that found the round-2 wins (the fill-mode gather
select, the VPU-bound fused kernel, the GELU fusion spill) — packaged so
future perf passes don't rebuild it.  Works on the tunneled axon TPU
(traces land locally even though compilation is remote).

Usage (python API):

    from scripts_lib.profile_device import profile_fn
    rows = profile_fn(lambda: my_jitted(x), iters=20)

CLI smoke (profiles a DiT-L/2 denoise step):

    python scripts/scripts_lib/profile_device.py --what dit
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))


def parse_trace_dir(trace_dir: str, top: int = 25):
    """Parse the newest ``*.trace.json.gz`` under a profiler dir →
    list of (total_us, count, name, hlo_long_name) sorted by time."""
    paths = sorted(glob.glob(
        os.path.join(trace_dir, 'plugins/profile/*/*.trace.json.gz')))
    if not paths:
        return []
    with gzip.open(paths[-1], 'rt') as f:
        data = json.load(f)
    tot = collections.Counter()
    cnt = collections.Counter()
    long_names = {}
    for e in data.get('traceEvents', []):
        if e.get('ph') != 'X' or 'dur' not in e:
            continue
        args = e.get('args', {})
        if 'long_name' not in args:     # host-side python frames etc.
            continue
        n = e['name']
        tot[n] += e['dur']
        cnt[n] += 1
        long_names.setdefault(n, args['long_name'])
    return [(tot[n], cnt[n], n, long_names[n])
            for n, _ in tot.most_common(top)]


def profile_fn(fn, iters: int = 20, top: int = 25, trace_dir=None,
               quiet: bool = False):
    """Run ``fn`` ``iters`` times under the profiler; return + print the
    device-op table.  ``fn`` should return a device array (drained via a
    host read — ``block_until_ready`` is unreliable on axon)."""
    import jax
    import jax.numpy as jnp

    td = trace_dir or tempfile.mkdtemp(prefix='lnprof-')
    out = fn()                      # warm/compile outside the trace
    float(jnp.sum(jnp.asarray(out, jnp.float32)))
    with jax.profiler.trace(td):
        for _ in range(iters):
            out = fn()
        float(jnp.sum(jnp.asarray(out, jnp.float32)))
    rows = parse_trace_dir(td, top=top)
    if not quiet:
        for total_us, count, name, long_name in rows:
            per = total_us / max(count, 1)
            print(f'{total_us/1e3:9.2f} ms  x{count:<5} {per:8.1f} us/call'
                  f'  {name}: {long_name[:90]}')
    return rows


def _cli():
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument('--what', default='dit', choices=['dit', 'int8'])
    parser.add_argument('--iters', type=int, default=20)
    args = parser.parse_args()

    from ln3diff_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import dataclasses
    import jax
    import jax.numpy as jnp

    from ln3diff_tpu.config import denoiser_preset
    from ln3diff_tpu.models.dit import DiT_TriLatent

    cfg = denoiser_preset('t23d-dit-l2')
    if args.what == 'int8':
        cfg = dataclasses.replace(cfg, exact_gelu=False)  # serving mode
    model = DiT_TriLatent(cfg)
    x = jnp.zeros((2, 32, 32, 12))
    ctx = {'crossattn': jnp.zeros((2, 77, 768))}
    v = jax.jit(model.init)(jax.random.PRNGKey(0), x, jnp.zeros((2,)), ctx)
    if args.what == 'int8':
        from ln3diff_tpu.ops.int8 import quantize_dit
        model, v = quantize_dit(cfg, v, x, jnp.zeros((2,)), ctx)
    step = jax.jit(lambda v, x, t, c: model.apply(v, x, t, c))
    profile_fn(lambda: step(v, x, jnp.zeros((2,)), ctx), iters=args.iters)


if __name__ == '__main__':
    _cli()
