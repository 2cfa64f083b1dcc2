"""Worker process for tests/test_distributed_smoke.py.

Runs as ONE RANK of a real 2-process ``jax.distributed`` CPU cluster
(gloo collectives) and exercises, without any monkeypatching, the
multi-host behaviors the unit tests can only simulate:

- ``PreemptionGuard``: SIGTERM lands on rank 0 only; the latched
  ``process_allgather`` collective must stop BOTH ranks at the same
  step (``training/preemption.py`` module docstring).
- per-host data decorrelation: ``host_shard()`` /
  ``InfiniteSampler(rank, n)`` index streams and ``host_rng`` crops
  must differ across real processes.
- SPMD lockstep: each train step reduces a globally-sharded array
  (cross-process psum through gloo), so identical params on both ranks
  at the stop step prove the cluster really computed together.
- checkpoint/resume: the stopped state round-trips through the numpy
  checkpoint format at the synchronized stop step.

Usage: ``python distributed_smoke_worker.py <pid> <port> <outdir>``.
Writes ``result<pid>.json`` + a per-step ``hb<pid>`` heartbeat file.
"""

import json
import os
import sys
import time


def main():
    pid, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
    os.environ['JAX_PLATFORMS'] = 'cpu'
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), '..'))

    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_cpu_collectives_implementation', 'gloo')
    jax.distributed.initialize(f'127.0.0.1:{port}', num_processes=2,
                               process_id=pid)
    assert jax.process_count() == 2, jax.process_count()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ln3diff_tpu.parallel.mesh import host_rng, host_shard
    from ln3diff_tpu.training.preemption import PreemptionGuard
    from ln3diff_tpu.utils.misc import InfiniteSampler

    # -- per-host data decorrelation (real process_index/count) ----------
    rank, n_ranks = host_shard()
    assert (rank, n_ranks) == (pid, 2)
    it = iter(InfiniteSampler(16, rank, n_ranks, shuffle=False))
    draws = [int(next(it)) for _ in range(8)]
    crop = host_rng(0).integers(0, 10_000, size=4).tolist()

    # -- SPMD train step over a globally-sharded batch --------------------
    mesh = Mesh(np.array(jax.devices()), ('dp',))
    gx = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P('dp')),
        np.full((2, 4), float(rank + 1), np.float32))  # 2 local devices

    @jax.jit
    def train_step(p, x):
        # global mean over the dp-sharded batch → cross-process psum
        return p - 0.01 * (jnp.mean(x) * jnp.ones_like(p))

    params = jnp.zeros((4,))
    hb = os.path.join(outdir, f'hb{pid}')

    stop_step = 0
    with PreemptionGuard(check_interval=3) as guard:
        while stop_step < 2000:
            params = train_step(params, gx)
            jax.block_until_ready(params)
            stop_step += 1
            with open(hb, 'w') as f:
                f.write(str(stop_step))
            if guard.should_stop():
                break
            time.sleep(0.01)
        preempted = bool(guard.preempted)
        signal_received = bool(guard.signal_received)

    # -- checkpoint at the synchronized stop step -------------------------
    from ln3diff_tpu.training.checkpoint import (load_numpy_checkpoint,
                                                 save_numpy_checkpoint)
    ck = os.path.join(outdir, f'ckpt_rank{pid}.npz')
    save_numpy_checkpoint(ck, {'params': np.asarray(params),
                               'step': np.asarray(stop_step)})
    back = load_numpy_checkpoint(ck, {'params': np.zeros(4, np.float32),
                                      'step': np.asarray(0)})
    assert int(back['step']) == stop_step

    with open(os.path.join(outdir, f'result{pid}.json'), 'w') as f:
        json.dump({'rank': rank, 'draws': draws, 'crop': crop,
                   'stop_step': stop_step, 'preempted': preempted,
                   'signal_received': signal_received,
                   'param0': float(np.asarray(params)[0]),
                   'resumed_step': int(back['step'])}, f)
    jax.distributed.shutdown()


if __name__ == '__main__':
    main()
