"""Two REAL processes against a shared ``jax.distributed`` coordinator
(the JAX analogue of SURVEY §4's fake-backend requirement, round-3
VERDICT weak-item #7): the monkeypatched multi-host unit tests
(test_preemption.py, test_host_decorrelation.py) simulate
``process_count``; this suite actually spawns a 2-rank CPU cluster with
gloo collectives and SIGTERMs one rank mid-training.

Asserted end state (from tests/distributed_smoke_worker.py):
- both ranks stop at the SAME step although only rank 0 was signalled
  (the latched ``process_allgather`` in ``training/preemption.py``);
- rank 1 never saw a local signal yet reports ``preempted`` — the
  host-synchronized flag, not the raw local one;
- params identical across ranks at the stop step (every step ran a
  cross-process psum, so lockstep is proven, not assumed);
- per-host index streams disjoint and host RNG crops different;
- checkpoints written at the synchronized step round-trip.
"""

import json
import os
import signal
import socket
import subprocess
import sys
import time

import pytest

pytestmark = pytest.mark.slow

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      'distributed_smoke_worker.py')


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def _wait_heartbeats(outdir, min_step, timeout_s, procs):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        for p in procs:
            if p.poll() not in (None, 0):
                raise AssertionError(
                    f'worker died rc={p.poll()} before heartbeat')
        try:
            steps = [int(open(os.path.join(outdir, f'hb{i}')).read())
                     for i in range(2)]
            if min(steps) >= min_step:
                return steps
        except (FileNotFoundError, ValueError):
            pass
        time.sleep(0.1)
    raise AssertionError(f'no heartbeats >= {min_step} within {timeout_s}s')


class TestTwoProcessCluster:

    def test_sigterm_one_rank_stops_both_at_same_step(self, tmp_path):
        port = _free_port()
        env = dict(os.environ)
        env.pop('XLA_FLAGS', None)          # worker sets its own
        procs = [subprocess.Popen(
            [sys.executable, WORKER, str(i), str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True) for i in range(2)]
        try:
            _wait_heartbeats(str(tmp_path), 6, 180, procs)
            procs[0].send_signal(signal.SIGTERM)   # rank 0 ONLY
            for p in procs:
                out, _ = p.communicate(timeout=180)
                assert p.returncode == 0, out[-3000:]
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
                    p.wait()

        r = [json.load(open(tmp_path / f'result{i}.json'))
             for i in range(2)]
        # the latch: one signal, both ranks stop at the SAME step
        assert r[0]['stop_step'] == r[1]['stop_step'] >= 6
        assert r[0]['preempted'] and r[1]['preempted']
        assert r[0]['signal_received'] is True
        assert r[1]['signal_received'] is False
        # SPMD lockstep through real cross-process collectives:
        # params = -0.01 * step * global_mean([1,1,2,2]) = -0.015 * step
        want = -0.015 * r[0]['stop_step']
        assert abs(r[0]['param0'] - want) < 1e-5, (r[0]['param0'], want)
        assert r[0]['param0'] == r[1]['param0']
        # per-host decorrelation on REAL ranks
        assert not set(r[0]['draws']) & set(r[1]['draws'])
        assert r[0]['crop'] != r[1]['crop']
        # checkpoint/resume at the synchronized step
        assert r[0]['resumed_step'] == r[1]['resumed_step'] \
            == r[0]['stop_step']
