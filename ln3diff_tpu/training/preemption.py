"""Preemption-safe training: catch SIGTERM, stop at the next step
boundary, checkpoint, exit cleanly.

TPU-native addition with no reference counterpart (SURVEY §5.3: the
reference's failure handling is "none; crash → manual
``--resume_checkpoint``").  Preemptible/spot TPU VMs receive SIGTERM
~30 s before eviction; with this guard a run loses at most the current
step instead of up to ``save_interval`` steps of work.

Usage (all training entry scripts)::

    with PreemptionGuard() as guard:
        while step < total_steps:
            trainer.run_loop(data, num_steps=n, step_offset=step,
                             guard=guard)
            ckpt.save(int(trainer._state.step), trainer._state,
                      wait=guard.preempted)
            if guard.preempted:
                break

Multi-host semantics: the eviction signal lands on individual hosts, so
``should_stop`` must return the same answer on every process or the
SPMD program desyncs.  With ``jax.process_count() > 1`` the guard ORs
the local flag across hosts with a collective, but only every
``check_interval`` calls — every process reaches the same call count at
the same step, so the collective cadence (and therefore the stop step)
is identical everywhere.
"""

from __future__ import annotations

import signal
import threading
from typing import Optional

import numpy as np


class PreemptionGuard:
    """Context manager that latches SIGTERM (and optionally other
    signals) into a flag polled by the training loops."""

    def __init__(self, signals=(signal.SIGTERM,), check_interval: int = 1):
        self.signals = tuple(signals)
        self.check_interval = max(1, int(check_interval))
        self._preempted = threading.Event()
        self._previous: dict = {}
        self._calls = 0

    # -- signal plumbing ----------------------------------------------------

    def _handler(self, signum, frame):
        self._preempted.set()
        prev = self._previous.get(signum)
        # Chain to a pre-existing Python-level handler (e.g. a cluster
        # agent's own bookkeeping) but never re-raise the default
        # terminate action — the whole point is to finish the step.
        if callable(prev) and prev not in (signal.SIG_IGN, signal.SIG_DFL,
                                           signal.default_int_handler):
            prev(signum, frame)

    def __enter__(self) -> 'PreemptionGuard':
        for sig in self.signals:
            self._previous[sig] = signal.signal(sig, self._handler)
        return self

    def __exit__(self, *exc) -> None:
        for sig, prev in self._previous.items():
            signal.signal(sig, prev)
        self._previous.clear()
        return None

    # -- polling ------------------------------------------------------------

    @property
    def preempted(self) -> bool:
        return self._preempted.is_set()

    def should_stop(self) -> bool:
        """Poll once per train step.  Single process: the local flag.
        Multi-process: a cross-host OR every ``check_interval`` calls
        (same cadence on every host — see module docstring)."""
        self._calls += 1
        import jax
        if jax.process_count() == 1:
            return self.preempted
        if self._calls % self.check_interval:
            return False
        from jax.experimental import multihost_utils
        flag = multihost_utils.process_allgather(
            np.asarray(self.preempted, np.bool_))
        return bool(np.any(flag))
