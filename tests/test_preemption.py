"""Preemption-safe training (``training/preemption.py``).

The reference has no failure handling (SURVEY §5.3: crash → manual
``--resume_checkpoint``); preemptible TPU VMs deliver SIGTERM before
eviction, and the guard turns that into a stop-at-step-boundary +
checkpoint + clean exit.
"""

import os
import signal

import jax
import jax.numpy as jnp
import numpy as np

from ln3diff_tpu.models.dit import DiTConfig, DiT_TriLatent
from ln3diff_tpu.parallel.mesh import MeshConfig, make_mesh
from ln3diff_tpu.training.ldm_trainer import LDMTrainConfig, LDMTrainer
from ln3diff_tpu.training.preemption import PreemptionGuard


def _tiny_trainer():
    mesh = make_mesh(MeshConfig(data=1), devices=jax.devices()[:1])
    cfg = DiTConfig(input_size=8, patch_size=2, in_channels=4,
                    hidden_size=32, depth=1, num_heads=2,
                    variant='text', context_dim=16, dtype=jnp.float32)
    trainer = LDMTrainer(
        DiT_TriLatent(cfg),
        LDMTrainConfig(objective='flow_matching', lr=1e-3,
                       triplane_scaling_divider=1.0, log_interval=10**6),
        mesh=mesh)

    def data():
        rng = np.random.default_rng(0)
        while True:
            yield {'latent': rng.standard_normal((2, 8, 8, 12),
                                                 ).astype(np.float32),
                   'context': {'crossattn': np.ones((2, 7, 16),
                                                    np.float32)}}

    it = data()
    trainer.build(next(it))
    return trainer, it


class TestPreemptionGuard:

    def test_sigterm_latches_flag_and_restores_handler(self):
        before = signal.getsignal(signal.SIGTERM)
        with PreemptionGuard() as guard:
            assert not guard.preempted
            os.kill(os.getpid(), signal.SIGTERM)
            assert guard.preempted
            assert guard.should_stop()
        assert signal.getsignal(signal.SIGTERM) is before

    def test_chains_previous_python_handler(self):
        hits = []
        prev = signal.signal(signal.SIGTERM, lambda s, f: hits.append(s))
        try:
            with PreemptionGuard():
                os.kill(os.getpid(), signal.SIGTERM)
            assert hits == [signal.SIGTERM]
        finally:
            signal.signal(signal.SIGTERM, prev)

    def test_run_loop_stops_at_step_boundary(self):
        trainer, it = _tiny_trainer()
        with PreemptionGuard() as guard:
            os.kill(os.getpid(), signal.SIGTERM)
            trainer.run_loop(it, num_steps=50, guard=guard)
        # signal landed before step 1 → exactly one step ran
        assert int(trainer._state.step) == 1

    def test_run_loop_unaffected_without_signal(self):
        trainer, it = _tiny_trainer()
        with PreemptionGuard() as guard:
            trainer.run_loop(it, num_steps=3, guard=guard)
        assert int(trainer._state.step) == 3

    def test_multihost_stop_is_synchronized(self, monkeypatch):
        """Simulate N hosts where SIGTERM lands on ONE: every host must
        see the stop at the SAME step (the collective cadence point) and
        ``preempted`` must agree across hosts at every poll — the SPMD
        invariant the module docstring calls hard.  Regression test for
        the round-2 advisor finding: ``preempted`` used to report the
        raw local flag, so signaled and unsignaled hosts took different
        save/exit paths and desynced in the next collective."""
        import jax
        from jax.experimental import multihost_utils

        n_hosts = 3
        guards = [PreemptionGuard(check_interval=4) for _ in range(n_hosts)]
        monkeypatch.setattr(jax, 'process_count', lambda: n_hosts)
        monkeypatch.setattr(
            multihost_utils, 'process_allgather',
            lambda x: np.asarray([g._signal.is_set() for g in guards]))

        signal_step = 2        # lands on host 1 only, mid-interval
        stop_step = {}
        for step in range(1, 10):
            if step == signal_step:
                guards[1]._signal.set()
            polls = [g.should_stop() for g in guards]
            flags = [g.preempted for g in guards]
            # hard invariant: identical answers on every host, always —
            # including while host 1's local signal is still unconfirmed
            assert len(set(polls)) == 1, (step, polls)
            assert len(set(flags)) == 1, (step, flags)
            for h, p in enumerate(polls):
                if p and h not in stop_step:
                    stop_step[h] = step
            if all(polls):
                break
        # all hosts stopped, at the same step, on the collective cadence
        assert set(stop_step) == set(range(n_hosts))
        assert len(set(stop_step.values())) == 1
        assert list(stop_step.values())[0] == 4  # first cadence >= signal
        # the save/exit branch (train_until: `if guard.preempted`) is
        # identical everywhere, and latched for later polls
        assert all(g.preempted for g in guards)
        assert all(g.should_stop() for g in guards)
        # only host 1 ever saw the raw local signal
        assert [g.signal_received for g in guards] == [False, True, False]

    def test_multihost_preempted_false_before_collective(self, monkeypatch):
        """A locally-signaled host must NOT report preempted before the
        collective confirms it — otherwise it exits run_loop/train_until
        while its peers re-enter and hang in the next allgather."""
        import jax
        from jax.experimental import multihost_utils

        guards = [PreemptionGuard(check_interval=100) for _ in range(2)]
        monkeypatch.setattr(jax, 'process_count', lambda: 2)
        monkeypatch.setattr(
            multihost_utils, 'process_allgather',
            lambda x: np.asarray([g._signal.is_set() for g in guards]))

        guards[0]._signal.set()
        assert guards[0].signal_received
        # not yet confirmed by any collective → both report False
        assert [g.preempted for g in guards] == [False, False]
        assert [g.should_stop() for g in guards] == [False, False]

    def test_train_until_saves_on_preemption(self, tmp_path):
        """The shared entry-script loop saves a resumable checkpoint at
        the preempted step (scripts_lib.train_until)."""
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                        'scripts'))
        from scripts_lib import train_until

        from ln3diff_tpu.training.checkpoint import CheckpointManager
        from ln3diff_tpu.utils import logger

        trainer, it = _tiny_trainer()
        ckpt = CheckpointManager(str(tmp_path / 'ckpt'))

        steps_before_kill = 2
        orig_step_fn = trainer._step_fn

        def step_then_kill(state, batch, rng):
            out = orig_step_fn(state, batch, rng)
            if int(out[0].step) == steps_before_kill:
                os.kill(os.getpid(), signal.SIGTERM)
            return out

        trainer._step_fn = step_then_kill
        final = train_until(trainer, it, total_steps=100, save_interval=50,
                            ckpt=ckpt, logger=logger)
        ckpt.close()
        assert final == steps_before_kill
        assert ckpt.latest_step() == steps_before_kill
        restored = ckpt.restore(trainer._state)
        assert int(restored.step) == steps_before_kill
