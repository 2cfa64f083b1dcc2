"""Shared helpers for the entry scripts."""

from __future__ import annotations


def train_until(trainer, data, total_steps: int, save_interval: int, ckpt,
                logger, **run_kwargs) -> int:
    """Chunked train loop with checkpointing and preemption safety.

    Runs ``trainer.run_loop`` in ``save_interval``-step chunks, saving a
    checkpoint after each; a SIGTERM (preemptible TPU eviction notice)
    stops at the next step boundary and saves before returning.  Returns
    the final step.  Extra kwargs go to ``run_loop`` (eval_fn, ...).
    """
    from ln3diff_tpu.training.preemption import PreemptionGuard

    step = int(trainer._state.step)
    with PreemptionGuard() as guard:
        while step < total_steps:
            n = min(save_interval, total_steps - step)
            trainer.run_loop(data, num_steps=n, step_offset=step,
                             guard=guard, **run_kwargs)
            step = int(trainer._state.step)
            ckpt.save(step, trainer._state, wait=guard.preempted)
            logger.log(f'saved checkpoint @ {step}')
            if guard.preempted:
                logger.log('preempted: checkpoint saved, exiting cleanly')
                break
    return step
