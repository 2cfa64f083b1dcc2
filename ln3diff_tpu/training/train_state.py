"""Train state, EMA, mixed precision and the pjit train-step builder.

Replaces the reference's runtime triple
(``guided_diffusion/fp16_util.py:149`` ``MixedPrecisionTrainer``,
``guided_diffusion/train_util.py:31`` ``TrainLoop`` internals,
``nsr/train_util.py:179`` DDP wrap):

  * mixed precision — params live in f32, compute in bf16 (TPU-native; no
    loss-scaling needed, unlike the reference's fp16 master-param path);
  * grad accumulation — ``lax.scan`` over microbatches inside one jitted
    step (the reference's Python microbatch loop + ``no_sync()``);
  * DDP all-reduce — pjit over the mesh; XLA inserts the psum;
  * EMA — pytree lerp per rate (reference ``_update_ema:396``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any            # dict: rate-name → pytree (or empty dict)
    constants: Any = None      # non-trainable collections (pos embeds, ...)
    tx: optax.GradientTransformation = struct.field(pytree_node=False,
                                                    default=None)

    def apply_gradients(self, grads, ema_rates: tuple = ()):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                               self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = {}
        for name, rate in ema_rates:
            old = self.ema_params[name]
            new_ema[name] = jax.tree_util.tree_map(
                lambda e, p: e * rate + p.astype(e.dtype) * (1 - rate), old,
                new_params)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state,
                            ema_params=new_ema if ema_rates
                            else self.ema_params)


def create_train_state(params, tx: optax.GradientTransformation,
                       ema_rates: tuple = (), constants=None) -> TrainState:
    # EMA must hold distinct buffers — aliasing params breaks buffer
    # donation of the train state (donate-same-buffer-twice).
    ema = {name: jax.tree_util.tree_map(jnp.copy, params)
           for name, _ in ema_rates}
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), ema_params=ema,
                      constants=constants, tx=tx)


def make_optimizer(lr: float, weight_decay: float = 0.01,
                   betas=(0.9, 0.999), grad_clip: Optional[float] = 0.5,
                   warmup_steps: int = 0,
                   total_steps: Optional[int] = None,
                   lr_groups: Optional[dict] = None
                   ) -> optax.GradientTransformation:
    """AdamW with grad clipping (the reference clips at 0.5 in AMP mode,
    ``fp16_util.py:241``) and optional warmup/anneal.

    ``lr_groups`` maps top-level param-subtree names to their own
    learning rate (the reference's per-submodule AdamW param groups,
    e.g. ``--vit_decoder_lr``, ``nsr/train_util.py``)."""
    def sched_for(base_lr):
        if warmup_steps or total_steps:
            return optax.warmup_cosine_decay_schedule(
                0.0, base_lr, warmup_steps or 1,
                (total_steps or 10**9) - (warmup_steps or 0),
                end_value=base_lr * 0.1)
        return base_lr

    def adamw(base_lr):
        return optax.adamw(sched_for(base_lr), b1=betas[0], b2=betas[1],
                           weight_decay=weight_decay)

    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    if lr_groups:
        transforms = {'__base__': adamw(lr)}
        transforms.update({k: adamw(v) for k, v in lr_groups.items()})

        def label_fn(params):
            return {k: jax.tree.map(
                lambda _: (k if k in lr_groups else '__base__'), v)
                for k, v in params.items()}

        chain.append(optax.multi_transform(transforms, label_fn))
    else:
        chain.append(adamw(lr))
    return optax.chain(*chain)


def build_train_step(loss_fn: Callable, mesh: Mesh,
                     ema_rates: tuple = (('ema', 0.9999),),
                     microbatch_steps: int = 1,
                     donate: bool = True):
    """Build a pjit'd train step.

    Args:
      loss_fn: ``(params, constants, batch, rng) -> (loss, metrics_dict)``;
        runs on a microbatch.
      microbatch_steps: >1 → batch's leading axis is
        ``(microbatch_steps, micro_bs, ...)`` and gradients are averaged by
        an in-step ``lax.scan`` (reference grad-accum loop,
        ``train_util.py:353-394``).
    Returns:
      jitted ``step_fn(state, batch, rng) -> (state, metrics)`` with batch
      sharded over (data, fsdp) and state replicated/fsdp-sharded as built.
    """

    def grads_of(params, constants, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, constants, batch, rng)
        return grads, loss, metrics

    def step_fn(state: TrainState, batch, rng):
        if microbatch_steps > 1:
            # rank-0/1 leaves (e.g. the live 'step' scalar for KL anneal)
            # have no microbatch axis to scan over — broadcast them into
            # every microbatch instead.
            leaves, treedef = jax.tree_util.tree_flatten(batch)
            scanned_mask = [jnp.ndim(l) >= 2 for l in leaves]
            scanned = tuple(l for l, s in zip(leaves, scanned_mask) if s)
            static = [l for l, s in zip(leaves, scanned_mask) if not s]

            def scan_body(carry, scanned_micro):
                acc_grads, i = carry
                it_sc, it_st = iter(scanned_micro), iter(static)
                micro = jax.tree_util.tree_unflatten(
                    treedef, [next(it_sc) if s else next(it_st)
                              for s in scanned_mask])
                grads, loss, metrics = grads_of(
                    state.params, state.constants, micro,
                    jax.random.fold_in(rng, i))
                acc_grads = jax.tree_util.tree_map(jnp.add, acc_grads, grads)
                return (acc_grads, i + 1), (loss, metrics)

            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (grads, _), (losses, metrics) = jax.lax.scan(
                scan_body, (zero, 0), scanned)
            grads = jax.tree_util.tree_map(
                lambda g: g / microbatch_steps, grads)
            loss = losses.mean()
            # 'per_sample*' metrics are FEEDBACK vectors (e.g. the
            # loss-aware timestep resampler's per-sample losses,
            # reference resample.py update_with_local_losses) — flatten
            # the scan axis back into the batch axis instead of
            # mean-collapsing, so (S, micro_bs, ...) → (S·micro_bs, ...)
            # matches the host-side flattened t draw.
            metrics = {k: (v.reshape(-1, *v.shape[2:])
                           if k.startswith('per_sample') else v.mean())
                       for k, v in metrics.items()}
        else:
            grads, loss, metrics = grads_of(state.params, state.constants,
                                            batch, rng)
        new_state = state.apply_gradients(grads, ema_rates=ema_rates)
        gnorm = optax.global_norm(grads)
        metrics = dict(metrics, loss=loss, grad_norm=gnorm)
        return new_state, metrics

    batch_sharding = NamedSharding(mesh, P(('data', 'fsdp')))
    min_rank = 1
    if microbatch_steps > 1:
        batch_sharding = NamedSharding(mesh, P(None, ('data', 'fsdp')))
        min_rank = 2
    replicated = NamedSharding(mesh, P())

    jitted = jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    def call(state, batch, rng):
        # per-leaf placement: batch tensors shard over (data, fsdp);
        # rank-0 leaves (e.g. the live 'step' scalar for KL anneal)
        # replicate — a single static in_shardings entry would reject
        # them ("only valid for values of rank at least 1").
        batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, batch_sharding if jnp.ndim(x) >= min_rank
                else replicated), batch)
        return jitted(state, batch, rng)

    return call
