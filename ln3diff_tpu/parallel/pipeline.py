"""GPipe-style pipeline parallelism over scan-stacked transformer blocks.

The reference has NO pipeline parallelism (its only strategy is DDP data
parallelism, ``guided_diffusion/dist_util.py:57``); this module exceeds it
for DiT-XL-scale training where a single chip cannot hold a full block
stack plus activations.

TPU-native design (the collective-pipelining recipe): the mesh gains a
``pipe`` axis; the stacked block weights (leading layer axis, produced by
``nn.scan``) shard over it, so each device owns ``depth/pp`` contiguous
layers.  The batch splits into ``n_micro`` microbatches that flow through
the stages; activations hop stage→stage with ``jax.lax.ppermute`` over ICI
while every stage computes a different microbatch — the classic
(n_micro + pp − 1)-tick schedule with a pp−1 bubble.

Everything runs inside one ``shard_map`` region that is MANUAL on the
``pipe`` axis only (``axis_names={'pipe'}``): the data/fsdp/tensor axes
stay GSPMD-automatic, so pp composes with the existing dp/fsdp/tp
shardings without rewriting the surrounding train step.  The schedule is
a ``lax.scan`` over ticks — compile-friendly (one tick body), and
autodiff reverses it into the mirrored backward pipeline for free.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _slice_microbatch(tree, idx, n_micro):
    """Per-microbatch view of a batch-leading pytree: leaves (B, ...) →
    (B/n_micro, ...) at microbatch ``idx`` (a traced scalar)."""

    def f(a):
        if a is None:
            return None
        mb = a.shape[0] // n_micro
        return jax.lax.dynamic_slice_in_dim(a, idx * mb, mb, axis=0)

    return jax.tree_util.tree_map(f, tree)


def pipeline_blocks(block_chunk: Callable[[Any, jax.Array, Any], jax.Array],
                    stacked_params: Any, x: jax.Array, mb_context: Any,
                    *, mesh, n_micro: int, axis: str = 'pipe'):
    """Run ``depth`` stacked layers over ``pp`` pipeline stages.

    Args:
      block_chunk: ``(local_params, x_mb, ctx_mb) -> x_mb`` — applies this
        stage's layer chunk.  ``local_params`` leaves have leading axis
        ``depth // pp`` (the stage's slice of the scan-stacked weights);
        typically a ``lax.scan`` over them.
      stacked_params: pytree whose leaves lead with the layer axis
        (``depth``, ...) — sharded over ``axis`` here, so each stage reads
        only its chunk from HBM.
      x: ``(B, ...)`` activations entering layer 0.
      mb_context: pytree of per-sample side inputs (``(B, ...)`` leaves,
        e.g. adaLN conditioning / cross-attn context) — replicated across
        stages and sliced per microbatch in lockstep with ``x``.
      mesh: the device mesh; ``mesh.shape[axis]`` is the stage count.
      n_micro: number of microbatches (``B % n_micro == 0``).  The bubble
        fraction is ``(pp-1)/(n_micro+pp-1)`` — use ``n_micro >= 4*pp``
        for <20% overhead.

    Returns ``(B, ...)`` activations after all layers, replicated over
    ``axis`` (identical math to running the layers sequentially).
    """
    pp = mesh.shape[axis]
    if pp == 1:
        return block_chunk(stacked_params, x,
                           _slice_microbatch(mb_context, jnp.int32(0), 1)) \
            if n_micro == 1 else _pipeline_pp1(block_chunk, stacked_params,
                                               x, mb_context, n_micro)
    B = x.shape[0]
    assert B % n_micro == 0, (B, n_micro)
    mb = B // n_micro

    # The schedule's data movement runs in f32: blocks still compute in
    # their own dtype (flax modules cast inputs), but carries / hops /
    # the final broadcast-psum — and, crucially, the psums autodiff
    # inserts for cotangents of pipe-invariant inputs — stay f32.  XLA's
    # CPU AllReducePromotion pass crashes cloning bf16 all-reduces
    # (``Invalid binary instruction opcode copy``), and on TPU f32
    # accumulation over the (pp-deep) transposed pipeline is more
    # accurate for free relative to block FLOPs.
    out_dtype = x.dtype
    x = x.astype(jnp.float32)
    mb_context = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if jnp.issubdtype(
            a.dtype, jnp.floating) else a, mb_context)

    def stage_program(params_local, x_full, ctx_full):
        stage = jax.lax.axis_index(axis)
        last = pp - 1
        xs = x_full.reshape((n_micro, mb) + x_full.shape[1:])

        def tick(carry, t):
            recv, outputs = carry
            # stage s works on microbatch (t - s); outside [0, n_micro)
            # it's bubble — compute runs on stale data, writes are masked.
            mb_idx = jnp.clip(t - stage, 0, n_micro - 1)
            first_in = jax.lax.dynamic_index_in_dim(xs, mb_idx, axis=0,
                                                    keepdims=False)
            inp = jnp.where(stage == 0, first_in, recv)
            ctx = _slice_microbatch(ctx_full, mb_idx, n_micro)
            y = block_chunk(params_local, inp, ctx).astype(jnp.float32)
            valid = ((t - stage >= 0) & (t - stage < n_micro)
                     & (stage == last))
            upd = jax.lax.dynamic_update_index_in_dim(
                outputs, y, mb_idx, axis=0)
            outputs = jnp.where(valid, upd, outputs)
            # hand this tick's result to the next stage (ring; the wrap
            # from last→0 carries garbage that stage 0 never reads).
            recv = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % pp) for i in range(pp)])
            return (recv, outputs), None

        # carries are per-stage state: mark them varying over the pipe
        # axis up front so the scan's VMA types are loop-invariant.
        init = (jax.lax.pcast(
                    jnp.zeros((mb,) + x_full.shape[1:], x_full.dtype),
                    (axis,), to='varying'),
                jax.lax.pcast(jnp.zeros_like(xs), (axis,), to='varying'))
        (_, outputs), _ = jax.lax.scan(tick, init,
                                       jnp.arange(n_micro + pp - 1))
        # broadcast the last stage's result to every stage so the output
        # is replicated over the pipe axis (callers continue under GSPMD).
        outputs = jnp.where(stage == last, outputs,
                            jnp.zeros_like(outputs))
        outputs = jax.lax.psum(outputs, axis)
        return outputs.reshape(x_full.shape)

    layer_spec = jax.tree_util.tree_map(
        lambda p: P(axis, *([None] * (p.ndim - 1))), stacked_params)
    fn = jax.shard_map(stage_program, mesh=mesh,
                       in_specs=(layer_spec, P(), P()),
                       out_specs=P(), axis_names={axis})
    return fn(stacked_params, x, mb_context).astype(out_dtype)


def _pipeline_pp1(block_chunk, stacked_params, x, mb_context, n_micro):
    """pp == 1 degenerate schedule: plain microbatch loop (keeps the
    microbatched numerics/testing path without a pipe axis)."""
    B = x.shape[0]
    mb = B // n_micro
    xs = x.reshape((n_micro, mb) + x.shape[1:])

    def body(_, i):
        ctx = _slice_microbatch(mb_context, i, n_micro)
        return None, block_chunk(stacked_params, xs[i] * 1.0, ctx)

    # scan with stacked outputs (one chunk compile, like the pp>1 path)
    _, ys = jax.lax.scan(body, None, jnp.arange(n_micro))
    return ys.reshape(x.shape)


def split_stages(tree, pp: int):
    """Static helper: reshape scan-stacked leaves (L, ...) →
    (pp, L/pp, ...) for inspection/tests."""
    def f(a):
        L = a.shape[0]
        assert L % pp == 0, (L, pp)
        return a.reshape((pp, L // pp) + a.shape[1:])
    return jax.tree_util.tree_map(f, tree)


def dit_pipeline_apply(model, variables, x, timesteps, context, *,
                       mesh, n_micro: int, axis: str = 'pipe',
                       remat: bool = False):
    """Pipeline-parallel forward of a ``DiT_TriLatent``.

    The embed (patchify/conditioning) and head (final layer/unpatchify)
    stay in plain GSPMD-auto ``model.apply`` calls; only the scan-stacked
    block trunk — all the FLOPs — runs through :func:`pipeline_blocks`
    with its stacked weights sharded over ``axis``.  Numerics are
    identical to ``model.apply(variables, x, timesteps, context)``.
    """
    from ln3diff_tpu.models.dit import DiTBlock

    cfg = model.cfg
    B, H, W, _ = x.shape
    tokens, t, c, crossattn, dino = model.apply(
        variables, x, timesteps, context, method=model.embed)
    blocks = variables['params']['blocks']['block']
    depth = cfg.depth
    pp = mesh.shape[axis] if axis in mesh.shape else 1
    assert depth % max(pp, 1) == 0, (depth, pp)

    block_mod = DiTBlock(cfg.hidden_size, cfg.num_heads, cfg.mlp_ratio,
                         variant=cfg.variant, context_dim=cfg.context_dim,
                         exact_gelu=cfg.exact_gelu,
                         fused_attention=cfg.fused_attention,
                         dtype=cfg.dtype)

    def one_block(p, xb, ctx):
        cb, ca, dn = ctx
        return block_mod.apply({'params': p}, xb, cb, context=ca,
                               dino_tokens=dn)

    if remat:
        one_block = jax.checkpoint(one_block)

    def block_chunk(params_local, xb, ctx):
        def body(xb, p):
            return one_block(p, xb, ctx), None
        xb, _ = jax.lax.scan(body, xb, params_local)
        return xb

    tokens = pipeline_blocks(block_chunk, blocks, tokens,
                             (c, crossattn, dino), mesh=mesh,
                             n_micro=n_micro, axis=axis)
    return model.apply(variables, tokens, t, (B, H, W),
                       method=model.head)
