"""Fused short-sequence attention kernel for the DiT sampling path.

DiT-L/2 serving shapes (B=2 CFG pair, H=16, L=768, d=64) are far below
the regime where flash-style streaming attention pays off on TPU — the
stock ``jax.experimental.pallas.ops.tpu.flash_attention`` measured
494 µs/block vs ~100 µs for XLA's unfused lowering (grid too small to
pipeline; see ``docs/TPU_PERF_NOTES.md``).  But XLA's lowering is not
free either: it materializes the f32 score tensor (B·H·L² = 75 MB at
DiT-L shapes) through HBM between the QKᵀ fusion and the softmax·V
fusion — ~48 µs of the ~61 µs attention-math cost is that round-trip.

This kernel takes the opposite corner of the design space: one grid
step per (batch·head), the whole (L, L) score tile resident in VMEM
(L=768 → 2.4 MB f32), QKᵀ → softmax → ·V with no HBM traffic beyond
reading Q/K/V once and writing the (L, d) output.  All matmul
accumulation and the softmax run in f32 — the same math XLA's lowering
does, so this is a layout optimization, not a precision trade.

Reference semantics: ``jax.nn.dot_product_attention(q, k, v)``
(reference attention is xformers ``memory_efficient_attention``,
``dit/dit_models_xformers.py:60-105`` — same math).

VMEM budget per step: Q,K,V bf16 (3 × L·d·2 B = 294 KB at L=768,d=64)
+ f32 scores (L² · 4 B = 2.36 MB) + out (L·d·4 B) — comfortably inside
the 16 MiB budget with double buffering.  Use for L ≲ 2048; above that,
switch back to XLA/flash.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]                                     # (L, d) native dtype
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (L, L) f32
    s = s * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / denom).astype(q.dtype)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (L, d) f32
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('interpret',))
def fused_attention(q, k, v, interpret: bool = False):
    """Self-attention on (B, L, H, d) operands — drop-in for
    ``jax.nn.dot_product_attention`` at short L.

    Scores/softmax in f32, probabilities cast to the input dtype for the
    MXU ·V matmul (XLA's lowering does the same cast).  Scale is the
    standard 1/sqrt(d).
    """
    B, L, H, d = q.shape
    scale = 1.0 / (d ** 0.5)

    def heads_first(t):
        # (B, L, H, d) -> (B*H, L, d)
        return t.transpose(0, 2, 1, 3).reshape(B * H, L, d)

    qf, kf, vf = heads_first(q), heads_first(k), heads_first(v)
    blk = pl.BlockSpec((1, L, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    o = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(B * H,),
        in_specs=[blk, blk, blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((B * H, L, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return o.reshape(B, H, L, d).transpose(0, 2, 1, 3)


def sdpa_auto(q, k, v, use_fused: bool = False):
    """Dispatch: the fused VMEM-resident kernel on TPU when requested
    (serving paths), else XLA's ``jax.nn.dot_product_attention``."""
    if use_fused and jax.default_backend() == 'tpu':
        return fused_attention(q, k, v)
    return jax.nn.dot_product_attention(q, k, v)
