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


# ---------------------------------------------------------------------------
# round-5: the qkv+attention MEGA-KERNEL attempt (VERDICT r4 #6) — fuse
# the qkv projection INTO the attention kernel so q/k/v never round-trip
# HBM and the (B, L, H, d) head reshape copies disappear.  The out
# projection stays in XLA (it fuses with the residual add; folding it in
# would push the VMEM working set past 16 MB).
# ---------------------------------------------------------------------------


def _qkv_attn_kernel(x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref,
                     bv_ref, o_ref, *, scale: float):
    """One grid step = one (batch, head) pair.  The head's (D, d)
    weight slices stream per step (Mosaic double-buffers them while the
    x block stays resident across the head-major inner grid axis); the
    first all-grid VMEM attempt (whole (H, D, d) weights resident)
    OOMed scoped vmem at 20.8 MB vs the 16 MB limit."""
    x = x_ref[0]                                     # (L, D) bf16
    # biases ride as full (H, d) blocks — a (1, d) block violates the
    # (8, 128) sublane tiling rule, and a dynamic sublane index must be
    # a multiple of 8; a one-hot masked reduce selects row h instead
    # (H·d elems, trivial VPU cost)
    h = pl.program_id(1)
    onehot = (jax.lax.broadcasted_iota(
        jnp.int32, bq_ref.shape, 0) == h).astype(jnp.float32)

    def bias_row(b_ref):
        return jnp.sum(b_ref[:].astype(jnp.float32) * onehot, axis=0)

    q = jax.lax.dot_general(
        x, wq_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bias_row(bq_ref)
    k = jax.lax.dot_general(
        x, wk_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bias_row(bk_ref)
    v = jax.lax.dot_general(
        x, wv_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bias_row(bv_ref)
    s = jax.lax.dot_general(
        q.astype(x.dtype), k.astype(x.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # (L, L) f32
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x.dtype)
    o = jax.lax.dot_general(
        p, v.astype(x.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # (L, d)
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('num_heads', 'interpret'))
def fused_qkv_attention(x, wq, wk, wv, bq, bk, bv, num_heads: int,
                        interpret: bool = False):
    """qkv projection + multi-head attention in ONE Pallas kernel.

    Args:
      x: ``(B, L, D)``; wq/wk/wv: head-major ``(H, D, d)`` (see
        :func:`split_qkv_weights`); bq/bk/bv: ``(H, d)``.
    Returns:
      ``(B, L, D)`` — heads re-concatenated, BEFORE the out projection.

    VMEM/step at DiT-L serving shapes (L=768, D=1024, H=16, d=64):
    x 1.5 MB + 3×(D, d) weight blocks (0.4 MB, double-buffered) + f32
    scores 2.25 MB + q/k/v/out transients ≈ 6 MB.
    """
    B, L, D = x.shape
    H = num_heads
    d = D // H
    scale = 1.0 / (d ** 0.5)
    xb = pl.BlockSpec((1, L, D), lambda b, h: (b, 0, 0),
                      memory_space=pltpu.VMEM)
    wb = pl.BlockSpec((1, D, d), lambda b, h: (h, 0, 0),
                      memory_space=pltpu.VMEM)
    bb = pl.BlockSpec((H, d), lambda b, h: (0, 0),
                      memory_space=pltpu.VMEM)
    ob = pl.BlockSpec((1, 1, L, d), lambda b, h: (b, h, 0, 0),
                      memory_space=pltpu.VMEM)
    o = pl.pallas_call(
        functools.partial(_qkv_attn_kernel, scale=scale),
        grid=(B, H),
        in_specs=[xb, wb, wb, wb, bb, bb, bb],
        out_specs=ob,
        out_shape=jax.ShapeDtypeStruct((B, H, L, d), x.dtype),
        interpret=interpret,
    )(x, wq, wk, wv, bq, bk, bv)
    return o.transpose(0, 2, 1, 3).reshape(B, L, D)


def split_qkv_weights(kernel, bias, num_heads: int):
    """Stock qkv ``nn.Dense`` params ``(D, 3D)``/``(3D,)`` → head-major
    ``(wq, wk, wv)`` ``(H, D, d)`` + ``(bq, bk, bv)`` ``(H, d)``.  A
    one-time serving-side layout transform (do NOT trace per step)."""
    D = kernel.shape[0]
    d = D // num_heads
    ws, bs = [], []
    for i in range(3):
        w = kernel[:, i * D:(i + 1) * D].reshape(D, num_heads, d)
        ws.append(jnp.transpose(w, (1, 0, 2)))       # (H, D, d)
        bs.append(bias[i * D:(i + 1) * D].reshape(num_heads, d)
                  if bias is not None else
                  jnp.zeros((num_heads, d), kernel.dtype))
    return tuple(ws), tuple(bs)
