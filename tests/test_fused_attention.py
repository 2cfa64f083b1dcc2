"""Fused short-sequence attention kernel vs the XLA reference.

Mirrors the reference's ``impl='ref'`` numerical-ground-truth pattern
(SURVEY §4): the Pallas kernel runs in interpret mode on CPU and must
match ``jax.nn.dot_product_attention`` — same scale, same f32
softmax/accumulation semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ln3diff_tpu.ops.fused_attention import fused_attention, sdpa_auto


@pytest.mark.parametrize('B,L,H,d', [(2, 128, 4, 64), (1, 96, 2, 32)])
def test_fused_attention_matches_xla(B, L, H, d):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, L, H, d), jnp.float32)
    k = jax.random.normal(ks[1], (B, L, H, d), jnp.float32)
    v = jax.random.normal(ks[2], (B, L, H, d), jnp.float32)
    want = jax.nn.dot_product_attention(q, k, v)
    got = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_attention_bf16_inputs():
    """bf16 operands (the serving dtype): f32 softmax inside, output in
    the input dtype, close to the f32-computed reference."""
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    shape = (2, 64, 2, 64)
    q = jax.random.normal(ks[0], shape, jnp.bfloat16)
    k = jax.random.normal(ks[1], shape, jnp.bfloat16)
    v = jax.random.normal(ks[2], shape, jnp.bfloat16)
    want = jax.nn.dot_product_attention(q, k, v)
    got = fused_attention(q, k, v, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_sdpa_auto_dispatch():
    """Off-TPU, sdpa_auto must silently use the XLA path even when the
    fused kernel is requested (Pallas TPU kernels don't lower on CPU)."""
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (1, 32, 2, 16), jnp.float32)
    k = jax.random.normal(ks[1], (1, 32, 2, 16), jnp.float32)
    v = jax.random.normal(ks[2], (1, 32, 2, 16), jnp.float32)
    want = jax.nn.dot_product_attention(q, k, v)
    got = sdpa_auto(q, k, v, use_fused=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_fused_qkv_attention_matches_dense_plus_sdpa():
    """Round-5 mega-kernel (qkv proj fused INTO attention): numerics
    must match the stock Dense+sdpa chain exactly.  Measured SLOWER in
    context on v5e (414 vs 353 µs/call at DiT-L serving shapes — d=64
    halves MXU width on every per-head matmul; TPU_PERF_NOTES round-5)
    — kept as a tested, documented burial, not a serving path."""
    from ln3diff_tpu.ops.fused_attention import (fused_qkv_attention,
                                                 split_qkv_weights)

    B, L, D, H = 2, 96, 128, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, D), jnp.float32)
    wqkv = jax.random.normal(jax.random.PRNGKey(1), (D, 3 * D)) * 0.05
    bqkv = jax.random.normal(jax.random.PRNGKey(2), (3 * D,)) * 0.05
    qkv = x @ wqkv + bqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, L, H, D // H)

    ref = jax.nn.dot_product_attention(heads(q), heads(k),
                                       heads(v)).reshape(B, L, D)
    (wq, wk, wv), (bq, bk, bv) = split_qkv_weights(wqkv, bqkv, H)
    got = fused_qkv_attention(x, wq, wk, wv, bq, bk, bv, num_heads=H,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5)


def test_split_qkv_weights_layout():
    D, H = 32, 4
    kernel = jnp.arange(D * 3 * D, dtype=jnp.float32).reshape(D, 3 * D)
    bias = jnp.arange(3 * D, dtype=jnp.float32)
    (wq, wk, wv), (bq, bk, bv) = __import__(
        'ln3diff_tpu.ops.fused_attention',
        fromlist=['split_qkv_weights']).split_qkv_weights(kernel, bias, H)
    assert wq.shape == (H, D, D // H)
    d = D // H
    np.testing.assert_array_equal(np.asarray(wq[1]),
                                  np.asarray(kernel[:, d:2 * d]))
    np.testing.assert_array_equal(np.asarray(wk[0]),
                                  np.asarray(kernel[:, D:D + d]))
    np.testing.assert_array_equal(np.asarray(bv[-1]),
                                  np.asarray(bias[3 * D - d:]))
