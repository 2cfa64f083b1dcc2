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
