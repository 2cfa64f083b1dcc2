"""Opt-in W8A8 int8 quantized serving for the denoisers (DiT + U-Net).

The v5e MXU runs int8×int8→int32 matmuls at ~2× the bf16 rate.  The
DiT-L/2 sampling scan is compute-bound in its projections (measured
81–90% MFU at bf16 — ``docs/TPU_PERF_NOTES.md`` "closing profiles"), so
weight-only quantization cannot help (it just adds a dequant); the win
requires *both* operands int8 on the MXU.  This module provides:

* ``quantize_weight`` — symmetric per-output-channel int8 weights;
* ``int8_dense`` — dynamic per-token activation quantization + int8
  ``dot_general`` (int32 accumulation) + f32 rescale;
* ``Int8Dense`` — a drop-in for ``flax.linen.Dense`` storing
  ``kernel_q`` (int8) + ``scale``;
* ``Int8Conv`` — the NHWC conv analogue (ResBlock/attention convs of
  the LSGM U-Net);
* ``quantize_params_like`` — fills an Int8Dense/Int8Conv-bearing param
  structure from a trained bf16/f32 pytree (same tree, ``kernel``
  leaves replaced by ``kernel_q``/``scale``), so converted reference
  checkpoints and trained states quantize in one call — plus the
  one-call wrappers ``quantize_dit`` / ``quantize_unet``.

This is an inference-accuracy trade the reference does not make
(its serving path is fp16/fp32 torch); it is therefore strictly opt-in
(``DiTConfig.quantized``, ``--int8_dit``) and the parity/bench default
stays bf16.  Accuracy bound is pinned by ``tests/test_int8.py``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array, all_but_last: bool = False):
    """Symmetric per-output-channel int8 quantization.

    ``w``: (..., in, out) — any leading stacking axes (scan-stacked block
    weights are (depth, in, out)).  Default reduces |max| over the
    contraction axis (ndim-2) only, giving one scale per (stack..., out)
    channel; ``all_but_last=True`` reduces every leading axis — the conv
    layout (kh, kw, in, out) whose contraction spans all three.
    Returns ``(w_q int8, scale f32)``.
    """
    w = w.astype(jnp.float32)
    axes = tuple(range(w.ndim - 1)) if all_but_last else (w.ndim - 2,)
    amax = jnp.max(jnp.abs(w), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(w / scale), -127, 127)
    return w_q.astype(jnp.int8), scale.reshape(
        tuple(d for i, d in enumerate(w.shape) if i not in axes))


def _quantize_rows(x: jax.Array):
    """Dynamic symmetric per-token (last-axis row) int8 quantization."""
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    x_q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return x_q, scale


def int8_dense(x: jax.Array, w_q: jax.Array, w_scale: jax.Array,
               bias=None, dtype=jnp.bfloat16) -> jax.Array:
    """``x @ dequant(w_q)`` with both operands int8 on the MXU.

    ``x``: (..., in) any leading dims; ``w_q``: (in, out) int8;
    ``w_scale``: (out,) f32.  Accumulates int32, rescales in f32 by
    ``row_scale · w_scale`` (exact — both are powers of the stored
    amax/127, no double-rounding), returns ``dtype``.
    """
    x_q, x_scale = _quantize_rows(x)
    acc = jax.lax.dot_general(
        x_q, w_q, (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (x_scale * w_scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


class Int8Dense(nn.Module):
    """Drop-in for ``nn.Dense`` with W8A8 int8 matmul storage/compute.

    Params: ``kernel_q`` (in, out) int8, ``scale`` (out,) f32, ``bias``.
    Random init quantizes a lecun-normal sample (sane magnitudes for
    smoke runs); trained weights arrive via ``quantize_params_like``.
    """
    features: int
    use_bias: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]

        def kernel_init(key, shape):
            w = nn.initializers.lecun_normal()(key, shape, jnp.float32)
            return quantize_weight(w)[0]

        def scale_init(key, shape):
            # lecun-normal amax ≈ 3σ = 3/sqrt(in)
            return jnp.full(shape, 3.0 / (127.0 * jnp.sqrt(float(in_dim))),
                            jnp.float32)

        w_q = self.param('kernel_q', kernel_init, (in_dim, self.features))
        w_scale = self.param('scale', scale_init, (self.features,))
        bias = self.param('bias', nn.initializers.zeros,
                          (self.features,)) if self.use_bias else None
        return int8_dense(x, w_q, w_scale, bias, dtype=self.dtype)


class Int8Conv(nn.Module):
    """Drop-in for ``nn.Conv`` (NHWC) with W8A8 int8 compute.

    Per-output-channel weight scales (reduced over kh·kw·in — the conv
    contraction); dynamic per-sample activation scales (one amax per
    batch item — zero padding quantizes to exact 0, so 'SAME' borders
    are unaffected).  Params: ``kernel_q`` (kh, kw, in, out) int8,
    ``scale`` (out,) f32, ``bias``.
    """
    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: Any = 'SAME'
    use_bias: bool = True
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size

        def kernel_init(key, shape):
            w = self.kernel_init(key, shape, jnp.float32)
            return quantize_weight(w, all_but_last=True)[0]

        def scale_init(key, shape):
            fan_in = kh * kw * in_ch
            return jnp.full(shape, 3.0 / (127.0 * jnp.sqrt(float(fan_in))),
                            jnp.float32)

        w_q = self.param('kernel_q', kernel_init,
                         (kh, kw, in_ch, self.features))
        w_scale = self.param('scale', scale_init, (self.features,))
        bias = self.param('bias', nn.initializers.zeros,
                          (self.features,)) if self.use_bias else None

        xf = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True)
        x_scale = jnp.maximum(amax, 1e-12) / 127.0
        x_q = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            x_q, w_q, window_strides=self.strides, padding=self.padding,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * (x_scale * w_scale)
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y.astype(self.dtype)


def _quantize_model(model_ctor, cfg, den_vars, args, seed: int):
    import dataclasses

    qcfg = dataclasses.replace(cfg, quantized=True)
    qmodel = model_ctor(qcfg)
    q_struct = jax.eval_shape(lambda k: qmodel.init(k, *args),
                              jax.random.PRNGKey(seed))
    q_params = jax.jit(
        lambda p: quantize_params_like(q_struct['params'], p))(
            den_vars['params'])
    return qmodel, dict(den_vars, params=q_params)


def quantize_dit(cfg, den_vars, x, t, ctx, seed: int = 1):
    """One-call serving quantization for a DiT denoiser.

    Takes the bf16/f32 ``DiTConfig`` + loaded variables and example
    inputs; returns ``(quantized_model, quantized_variables)`` ready to
    swap into a pipeline.  Used by the sampler CLI, the gradio demo and
    ``bench.py`` (``--int8_dit`` / ``LN3DIFF_BENCH_INT8=1``).
    """
    from ..models.dit import DiT_TriLatent
    return _quantize_model(DiT_TriLatent, cfg, den_vars, (x, t, ctx), seed)


def quantize_unet(cfg, den_vars, x, t, ctx, seed: int = 1):
    """Serving quantization for the LSGM U-Net (ShapeNet/FFHQ path):
    ResBlock convs, attention projections and GEGLU transformer layers
    go W8A8; conv_in/conv_out, the time MLP and ``mixing_logit`` stay
    bf16/f32."""
    from ..models.unet import UNetModel
    return _quantize_model(UNetModel, cfg, den_vars, (x, t, ctx), seed)


def quantize_params_like(q_params, params):
    """Fill an ``Int8Dense``-bearing param tree from a trained pytree.

    ``q_params``: the quantized model's param structure (e.g. from
    ``jax.eval_shape`` of its init);  ``params``: the trained bf16/f32
    params of the UNquantized twin (same module names).  Wherever
    ``q_params`` holds ``kernel_q``/``scale``, the trained ``kernel`` is
    quantized in; every other leaf is copied from ``params`` verbatim.
    """
    if isinstance(q_params, dict):
        if 'kernel_q' in q_params:
            # the target scale rank says which layout this is: rank 1 =
            # conv (reduce all leading axes), rank = kernel rank - 1 =
            # (possibly scan-stacked) dense (reduce the in axis only)
            conv = getattr(q_params['scale'], 'ndim', 1) == 1 \
                and params['kernel'].ndim > 2
            w_q, scale = quantize_weight(params['kernel'],
                                         all_but_last=conv)
            out = {'kernel_q': w_q, 'scale': scale}
            if 'bias' in q_params:
                out['bias'] = params['bias']
            return out
        missing = set(q_params) - set(params)
        if missing:
            raise ValueError(f'param tree mismatch: {sorted(missing)} '
                             'absent from the source params')
        return {k: quantize_params_like(v, params[k]) for k, v in
                q_params.items()}
    return params
