"""Fused triplane point pipeline: bilinear lerp → plane-mean → OSG MLP.

The triplane hot loop (reference ``sample_from_planes`` +
``OSGDecoder.forward``, ``nsr/volumetric_rendering/renderer.py:81-104``,
``nsr/triplane.py:356-375``) decomposes on TPU into

  1. an XLA gather of corner-packed feature rows (descriptor-bound, the
     measured floor — see ``render/renderer.py:pack_corner_table``), and
  2. a per-point pipeline: 4-corner FMA lerp, mean over the 3 planes, a
     64-wide 2-layer MLP, sigmoid RGB clamping.

Stage 2 is HBM-bound under stock XLA: the lerped features (B,3,M,C), the
plane-mean (M,C) and the MLP hidden (M,64) each round-trip through HBM.
This module fuses stage 2 into ONE Pallas kernel that streams the
gathered rows tile-by-tile through VMEM and writes only the final
(rgb, sigma) — the intermediates never leave the chip.

``osg_pointwise_reference`` is the pure-jnp ground truth (the reference's
``impl='ref'`` testing pattern); ``osg_pointwise_fused`` is the kernel.

Training path: the op carries a ``jax.custom_vjp`` whose backward is a
second Pallas kernel (``_bwd_kernel``) that RECOMPUTES the forward
intermediates tile-by-tile in VMEM — residuals are just the inputs, so
the VJP stores nothing the gather didn't already produce, and the
backward's lerp/MLP intermediates never touch HBM either.  Weight grads
are accumulated across grid steps in a VMEM-resident block
(init at step 0, ``+=`` each step).  Gradients are exact w.r.t. every
input (incl. the ``live``/``inbox`` masks, matching ``jax.grad`` of the
jnp reference bit-for-bit in f32) so the op composes with the
renderer's autodiff like any jnp primitive.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# points per kernel instance.  TILE=512 measured latency-bound on v5e
# (4.6k grid steps/frame at ~8 µs each → 36.5 ms/frame); TILE=1024 halves
# the step count and feeds the MXU (1024, 32)·(32, 64) tiles.  2048 OOMs
# scoped VMEM (26 MiB with the in-kernel f32 widen + double buffering vs
# the 16 MiB limit).
TILE = 1024


def _sigmoid_clamp(rgb):
    return jax.nn.sigmoid(rgb) * 1.002 - 0.001


def osg_pointwise_reference(rows, tx, ty, live, w1, b1, w2, b2,
                            activation: str = 'sigmoid', inbox=None):
    """Pure-jnp reference of the fused pipeline.

    Args:
      rows: (3, M, 4C) gathered corner rows [c00 | c01 | c10 | c11].
      tx, ty, live: (3, M) bilinear fractions and validity (0 kills the
        sample — the zero-padding ring of the packed table).
      w1, b1, w2, b2: OSG MLP params with any equalized-lr scaling
        already folded in; w1 (C, H), w2 (H, 1+C_out).
      inbox: optional (M,) bbox mask — folds the renderer's
        ``filter_out_of_bbox`` select (σ→-1e10, rgb→0) into the pipeline.
    Returns:
      rgb (M, C_out), sigma (M, 1).
    """
    C = w1.shape[0]
    tx = tx[..., None]
    ty = ty[..., None]
    live = live[..., None]
    w00 = (1 - tx) * (1 - ty) * live
    w01 = tx * (1 - ty) * live
    w10 = (1 - tx) * ty * live
    w11 = tx * ty * live
    f = (w00 * rows[..., :C] + w01 * rows[..., C:2 * C]
         + w10 * rows[..., 2 * C:3 * C] + w11 * rows[..., 3 * C:])
    x = jnp.mean(f, axis=0)
    h = jax.nn.softplus(x @ w1 + b1)
    out = h @ w2 + b2
    sigma = out[:, :1]
    rgb = out[:, 1:]
    if activation == 'sigmoid':
        rgb = _sigmoid_clamp(rgb)
    elif activation == 'lrelu':
        rgb = jax.nn.leaky_relu(rgb, 0.2) * jnp.sqrt(2.0)
    if inbox is not None:
        m = inbox[:, None]
        sigma = jnp.where(m > 0, sigma, jnp.asarray(-1e10, sigma.dtype))
        rgb = rgb * m
    return rgb, sigma


def _kernel(rows_ref, tx_ref, ty_ref, live_ref, inbox_ref, w1_ref, b1_ref,
            w2_ref, b2_ref, rgb_ref, sigma_ref, *, activation: str,
            use_inbox: bool):
    C = w1_ref.shape[0]
    # The bilinear lerp runs in the rows' NATIVE dtype: bf16 rows (the
    # inference surfaces) keep the 4C-wide elementwise work in bf16 —
    # 2 elems/VPU lane vs widening 906M elems/pass to f32 first (the
    # f32 widen made the kernel 2.4x off the VPU roofline).  The
    # (TILE, C) plane-mean and the MLP accumulate in f32.  Weights are
    # per-point scalars broadcast over C; bf16 weight rounding (2^-8
    # relative) is below the bf16 feature quantization already present.
    rows = rows_ref[:]                       # (3, TILE, 4C) native dtype
    dt = rows.dtype
    tx = tx_ref[:][..., None].astype(dt)     # (3, TILE, 1)
    ty = ty_ref[:][..., None].astype(dt)
    live = live_ref[:][..., None].astype(dt)
    one = jnp.asarray(1, dt)
    w00 = (one - tx) * (one - ty) * live
    w01 = tx * (one - ty) * live
    w10 = (one - tx) * ty * live
    w11 = tx * ty * live
    f = (w00 * rows[..., :C] + w01 * rows[..., C:2 * C]
         + w10 * rows[..., 2 * C:3 * C] + w11 * rows[..., 3 * C:])
    f = f.astype(jnp.float32)
    x = (f[0] + f[1] + f[2]) * (1.0 / 3.0)   # (TILE, C) f32
    h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    h = jax.nn.softplus(h + b1_ref[:])
    out = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
    out = out + b2_ref[:]
    sigma = out[:, :1]
    rgb = out[:, 1:]
    if activation == 'sigmoid':
        rgb = _sigmoid_clamp(rgb)
    elif activation == 'lrelu':
        rgb = jax.nn.leaky_relu(rgb, 0.2) * jnp.sqrt(2.0)
    if use_inbox:
        # renderer filter_out_of_bbox folded in: saves a separate
        # (M, C+1) HBM select round-trip after the kernel.
        m = inbox_ref[0][:, None]
        sigma = jnp.where(m > 0, sigma, -1e10)
        rgb = rgb * m
    sigma_ref[:] = sigma
    rgb_ref[:] = rgb


def _osg_forward(rows, tx, ty, live, w1, b1, w2, b2, inbox,
                 activation: str, interpret: bool, tile: int):
    TILE = tile
    n_planes, M, fourC = rows.shape
    C = fourC // 4
    H = w1.shape[1]
    C_out = w2.shape[1] - 1
    use_inbox = inbox is not None
    Mp = -(-M // TILE) * TILE
    if Mp != M:
        pad = ((0, 0), (0, Mp - M), (0, 0))
        rows = jnp.pad(rows, pad)
        tx = jnp.pad(tx, pad[:2])
        ty = jnp.pad(ty, pad[:2])
        live = jnp.pad(live, pad[:2])
        if use_inbox:
            inbox = jnp.pad(inbox, (0, Mp - M))
    b1 = b1.reshape(1, H)
    b2 = b2.reshape(1, 1 + C_out)

    pt_spec = pl.BlockSpec((n_planes, TILE), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((n_planes, TILE, fourC), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pt_spec, pt_spec, pt_spec,
    ]
    operands = [rows, tx.astype(jnp.float32), ty.astype(jnp.float32),
                live.astype(jnp.float32)]
    if use_inbox:
        in_specs.append(pl.BlockSpec((1, TILE), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))
        operands.append(inbox.astype(jnp.float32).reshape(1, Mp))
    in_specs += [
        pl.BlockSpec((C, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((H, 1 + C_out), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1 + C_out), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands += [w1.astype(jnp.float32), b1.astype(jnp.float32),
                 w2.astype(jnp.float32), b2.astype(jnp.float32)]

    def kernel(*refs):
        if use_inbox:
            (rows_r, tx_r, ty_r, live_r, inbox_r,
             w1_r, b1_r, w2_r, b2_r, rgb_r, sig_r) = refs
        else:
            (rows_r, tx_r, ty_r, live_r,
             w1_r, b1_r, w2_r, b2_r, rgb_r, sig_r) = refs
            inbox_r = None
        _kernel(rows_r, tx_r, ty_r, live_r, inbox_r, w1_r, b1_r, w2_r,
                b2_r, rgb_r, sig_r, activation=activation,
                use_inbox=use_inbox)

    grid = (Mp // TILE,)
    rgb, sigma = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((TILE, C_out), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Mp, C_out), jnp.float32),
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return rgb[:M], sigma[:M]


def _bwd_kernel(rows_ref, tx_ref, ty_ref, live_ref, inbox_ref,
                w1_ref, b1_ref, w2_ref, b2_ref, grgb_ref, gsig_ref,
                grows_ref, gtx_ref, gty_ref, glive_ref, ginbox_ref,
                gw1_ref, gb1_ref, gw2_ref, gb2_ref, *,
                activation: str, use_inbox: bool):
    """Recompute the forward tile in VMEM, then push the cotangents back
    through it.  Per-point grads stream out tile-by-tile; the four
    weight grads accumulate in VMEM-resident blocks (index_map pins them
    to block (0, 0); the sequential TPU grid makes init-at-step-0 +
    ``+=`` a race-free reduction)."""
    C = w1_ref.shape[0]
    rows = rows_ref[:]                          # (3, T, 4C) native dtype
    dt = rows.dtype
    txf = tx_ref[:][..., None]                  # (3, T, 1) f32
    tyf = ty_ref[:][..., None]
    livef = live_ref[:][..., None]
    tx = txf.astype(dt)
    ty = tyf.astype(dt)
    live = livef.astype(dt)
    one = jnp.asarray(1, dt)
    w00 = (one - tx) * (one - ty) * live
    w01 = tx * (one - ty) * live
    w10 = (one - tx) * ty * live
    w11 = tx * ty * live
    c00 = rows[..., :C]
    c01 = rows[..., C:2 * C]
    c10 = rows[..., 2 * C:3 * C]
    c11 = rows[..., 3 * C:]
    f = (w00 * c00 + w01 * c01 + w10 * c10 + w11 * c11).astype(jnp.float32)
    x = (f[0] + f[1] + f[2]) * (1.0 / 3.0)      # (T, C) f32
    w1 = w1_ref[:]
    w2 = w2_ref[:]
    hpre = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1_ref[:]
    h = jax.nn.softplus(hpre)                   # (T, H)
    out = jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2_ref[:]
    rgb_pre = out[:, 1:]

    g_rgb_in = grgb_ref[:]                      # (T, C_out) f32 cotangents
    g_sig = gsig_ref[:]                         # (T, 1)
    if activation == 'sigmoid':
        s = jax.nn.sigmoid(rgb_pre)
        rgb_act = s * 1.002 - 0.001
        act_d = s * (1.0 - s) * 1.002
    elif activation == 'lrelu':
        rgb_act = jax.nn.leaky_relu(rgb_pre, 0.2) * jnp.sqrt(2.0)
        act_d = jnp.where(rgb_pre >= 0, 1.0, 0.2) * jnp.sqrt(2.0)
    else:
        rgb_act = rgb_pre
        act_d = jnp.ones_like(rgb_pre)
    if use_inbox:
        m = inbox_ref[0][:, None]               # (T, 1) f32
        # rgb_final = act(rgb_pre)·m  →  d/dm = act(rgb_pre)·ĝ_rgb;
        # sigma's where(m>0, ·, -1e10) is flat in m and kills ĝ_sigma
        # outside (matches jax.grad of the jnp reference exactly).
        ginbox_ref[:] = jnp.sum(g_rgb_in * rgb_act, axis=-1)[None, :]
        g_rgb = g_rgb_in * m
        g_sig = jnp.where(m > 0, g_sig, 0.0)
    else:
        ginbox_ref[:] = jnp.zeros(ginbox_ref.shape, ginbox_ref.dtype)
        g_rgb = g_rgb_in
    g_out = jnp.concatenate([g_sig, g_rgb * act_d], axis=1)  # (T, 1+C_out)

    gw2 = jnp.dot(h.T, g_out, preferred_element_type=jnp.float32)
    gb2 = jnp.sum(g_out, axis=0, keepdims=True)
    g_h = jnp.dot(g_out, w2.T, preferred_element_type=jnp.float32)
    g_hpre = g_h * jax.nn.sigmoid(hpre)         # softplus' = sigmoid
    gw1 = jnp.dot(x.T, g_hpre, preferred_element_type=jnp.float32)
    gb1 = jnp.sum(g_hpre, axis=0, keepdims=True)
    g_x = jnp.dot(g_hpre, w1.T, preferred_element_type=jnp.float32)
    g_f = (g_x * (1.0 / 3.0))[None]             # (1, T, C), same ∀ planes

    # corner-row grads: ∂f/∂c_k = w_k (broadcast over C)
    g_fd = g_f.astype(dt)
    grows_ref[:] = jnp.concatenate(
        [w00 * g_fd, w01 * g_fd, w10 * g_fd, w11 * g_fd], axis=-1)
    # per-corner scalar grads g_wk = Σ_C g_f · c_k  → (3, T)
    g_ff = jnp.broadcast_to(g_f, (3,) + g_f.shape[1:])
    g_w00 = jnp.sum(g_ff * c00.astype(jnp.float32), axis=-1)
    g_w01 = jnp.sum(g_ff * c01.astype(jnp.float32), axis=-1)
    g_w10 = jnp.sum(g_ff * c10.astype(jnp.float32), axis=-1)
    g_w11 = jnp.sum(g_ff * c11.astype(jnp.float32), axis=-1)
    lw = livef[..., 0]
    txw = txf[..., 0]
    tyw = tyf[..., 0]
    gtx_ref[:] = lw * ((1 - tyw) * (g_w01 - g_w00)
                       + tyw * (g_w11 - g_w10))
    gty_ref[:] = lw * ((1 - txw) * (g_w10 - g_w00)
                       + txw * (g_w11 - g_w01))
    glive_ref[:] = ((1 - txw) * (1 - tyw) * g_w00 + txw * (1 - tyw) * g_w01
                    + (1 - txw) * tyw * g_w10 + txw * tyw * g_w11)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        gw1_ref[:] = jnp.zeros(gw1_ref.shape, gw1_ref.dtype)
        gb1_ref[:] = jnp.zeros(gb1_ref.shape, gb1_ref.dtype)
        gw2_ref[:] = jnp.zeros(gw2_ref.shape, gw2_ref.dtype)
        gb2_ref[:] = jnp.zeros(gb2_ref.shape, gb2_ref.dtype)

    gw1_ref[:] += gw1
    gb1_ref[:] += gb1
    gw2_ref[:] += gw2
    gb2_ref[:] += gb2


def _osg_backward(rows, tx, ty, live, w1, b1, w2, b2, inbox, g_rgb,
                  g_sigma, activation: str, interpret: bool, tile: int):
    TILE = tile
    n_planes, M, fourC = rows.shape
    C = fourC // 4
    H = w1.shape[1]
    C_out = w2.shape[1] - 1
    use_inbox = inbox is not None
    Mp = -(-M // TILE) * TILE
    if Mp != M:
        pad = ((0, 0), (0, Mp - M), (0, 0))
        rows = jnp.pad(rows, pad)
        tx = jnp.pad(tx, pad[:2])
        ty = jnp.pad(ty, pad[:2])
        live = jnp.pad(live, pad[:2])
        if use_inbox:
            inbox = jnp.pad(inbox, (0, Mp - M))
        # zero cotangents on the padded tail → zero grad contributions
        g_rgb = jnp.pad(g_rgb, ((0, Mp - M), (0, 0)))
        g_sigma = jnp.pad(g_sigma, ((0, Mp - M), (0, 0)))

    pt_spec = pl.BlockSpec((n_planes, TILE), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    box_spec = pl.BlockSpec((1, TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((n_planes, TILE, fourC), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pt_spec, pt_spec, pt_spec, box_spec,
        pl.BlockSpec((C, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((H, 1 + C_out), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1 + C_out), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, C_out), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    inbox_in = (inbox if use_inbox
                else jnp.zeros((Mp,), jnp.float32))
    operands = [rows, tx.astype(jnp.float32), ty.astype(jnp.float32),
                live.astype(jnp.float32),
                inbox_in.astype(jnp.float32).reshape(1, Mp),
                w1.astype(jnp.float32),
                b1.astype(jnp.float32).reshape(1, H),
                w2.astype(jnp.float32),
                b2.astype(jnp.float32).reshape(1, 1 + C_out),
                g_rgb.astype(jnp.float32), g_sigma.astype(jnp.float32)]

    acc = pl.BlockSpec((C, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((n_planes, TILE, fourC), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pt_spec, pt_spec, pt_spec, box_spec,
        acc,
        pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((H, 1 + C_out), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1 + C_out), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_planes, Mp, fourC), rows.dtype),
        jax.ShapeDtypeStruct((n_planes, Mp), jnp.float32),
        jax.ShapeDtypeStruct((n_planes, Mp), jnp.float32),
        jax.ShapeDtypeStruct((n_planes, Mp), jnp.float32),
        jax.ShapeDtypeStruct((1, Mp), jnp.float32),
        jax.ShapeDtypeStruct((C, H), jnp.float32),
        jax.ShapeDtypeStruct((1, H), jnp.float32),
        jax.ShapeDtypeStruct((H, 1 + C_out), jnp.float32),
        jax.ShapeDtypeStruct((1, 1 + C_out), jnp.float32),
    ]

    kernel = functools.partial(_bwd_kernel, activation=activation,
                               use_inbox=use_inbox)
    (grows, gtx, gty, glive, ginbox, gw1, gb1, gw2, gb2) = pl.pallas_call(
        kernel,
        grid=(Mp // TILE,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    return (grows[:, :M], gtx[:, :M], gty[:, :M], glive[:, :M],
            ginbox[0, :M] if use_inbox else None, gw1, gb1[0], gw2, gb2[0])


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _osg_fused(rows, tx, ty, live, w1, b1, w2, b2, inbox,
               activation, interpret, tile):
    return _osg_forward(rows, tx, ty, live, w1, b1, w2, b2, inbox,
                        activation, interpret, tile)


def _osg_fused_fwd(rows, tx, ty, live, w1, b1, w2, b2, inbox,
                   activation, interpret, tile):
    out = _osg_forward(rows, tx, ty, live, w1, b1, w2, b2, inbox,
                       activation, interpret, tile)
    # recompute-based VJP: residuals are the inputs themselves — the
    # backward kernel regenerates the lerp/MLP intermediates in VMEM.
    return out, (rows, tx, ty, live, w1, b1, w2, b2, inbox)


def _osg_fused_bwd(activation, interpret, tile, res, ct):
    rows, tx, ty, live, w1, b1, w2, b2, inbox = res
    g_rgb, g_sigma = ct
    (grows, gtx, gty, glive, ginbox, gw1, gb1, gw2, gb2) = _osg_backward(
        rows, tx, ty, live, w1, b1, w2, b2, inbox, g_rgb, g_sigma,
        activation, interpret, tile)
    return (grows.astype(rows.dtype), gtx.astype(tx.dtype),
            gty.astype(ty.dtype), glive.astype(live.dtype),
            gw1.astype(w1.dtype), gb1.reshape(b1.shape).astype(b1.dtype),
            gw2.astype(w2.dtype), gb2.reshape(b2.shape).astype(b2.dtype),
            None if inbox is None else ginbox.astype(inbox.dtype))


_osg_fused.defvjp(_osg_fused_fwd, _osg_fused_bwd)


@functools.partial(jax.jit, static_argnames=('activation', 'interpret',
                                             'tile'))
def osg_pointwise_fused(rows, tx, ty, live, w1, b1, w2, b2,
                        activation: str = 'sigmoid',
                        interpret: bool = False, inbox=None,
                        tile: int = TILE):
    """Pallas-fused pipeline; same contract as the reference fn.

    M is padded to a ``tile`` multiple internally (padded tail has
    live=0).  ``inbox`` (M,) optionally folds the bbox filter into the
    kernel.  Differentiable: carries a custom VJP whose backward is a
    second Pallas kernel (see module docstring).
    """
    return _osg_fused(rows, tx, ty, live, w1, b1, w2, b2, inbox,
                      activation, interpret, tile)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class FusedOSG:
    """OSG MLP weights (equalized-lr scaling folded in) for the fused
    kernel.  Pass to ``render_rays(..., fused_osg=...)`` /
    ``TriplaneVAE.render(..., use_fused_osg=True)`` on inference paths."""
    w1: jax.Array                  # (C, hidden)
    b1: jax.Array                  # (hidden,)
    w2: jax.Array                  # (hidden, 1 + C_out)
    b2: jax.Array                  # (1 + C_out,)
    activation: str = dataclasses.field(
        default='sigmoid', metadata=dict(static=True))
    interpret: bool = dataclasses.field(
        default=False, metadata=dict(static=True))

    def __call__(self, rows, tx, ty, live, inbox=None):
        """Apply to batched gather output: rows (B, 3, M, 4C) →
        rgb (B, M, C_out), sigma (B, M, 1).  ``inbox`` (B, M) folds the
        bbox filter in (σ→-1e10, rgb→0 outside)."""
        if jax.default_backend() != 'tpu' and not self.interpret:
            # Pallas TPU kernels don't lower on CPU/GPU — use the jnp
            # reference (identical math; keeps CPU dryruns working).
            fn = functools.partial(osg_pointwise_reference,
                                   w1=self.w1, b1=self.b1.reshape(1, -1),
                                   w2=self.w2, b2=self.b2.reshape(1, -1),
                                   activation=self.activation)
        else:
            fn = functools.partial(osg_pointwise_fused,
                                   w1=self.w1, b1=self.b1,
                                   w2=self.w2, b2=self.b2,
                                   activation=self.activation,
                                   interpret=self.interpret)
        if rows.shape[0] == 1:
            rgb, sigma = fn(rows[0], tx[0], ty[0], live[0],
                            inbox=None if inbox is None else inbox[0])
            return rgb[None], sigma[None]
        if inbox is None:
            rgb, sigma = jax.vmap(fn)(rows, tx, ty, live)
        else:
            rgb, sigma = jax.vmap(
                lambda r, x, y, l, m: fn(r, x, y, l, inbox=m))(
                    rows, tx, ty, live, inbox)
        return rgb, sigma


def fused_osg_from_params(osg_params: dict, lr_multiplier: float = 1.0,
                          activation: str = 'sigmoid',
                          interpret: bool = False) -> FusedOSG:
    """Fold EqualDense equalized-lr scaling (``models/layers.py``:
    w·lr_mul/sqrt(fan_in), b·lr_mul) into plain matrices.

    ``osg_params``: the ``'osg_decoder'`` subtree of the VAE params
    (two EqualDense layers).
    """
    k0 = osg_params['EqualDense_0']['kernel']
    b0 = osg_params['EqualDense_0']['bias']
    k1 = osg_params['EqualDense_1']['kernel']
    b1 = osg_params['EqualDense_1']['bias']
    return FusedOSG(
        w1=k0 * (lr_multiplier / math.sqrt(k0.shape[0])),
        b1=b0 * lr_multiplier,
        w2=k1 * (lr_multiplier / math.sqrt(k1.shape[0])),
        b2=b1 * lr_multiplier,
        activation=activation, interpret=interpret)
