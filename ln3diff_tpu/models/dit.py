"""Unified DiT library: stage-2 denoisers and the VAE's DiT2 decoder.

TPU-native rewrite of the reference DiT zoo — one parameterized block
implementation instead of the reference's per-variant subclasses:

  * ``DiTBlock`` adaLN-zero (reference ``dit/dit_models_xformers.py:231``),
    text cross-attn variant (``TextCondDiTBlock:298``), PixelArt shared-adaLN
    variant (``PixelArtTextCondDiTBlock:326``), image-conditioned dual
    cross-attn variant (``ImageCondDiTBlockPixelArt:481``).
  * ``DiT_TriLatent`` denoiser with triplane roll-out + 3D-aware PE
    (reference ``dit/dit_trilatent.py:22-263``) and the I23D variants
    (reference ``dit/dit_i23d.py``).
  * ``DiT2`` — the unconditional VAE decoder backbone where the latent is
    injected per-block as conditioning tokens and attention alternates
    within-plane / cross-plane (reference ``dit/dit_decoder.py:53-163``).

Attention uses ``jax.nn.dot_product_attention`` which XLA lowers to fused
attention on TPU (the reference needs xformers/flash-attn CUDA kernels).
All activations flow in the module dtype (bf16 for training/inference);
outputs are cast to f32 where the reference does.

Layout: images/latents are channels-last ``(B, H, W, C)``.  Triplane
latents decompose the channel axis as ``(c, plane)`` with plane fastest,
matching the reference's ``'b (c n) h w'`` rearranges so converted
checkpoints line up.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import timestep_embedding


# ---------------------------------------------------------------------------
# sin-cos positional embeddings (MAE convention)
# ---------------------------------------------------------------------------

def _sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega = 1.0 / 10000**(omega / (embed_dim / 2.0))
    out = np.einsum('m,d->md', pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size) -> np.ndarray:
    """Reference ``dit/dit_models_xformers.py:get_2d_sincos_pos_embed``.

    ``grid_size`` may be an int (square grid) or ``(gh, gw)`` — the
    3D-aware PE uses ``(3, tokens_per_plane)``."""
    if isinstance(grid_size, tuple):
        gh, gw = grid_size
    else:
        gh = gw = grid_size
    grid_h = np.arange(gh, dtype=np.float32)
    grid_w = np.arange(gw, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)  # w first
    grid = grid.reshape(2, 1, gh, gw)
    emb_h = _sincos_1d(embed_dim // 2, grid[0])
    emb_w = _sincos_1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

def t2i_modulate(x, shift, scale):
    """PixelArt modulation: shift/scale are (B, 1, D) token-broadcast."""
    return x * (1 + scale) + shift


def _sdpa(q, k, v):
    """Scaled dot-product attention on (B, L, H, Dh) operands.

    Measured on v5e at DiT-L inference shapes (B=2, H=16, L=768, d=64):
    the Pallas flash-attention kernel runs at 494 µs/block vs XLA's
    unfused ~100 µs — at short sequence/tiny batch the kernel's grid is
    too small to pipeline and the (L, L) score tensor fits cache-friendly
    HBM traffic anyway.  XLA's lowering wins until L is in the thousands;
    revisit for long-context variants.
    """
    return jax.nn.dot_product_attention(q, k, v)


def _dense_cls(quantized: bool):
    """nn.Dense, or its W8A8 int8 drop-in (``ops/int8.py``) for the
    opt-in quantized serving mode."""
    if quantized:
        from ..ops.int8 import Int8Dense
        return Int8Dense
    return nn.Dense


class Attention(nn.Module):
    """Multi-head self-attention (fused under XLA).

    ``fused=True`` (serving knob) routes through the VMEM-resident Pallas
    kernel (``ops/fused_attention.py``) — same f32 softmax math, no HBM
    score round-trip; only profitable at short L on TPU."""
    num_heads: int
    qkv_bias: bool = True
    qk_norm: bool = False
    fused: bool = False
    quantized: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, L, D = x.shape
        dense = _dense_cls(self.quantized)
        head_dim = D // self.num_heads
        qkv = dense(3 * D, use_bias=self.qkv_bias, dtype=self.dtype,
                    name='qkv')(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, L, self.num_heads, head_dim)

        q, k, v = heads(q), heads(k), heads(v)
        if self.qk_norm:
            q = nn.RMSNorm(epsilon=1e-5, dtype=self.dtype, name='q_norm')(q)
            k = nn.RMSNorm(epsilon=1e-5, dtype=self.dtype, name='k_norm')(k)
        if self.fused:
            from ..ops.fused_attention import sdpa_auto
            out = sdpa_auto(q, k, v, use_fused=True)
        else:
            out = _sdpa(q, k, v)
        out = out.reshape(B, L, D)
        return dense(D, dtype=self.dtype, name='proj')(out)


class CrossAttention(nn.Module):
    """Query tokens attend to context tokens (reference
    ``MemoryEfficientCrossAttention``, ``ldm/modules/attention.py:245``).

    Matches the reference's fixed ``dim_head=64`` inner width: projections
    map to ``num_heads*dim_head`` (NOT D/num_heads per head), and
    ``to_out`` maps back to the query dim."""
    num_heads: int
    context_dim: Optional[int] = None
    dim_head: int = 64
    qk_norm: bool = False
    quantized: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        B, L, D = x.shape
        dense = _dense_cls(self.quantized)
        inner = self.num_heads * self.dim_head
        q = dense(inner, use_bias=False, dtype=self.dtype, name='to_q')(x)
        k = dense(inner, use_bias=False, dtype=self.dtype,
                  name='to_k')(context)
        v = dense(inner, use_bias=False, dtype=self.dtype,
                  name='to_v')(context)

        def heads(t):
            return t.reshape(B, -1, self.num_heads, self.dim_head)

        q, k, v = heads(q), heads(k), heads(v)
        if self.qk_norm:
            q = nn.RMSNorm(epsilon=1e-5, dtype=self.dtype, name='q_norm')(q)
            k = nn.RMSNorm(epsilon=1e-5, dtype=self.dtype, name='k_norm')(k)
        out = jax.nn.dot_product_attention(q, k, v)
        out = out.reshape(B, L, inner)
        return dense(D, dtype=self.dtype, name='to_out')(out)


class GeluMLP(nn.Module):
    hidden_mult: int = 4
    dtype: Any = jnp.float32
    # erf-gelu: DINOv2 AND the reference DiT blocks (xformers FusedMLP
    # with Activation.GeLU = exact nn.GELU); only CaptionEmbedder's Mlp
    # uses the tanh approximation (``approx_gelu``).
    exact_gelu: bool = False
    quantized: bool = False

    @nn.compact
    def __call__(self, x):
        D = x.shape[-1]
        dense = _dense_cls(self.quantized)
        x = dense(D * self.hidden_mult, dtype=self.dtype, name='fc1')(x)
        x = nn.gelu(x, approximate=not self.exact_gelu)
        return dense(D, dtype=self.dtype, name='fc2')(x)


class TimestepEmbedder(nn.Module):
    """MLP over sinusoidal timestep embeddings (reference :87-127)."""
    hidden_size: int
    freq_size: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, t):
        emb = timestep_embedding(t, self.freq_size).astype(self.dtype)
        emb = nn.Dense(self.hidden_size, dtype=self.dtype, name='fc1')(emb)
        emb = nn.silu(emb)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name='fc2')(emb)


class CaptionEmbedder(nn.Module):
    """Project caption tokens to hidden size, with learned null embedding
    for CFG dropout (reference :183-229)."""
    hidden_size: int
    token_num: int = 77
    context_dim: int = 768
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, caption, drop_mask=None):
        y_embedding = self.param(
            'y_embedding',
            lambda key, shape: jax.random.normal(key, shape)
            / math.sqrt(shape[-1]), (self.token_num, self.context_dim))
        if drop_mask is not None:
            null = jnp.broadcast_to(y_embedding[None, :caption.shape[1]],
                                    caption.shape).astype(caption.dtype)
            caption = jnp.where(drop_mask[:, None, None], null, caption)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name='fc1')(caption)
        x = nn.gelu(x, approximate=True)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name='fc2')(x)


def _remat_policy(name: str):
    """Checkpoint policy for scanned-block remat: 'full' recomputes the
    whole block; 'dots' saves matmul outputs (MXU work) and recomputes
    only the elementwise/VPU ops."""
    if name == 'full':
        return None
    if name == 'dots':
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    raise ValueError(f'unknown remat_policy {name!r}')


def _zero_linear(features, dtype, name):
    return nn.Dense(features, dtype=dtype, name=name,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros)


class DiTBlock(nn.Module):
    """Parameterized DiT block.

    variant:
      * 'adaln'          — plain adaLN-zero (DiTBlock / DiTBlock2).
      * 'text'           — adaLN + text cross-attn (TextCondDiTBlock).
      * 'pixelart-text'  — shared adaLN table + cross-attn + y-norm
                           (PixelArtTextCondDiTBlock; rmsnorm).
      * 'image-pixelart' — shared adaLN; dino tokens concat into self-attn,
                           cross-attn to clip tokens
                           (ImageCondDiTBlockPixelArt; qk_norm).
      * 'image-pixelart-noclip' — same minus the cross-attn.
      * 'mv-pixelart'    — multi-view image conditioning: shared adaLN,
                           plain self-attn, cross-attn over flattened MV
                           DINO tokens, rmsnorm + qk_norm (reference
                           ImageCondDiTBlockPixelArtRMSNormNoClip,
                           ``dit_models_xformers.py:541-636`` — the
                           'DiT-PixArt-MV-L/2' mv23d release arch).
    ``token_modulation=True`` gives DiT2's modulate2 semantics where the
    conditioning is per-token (B, L, D) rather than pooled (B, D).
    """
    hidden_size: int
    num_heads: int
    mlp_ratio: int = 4
    variant: str = 'adaln'
    context_dim: Optional[int] = None
    token_modulation: bool = False
    # exact erf-GELU matches the reference bit-for-bit; serving paths may
    # opt into the tanh approximation (≤1e-3 abs, subsumed by bf16
    # compute noise) — measured 1.6 ms/step cheaper on DiT-L/2 @ v5e.
    exact_gelu: bool = True
    # serving knob: VMEM-resident Pallas self-attention (short-L only)
    fused_attention: bool = False
    # serving knob: W8A8 int8 projections/MLP (ops/int8.py) — adaLN,
    # norms and embedders stay bf16 (tiny M / run once)
    quantized: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, c, context=None, dino_tokens=None):
        pixelart = self.variant in ('pixelart-text', 'image-pixelart',
                                    'image-pixelart-noclip', 'mv-pixelart')
        use_rmsnorm = self.variant in ('pixelart-text', 'mv-pixelart')
        qk_norm = self.variant.startswith('image-') \
            or self.variant == 'mv-pixelart'

        def norm(name):
            if use_rmsnorm:
                return nn.RMSNorm(epsilon=1e-5, dtype=self.dtype, name=name)
            return nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                                dtype=self.dtype, name=name)

        if pixelart:
            # Shared adaLN: c is the *pre-activated* (B, 6*D) table output.
            table = self.param(
                'scale_shift_table',
                lambda key, shape: jax.random.normal(key, shape)
                / math.sqrt(self.hidden_size), (6, self.hidden_size))
            mods = (table[None].astype(c.dtype)
                    + c.reshape(c.shape[0], 6, self.hidden_size))
            mods = jnp.split(mods, 6, axis=1)  # each (B, 1, D)
        else:
            c_act = nn.silu(c)
            mod = _zero_linear(6 * self.hidden_size, self.dtype,
                               'adaLN_modulation')(c_act)
            if self.token_modulation:
                mods = jnp.split(mod, 6, axis=-1)  # each (B, L, D)
            else:
                mods = [m[:, None] for m in jnp.split(mod, 6, axis=-1)]

        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = mods

        attn = Attention(self.num_heads, qk_norm=qk_norm,
                         fused=self.fused_attention,
                         quantized=self.quantized, dtype=self.dtype,
                         name='attn')
        h = t2i_modulate(norm('norm1')(x), shift_msa, scale_msa)
        if self.variant.startswith('image-') and dino_tokens is not None:
            # Concat dino tokens into self-attn, then drop them.
            h_cat = jnp.concatenate([h, dino_tokens.astype(h.dtype)], axis=1)
            h = attn(h_cat)[:, :x.shape[1]]
        else:
            h = attn(h)
        x = x + gate_msa * h

        if self.variant in ('text', 'pixelart-text', 'image-pixelart',
                            'mv-pixelart'):
            assert context is not None
            ctx = context
            if self.variant == 'pixelart-text':
                ctx = nn.RMSNorm(epsilon=1e-5, dtype=self.dtype,
                                 name='attention_y_norm')(ctx)
            x = x + CrossAttention(self.num_heads,
                                   context_dim=self.context_dim,
                                   quantized=self.quantized,
                                   dtype=self.dtype, name='cross_attn')(x, ctx)

        h = t2i_modulate(norm('norm2')(x), shift_mlp, scale_mlp)
        x = x + gate_mlp * GeluMLP(self.mlp_ratio, dtype=self.dtype,
                                   exact_gelu=self.exact_gelu,
                                   quantized=self.quantized,
                                   name='mlp')(h)
        return x


class FinalLayer(nn.Module):
    """adaLN final projection (reference :655-679). ``t2i=True`` uses the
    PixelArt shared scale-shift table (T2IFinalLayer :61-84)."""
    hidden_size: int
    out_dim: int
    t2i: bool = False
    token_modulation: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, c):
        norm = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                            dtype=self.dtype, name='norm_final')
        if self.t2i:
            table = self.param(
                'scale_shift_table',
                lambda key, shape: jax.random.normal(key, shape)
                / math.sqrt(self.hidden_size), (2, self.hidden_size))
            shift, scale = jnp.split(
                table[None].astype(c.dtype) + c[:, None], 2, axis=1)
        else:
            c_act = nn.silu(c)
            mod = _zero_linear(2 * self.hidden_size, self.dtype,
                               'adaLN_modulation')(c_act)
            if self.token_modulation:
                shift, scale = jnp.split(mod, 2, axis=-1)
            else:
                shift, scale = [m[:, None]
                                for m in jnp.split(mod, 2, axis=-1)]
        x = t2i_modulate(norm(x), shift, scale)
        return _zero_linear(self.out_dim, self.dtype, 'linear')(x)


class PatchEmbed(nn.Module):
    """Conv patch embedding, channels-last input ``(B, H, W, C)``."""
    patch_size: int
    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding='VALID',
                    dtype=self.dtype, name='proj')(x)
        B, h, w, D = x.shape
        return x.reshape(B, h * w, D)


# ---------------------------------------------------------------------------
# DiT denoiser (stage 2)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DiTConfig:
    input_size: int = 32          # latent H=W
    patch_size: int = 2
    in_channels: int = 4          # per-plane latent channels
    hidden_size: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: int = 4
    plane_n: int = 3
    context_dim: int = 768
    dino_dim: int = 768           # raw DINO token dim (i23d variants)
    variant: str = 'text'         # DiTBlock variant
    pooled_vector_dim: int = 0    # >0 → add cap_embedder(vector) to t
    t2i_final: bool = False
    # double the output channels with a variance head (reference
    # ``dit_models_xformers.py:712-714``; all released LN3Diff configs
    # pass --learn_sigma False — enable for learned_range VLB training)
    learn_sigma: bool = False
    # serving mode: tanh-approximate MLP GELU (see DiTBlock.exact_gelu)
    exact_gelu: bool = True
    # serving mode: Pallas VMEM-resident self-attention (ops/fused_attention)
    fused_attention: bool = False
    # serving mode: W8A8 int8 block projections/MLP (ops/int8.py).
    # Params change shape (kernel_q int8 + scale); fill from a trained
    # bf16 state with ops.int8.quantize_params_like. Opt-in — the
    # parity/bench default stays bf16.
    quantized: bool = False
    # training mode: rematerialize each scanned block in the backward pass
    # (standard TPU FLOPs-for-HBM trade — activation memory drops from
    # O(depth) to O(1) blocks; measured REQUIRED for DiT-L/2 training on a
    # 16 GB v5e: without it even batch 8 exhausts HBM)
    remat: bool = False
    # 'full' recomputes everything (min memory); 'dots' saves matmul
    # outputs and recomputes only elementwise ops (≈1 GB extra at DiT-L
    # B=8, skips the MXU recompute)
    remat_policy: str = 'full'
    dtype: Any = jnp.bfloat16


class _TrunkBody(nn.Module):
    """One scanned DiT block.  The conditioning rides as a ``nn.broadcast``
    scan argument (not a closure) so the body is a static class whose
    stacked param layout the pipeline-parallel runner
    (``parallel/pipeline.py:dit_pipeline_apply``) can re-drive standalone."""
    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, ctx):
        cfg = self.cfg
        c, crossattn, dino = ctx
        x = DiTBlock(cfg.hidden_size, cfg.num_heads, cfg.mlp_ratio,
                     variant=cfg.variant,
                     context_dim=cfg.context_dim,
                     exact_gelu=cfg.exact_gelu,
                     fused_attention=cfg.fused_attention,
                     quantized=cfg.quantized,
                     dtype=cfg.dtype, name='block')(
                         x, c, context=crossattn, dino_tokens=dino)
        return x, None


class DiT_TriLatent(nn.Module):
    """Triplane DiT denoiser (reference ``dit/dit_trilatent.py:22-263``,
    ``dit/dit_i23d.py:24-...``).

    Input ``x``: ``(B, H, W, plane_n*in_channels)`` channels-last latent
    with (c, plane) channel layout, plane fastest.
    ``context``: dict with optional keys ``crossattn`` (B, L, context_dim),
    ``vector`` (B, D_vec), ``dino`` (B, L2, hidden) already projected.

    Structured as ``embed`` → ``run_blocks`` → ``head`` methods so the
    pipeline-parallel runner can keep embed/head under GSPMD-auto and
    drive only the block trunk through the manual ``pipe``-axis schedule;
    ``__call__`` composes them (numerics and param tree unchanged).
    """
    cfg: DiTConfig

    def setup(self):
        cfg = self.cfg
        # Weight-stacked scan over homogeneous blocks: compiles ONE block
        # body instead of `depth` copies — critical for XLA compile time
        # on deep DiTs (the reference's Python ModuleList has no such
        # need).
        body = nn.remat(_TrunkBody, prevent_cse=False,
                        policy=_remat_policy(cfg.remat_policy)) \
            if cfg.remat else _TrunkBody
        self.blocks = nn.scan(body, variable_axes={'params': 0},
                              split_rngs={'params': True},
                              length=cfg.depth,
                              in_axes=(nn.broadcast,))(cfg)
        out_ch = cfg.in_channels * (2 if cfg.learn_sigma else 1)
        self.final_layer = FinalLayer(cfg.hidden_size,
                                      cfg.patch_size**2 * out_ch,
                                      t2i=cfg.t2i_final, dtype=cfg.dtype)

    def __call__(self, x, timesteps, context):
        B, H, W, _ = x.shape
        tokens, t, c, crossattn, dino = self.embed(x, timesteps, context)
        tokens = self.run_blocks(tokens, c, crossattn, dino)
        return self.head(tokens, t, (B, H, W))

    @nn.compact
    def embed(self, x, timesteps, context):
        """Patchify + conditioning → ``(tokens, t, c, crossattn, dino)``."""
        cfg = self.cfg
        B, H, W, C3 = x.shape
        n = cfg.plane_n
        dtype = cfg.dtype

        t = TimestepEmbedder(cfg.hidden_size, dtype=dtype, name='t_embedder')(
            timesteps)

        if cfg.pooled_vector_dim:
            vec = context['vector']
            vec = nn.LayerNorm(dtype=dtype, name='cap_norm')(
                vec.astype(dtype))
            vec = _zero_linear(cfg.hidden_size, dtype, 'cap_proj')(vec)
            t = t + vec

        # roll-out: fold planes into batch for the patch conv.
        x = x.reshape(B, H, W, cfg.in_channels, n)       # (c, plane) split
        x = jnp.transpose(x, (0, 4, 1, 2, 3)).reshape(B * n, H, W,
                                                      cfg.in_channels)
        x = PatchEmbed(cfg.patch_size, cfg.hidden_size, dtype=dtype,
                       name='x_embedder')(x.astype(dtype))
        L = x.shape[1]
        x = x.reshape(B, n * L, cfg.hidden_size)

        pos = self.variable(
            'constants', 'pos_embed', lambda: jnp.asarray(
                get_2d_sincos_pos_embed(cfg.hidden_size, (n, L))[None]))
        x = x + pos.value.astype(dtype)

        crossattn = context.get('crossattn') if context else None
        dino = context.get('dino') if context else None
        if cfg.variant == 'mv-pixelart':
            # multi-view DINO spatial features (B, V, L, C) flatten into
            # one cross-attn context (reference MVCond_noClip forward:
            # ``rearrange(context['concat'], 'b v l c -> b (v l) c')``);
            # raw 768-d features — the cross-attn KV projections embed.
            mv = context.get('concat', crossattn)
            if mv.ndim == 4:
                mv = mv.reshape(mv.shape[0], -1, mv.shape[-1])
            crossattn = mv.astype(dtype)
        elif crossattn is not None and cfg.variant == 'text':
            crossattn = CaptionEmbedder(
                cfg.hidden_size, context_dim=cfg.context_dim, dtype=dtype,
                name='clip_text_proj')(crossattn.astype(dtype))
        elif crossattn is not None:
            crossattn = crossattn.astype(dtype)
        if dino is not None and cfg.variant.startswith('image-'):
            # raw DINO tokens → hidden (reference dino_proj,
            # dit/dit_i23d.py:60-64); CLIP spatial tokens stay raw for the
            # cross-attention (context_dim=1024).
            dino = CaptionEmbedder(cfg.hidden_size,
                                   context_dim=cfg.dino_dim, dtype=dtype,
                                   name='dino_proj')(dino.astype(dtype))

        pixelart = cfg.variant in ('pixelart-text', 'image-pixelart',
                                   'image-pixelart-noclip', 'mv-pixelart')
        if pixelart:
            # Single shared adaLN over all blocks.
            c = _zero_linear(6 * cfg.hidden_size, dtype,
                             'adaLN_modulation')(nn.silu(t))
        else:
            c = t

        return x, t, c, crossattn, dino

    def run_blocks(self, x, c, crossattn=None, dino=None):
        """The scan-stacked block trunk — all the FLOPs."""
        x, _ = self.blocks(x, (c, crossattn, dino))
        return x

    def head(self, x, t, shape):
        """Final layer + un-roll-out + unpatchify back to
        ``(B, H, W, (c, plane))``.  With learn_sigma the c axis is
        (mean C, var C) — c slow / plane fast keeps the flat channel axis
        splittable in halves for ``DiffusionSpec(var_type='learned_range')``.
        """
        cfg = self.cfg
        B, H, W = shape
        n = cfg.plane_n
        out_ch = cfg.in_channels * (2 if cfg.learn_sigma else 1)
        x = self.final_layer(x, t)
        p = cfg.patch_size
        h = w = H // p
        x = x.reshape(B, n, h, w, p, p, out_ch)
        x = jnp.transpose(x, (0, 2, 4, 3, 5, 6, 1))  # B h p w p c n
        x = x.reshape(B, H, W, out_ch * n)
        return x.astype(jnp.float32)


def dit_registry(name: str, **overrides) -> DiTConfig:
    """Named configs mirroring reference ``DiT_models`` registries
    (``dit/dit_trilatent.py:320``, ``dit/dit_i23d.py``)."""
    presets = {
        'DiT-XL/2': dict(depth=28, hidden_size=1152, patch_size=2,
                         num_heads=16, variant='text'),
        'DiT-L/2': dict(depth=24, hidden_size=1024, patch_size=2,
                        num_heads=16, variant='text'),
        'DiT-B/2': dict(depth=12, hidden_size=768, patch_size=2,
                        num_heads=12, variant='text'),
        'DiT-B/1': dict(depth=12, hidden_size=768, patch_size=1,
                        num_heads=12, variant='text'),
        'DiT-B/16': dict(depth=12, hidden_size=768, patch_size=16,
                         num_heads=12, variant='text'),
        'DiT-S/2': dict(depth=12, hidden_size=384, patch_size=2,
                        num_heads=6, variant='text'),
        'DiT-PixelArt-L/2': dict(depth=24, hidden_size=1024, patch_size=2,
                                 num_heads=16, variant='pixelart-text',
                                 pooled_vector_dim=768, t2i_final=True),
        'DiT-PixelArt-B/2': dict(depth=12, hidden_size=768, patch_size=2,
                                 num_heads=12, variant='pixelart-text',
                                 pooled_vector_dim=768, t2i_final=True),
        # i23d: CLIP-image spatial crossattn (1024) + DINO tokens.
        'DiT-I23D-L/2': dict(depth=24, hidden_size=1024, patch_size=2,
                             num_heads=16, variant='image-pixelart',
                             context_dim=1024, pooled_vector_dim=768,
                             t2i_final=True),
        'DiT-I23D-B/2': dict(depth=12, hidden_size=768, patch_size=2,
                             num_heads=12, variant='image-pixelart',
                             context_dim=1024, pooled_vector_dim=768,
                             t2i_final=True),
        # mv23d: multi-view DINO tokens via cross-attn, no CLIP
        # (reference registry dit/dit_i23d.py:693 — MVCond_noClip).
        'DiT-PixArt-MV-L/2': dict(depth=24, hidden_size=1024, patch_size=2,
                                  num_heads=16, variant='mv-pixelart',
                                  context_dim=768),
        'DiT-PixArt-MV-B/2': dict(depth=12, hidden_size=768, patch_size=2,
                                  num_heads=12, variant='mv-pixelart',
                                  context_dim=768),
    }
    kw = dict(presets[name])
    kw.update(overrides)
    return DiTConfig(**kw)


# ---------------------------------------------------------------------------
# DiT2: VAE decoder backbone
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DiT2Config:
    tokens_per_plane: int = 256   # 16x16 after patch-embed of 32x32 latent
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    plane_n: int = 3
    roll_out: bool = True
    # rematerialize scanned block pairs in the backward pass (see
    # DiTConfig.remat / remat_policy)
    remat: bool = False
    remat_policy: str = 'full'
    dtype: Any = jnp.bfloat16


class DiT2(nn.Module):
    """VAE decoder backbone (reference ``dit/dit_decoder.py:53-163``).

    The learnable ``pos_embed`` acts as the query tokens; the (projected)
    latent tokens ``c`` (B, plane_n*L, D) condition every block through
    modulate2.  When ``roll_out``, even blocks attend within a plane and
    odd blocks across all planes.
    """
    cfg: DiT2Config

    @nn.compact
    def __call__(self, c):
        cfg = self.cfg
        B = c.shape[0]
        n, L, D = cfg.plane_n, cfg.tokens_per_plane, cfg.hidden_size
        dtype = cfg.dtype
        c = c.astype(dtype)

        pos = self.param('pos_embed', nn.initializers.normal(0.02),
                         (1, n * L, D))
        x = jnp.broadcast_to(pos, (B, n * L, D)).astype(dtype)

        mlp_ratio, num_heads = cfg.mlp_ratio, cfg.num_heads
        roll_out = cfg.roll_out

        # Scan over (within-plane, cross-plane) block pairs: one compiled
        # pair body instead of `depth` block graphs.
        class _Pair(nn.Module):
            @nn.compact
            def __call__(self, x, _):
                if roll_out:
                    h = x.reshape(B * n, L, D)
                    h = DiTBlock(D, num_heads, mlp_ratio, variant='adaln',
                                 token_modulation=True, dtype=dtype,
                                 name='within')(h, c.reshape(B * n, L, D))
                    x = h.reshape(B, n * L, D)
                else:
                    x = DiTBlock(D, num_heads, mlp_ratio, variant='adaln',
                                 token_modulation=True, dtype=dtype,
                                 name='within')(x, c)
                x = DiTBlock(D, num_heads, mlp_ratio, variant='adaln',
                             token_modulation=True, dtype=dtype,
                             name='across')(x, c)
                return x, None

        assert cfg.depth % 2 == 0, 'DiT2 depth must be even'
        pair = nn.remat(_Pair, prevent_cse=False,
                        policy=_remat_policy(cfg.remat_policy)) \
            if cfg.remat else _Pair
        Pairs = nn.scan(pair, variable_axes={'params': 0},
                        split_rngs={'params': True}, length=cfg.depth // 2)
        x, _ = Pairs(name='blocks')(x, None)
        return x


def dit2_registry(name: str, **overrides) -> DiT2Config:
    presets = {
        'DiT2-S/2': dict(depth=12, hidden_size=384, num_heads=6),
        'DiT2-B/2': dict(depth=12, hidden_size=768, num_heads=12),
        # B/16 = B dims; patching lives in the VAE's ldm_upsample
        # (TriplaneVAEConfig.patch_size), so only tokens_per_plane varies
        'DiT2-B/16': dict(depth=12, hidden_size=768, num_heads=12,
                          tokens_per_plane=4),
        'DiT2-L/2': dict(depth=24, hidden_size=1024, num_heads=16),
        'DiT2-XL/2': dict(depth=28, hidden_size=1152, num_heads=16),
    }
    kw = dict(presets[name])
    kw.update(overrides)
    return DiT2Config(**kw)
