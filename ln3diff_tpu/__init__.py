"""ln3diff_tpu — TPU-native two-stage text/image→3D latent diffusion.

Re-design of NIRVANALAN/LN3Diff (ECCV 2024) for TPU: JAX/XLA compute
path, Pallas hot kernels, pjit/GSPMD parallelism, C++ host ops.

Top-level surface (lazy — submodules import on first attribute access):

    >>> import ln3diff_tpu as l3
    >>> pipe = l3.TextTo3DPipeline(...)        # sample → decode → render
    >>> cfg = l3.release_preset('objaverse/t23d-dit')
    >>> vae = l3.TriplaneVAE(l3.vae_preset('objaverse'))
"""

from __future__ import annotations

import importlib

__version__ = '0.2.0'

# public name → defining submodule (resolved lazily so that importing
# the package stays cheap and jax is only pulled in when used)
_EXPORTS = {
    'TextTo3DPipeline': 'ln3diff_tpu.pipeline',
    'SamplerSpec': 'ln3diff_tpu.pipeline',
    'TriplaneVAE': 'ln3diff_tpu.models.vae',
    'DiT_TriLatent': 'ln3diff_tpu.models.dit',
    'UNetModel': 'ln3diff_tpu.models.unet',
    'make_diffusion': 'ln3diff_tpu.diffusion.gaussian',
    'release_preset': 'ln3diff_tpu.config',
    'vae_preset': 'ln3diff_tpu.config',
    'denoiser_preset': 'ln3diff_tpu.config',
    'RENDER_PRESETS': 'ln3diff_tpu.config',
    'RELEASE_PRESETS': 'ln3diff_tpu.config',
    'make_mesh': 'ln3diff_tpu.parallel.mesh',
    # serving: int8 quantization + multi-chip render/sampling sharding
    'quantize_dit': 'ln3diff_tpu.ops.int8',
    'quantize_unet': 'ln3diff_tpu.ops.int8',
    'shard_orbit_render': 'ln3diff_tpu.parallel.serving',
    'shard_points_query': 'ln3diff_tpu.parallel.serving',
    'tp_shard_denoiser_params': 'ln3diff_tpu.parallel.serving',
}

__all__ = sorted(_EXPORTS) + ['__version__']


def __getattr__(name: str):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f'module {__name__!r} has no attribute '
                             f'{name!r}')
    return getattr(importlib.import_module(mod), name)


def __dir__():
    return __all__
