"""Persistent XLA compilation cache.

First-compile latency on the tunneled single-chip setup is tens of
seconds per gather-heavy program; the persistent cache makes driver
re-runs (bench, entry checks) near-instant.  Call early, before the first
jit execution.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    import jax

    path = path or os.path.join(os.path.expanduser('~'), '.cache',
                                'ln3diff_tpu', 'xla_cache')
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass  # older jax without the flags
    return path
