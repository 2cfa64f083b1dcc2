"""Persistent XLA compilation cache.

First-compile latency on the tunneled single-chip setup is tens of
seconds per program and ~400 s for the gather-heavy renderer; the
persistent cache makes re-runs near-instant.  Call early, before the
first jit execution.

The default cache lives IN THE REPO (``<repo>/.xla_cache``) and its
contents are committed: the driver's bench run starts from a fresh
``$HOME`` every round (BENCH_r02/r03 both burned their whole budget on
cold compiles), but it always runs ``python bench.py`` from this
checkout — a repo-local cache is the only storage that provably
survives into that environment.  Compiled executables are keyed by HLO
hash + compiler version, so a stale cache entry is a miss, never a
wrong program.

Override with ``LN3DIFF_XLA_CACHE=/path`` (or ``=0`` to disable); falls
back to ``~/.cache/ln3diff_tpu/xla_cache`` when the repo dir is not
writable (e.g. read-only installs).

Operational note (round-4 advisor): committing compiled blobs to git is
deliberate, driver-environment-specific debt — entries are useless on
any other machine/jax version (dead weight, not wrong results).  For a
normal deployment, gitignore ``.xla_cache`` and ship a warm cache as a
build artifact / via LFS instead; the repo keeps it in-tree only
because the round driver's fresh-``$HOME`` bench leaves no other
surviving storage.  Discipline that goes with it: any edit on the
bench's traced path invalidates entries (HLO-keyed) — re-run
``python bench.py`` and commit the fresh entries before round end.
"""

from __future__ import annotations

import os


def _default_dir() -> str:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(os.path.dirname(here), '.xla_cache')


def enable_compilation_cache(path: str | None = None):
    import jax

    env = os.environ.get('LN3DIFF_XLA_CACHE')
    if env == '0':
        return None
    path = path or env or _default_dir()
    try:
        os.makedirs(path, exist_ok=True)
        probe = os.path.join(path, '.writable')
        with open(probe, 'w'):
            pass
        os.remove(probe)
    except OSError:
        path = os.path.join(os.path.expanduser('~'), '.cache',
                            'ln3diff_tpu', 'xla_cache')
        try:
            os.makedirs(path, exist_ok=True)
        except OSError:
            return None   # repo AND $HOME unwritable: run cache-less
                          # rather than crash every entry point
    try:
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass  # older jax without the flags
    return path
