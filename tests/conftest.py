"""Test config: run everything on a virtual 8-device CPU mesh.

The environment ships an `axon` TPU PJRT plugin that force-prepends itself
to jax_platforms at import time, so setting JAX_PLATFORMS=cpu in the env is
not enough — we override the config after import, before any backend is
initialized.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
assert len(jax.devices()) == 8, jax.devices()

# Persistent compilation cache: the suite's wall time is dominated by
# XLA CPU compiles (every test jits over the 8-device mesh); caching
# them makes repeat runs several times faster on small hosts.
from ln3diff_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.join(
    os.path.dirname(__file__), '..', '.pytest_cache', 'xla_cache'))
