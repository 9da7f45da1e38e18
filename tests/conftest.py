"""Test configuration.

Tests run on a forced-CPU JAX backend with 8 virtual devices (multi-chip sharding
tests without a pod) and float64 enabled (parity against float64 CPU MuJoCo).
The TPU path is exercised by bench.py / __graft_entry__.py instead.

NOTE: third-party pytest plugins may import jax before this conftest runs, so the
platform is forced through jax.config (honored until the backend is first used),
not just environment variables.
"""

import os

os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

# Persistent compilation cache: the physics program is large and XLA-CPU compiles
# are slow in x64; caching makes repeated test runs fast.
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

assert jax.devices()[0].platform == 'cpu', 'tests must run on the CPU backend'
