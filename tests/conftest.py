import os
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (mirrors the reference's mock-device
# strategy, /root/reference/embodied/jax/internal.py:48-49).
#
# NOTE: the axon TPU plugin in this image overrides the JAX_PLATFORMS env
# var, so we must pop it and use jax.config instead.
os.environ.pop('JAX_PLATFORMS', None)
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# Persistent compilation cache: this machine has few cores and XLA:CPU
# compiles are seconds each; caching them across test runs is a big win.
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
