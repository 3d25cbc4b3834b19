"""JAX platform/device setup for the framework.

Capability parity: /root/reference/embodied/jax/internal.py:20-105 —
platform selection, compute dtype, preallocation, jit toggle, debug flags,
mock host devices, persistent compilation cache, XLA tuning flags for TPU,
and jax.distributed initialization for multi-host runs.
"""

import os

_DONE = [False]


def setup(
    platform=None, compute_dtype='bfloat16', prealloc=True, jit=True,
    debug=False, mock_devices=0, expect_devices=0, coordinator_address='',
    deterministic=False, cache_dir='/tmp/jax_cache', xla_flags=''):
  if _DONE[0]:
    import jax
    return jax.devices()
  _DONE[0] = True

  flags = [os.environ.get('XLA_FLAGS', ''), xla_flags]
  # The axon TPU plugin in some images overrides the JAX_PLATFORMS env var;
  # selecting the platform through jax.config is authoritative.
  if mock_devices:
    flags.append(f'--xla_force_host_platform_device_count={mock_devices}')
    platform = 'cpu'
  if platform:
    os.environ.pop('JAX_PLATFORMS', None)
  if not prealloc:
    os.environ.setdefault('XLA_PYTHON_CLIENT_PREALLOCATE', 'false')
  # NOTE: modern XLA:TPU enables async collectives and collective/compute
  # overlap by default; the axon plugin in this image rejects the legacy
  # tuning flags, so we only forward user-provided xla_flags.
  os.environ['XLA_FLAGS'] = ' '.join(x for x in flags if x).strip()

  if cache_dir:
    os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', cache_dir)
    os.environ.setdefault(
        'JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '0.5')

  import jax
  import jax.numpy as jnp

  try:
    if platform:
      jax.config.update('jax_platforms', platform)
    if cache_dir:
      jax.config.update('jax_compilation_cache_dir', cache_dir)
      jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
  except RuntimeError as e:
    print(f'jax setup: backend already initialized, skipping ({e})')
  if debug:
    jax.config.update('jax_debug_nans', True)
    jax.config.update('jax_disable_most_optimizations', True)
  if deterministic:
    os.environ['XLA_FLAGS'] += ' --xla_gpu_deterministic_ops=true'
  if not jit:
    jax.config.update('jax_disable_jit', True)

  if coordinator_address:
    jax.distributed.initialize(coordinator_address)

  from ..nn import core as nncore
  nncore.set_compute_dtype(getattr(jnp, compute_dtype))

  devices = jax.devices()
  if expect_devices:
    assert len(devices) == expect_devices, (len(devices), expect_devices)
  return devices
