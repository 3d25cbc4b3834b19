"""JAX platform/device setup for the framework.

Capability parity: /root/reference/embodied/jax/internal.py:20-105 —
platform selection, compute dtype, preallocation, jit toggle, debug flags,
mock host devices, persistent compilation cache, XLA tuning flags for TPU,
and jax.distributed initialization for multi-host runs.
"""

import os

_DONE = [False]


def host_cache_dir(base='/tmp/jax_cache'):
  """Compile-cache directory fingerprinted by this host's CPU features.

  XLA:CPU serializes AOT executables specialized to the compile machine's
  feature set; loading one on a host without those features crashes
  (SIGILL/SEGV) rather than recompiling, and the upstream cache key does
  not include the feature set. Fingerprinting the directory makes sharing
  a cache path across heterogeneous machines safe."""
  import hashlib
  import platform as plat
  text = plat.machine() + plat.processor()
  try:
    with open('/proc/cpuinfo') as f:
      for line in f:
        if line.startswith(('flags', 'Features')):
          text += line
          break
  except OSError:
    pass
  return f'{base}_{hashlib.md5(text.encode()).hexdigest()[:10]}'


def setup(
    platform=None, compute_dtype='bfloat16', prealloc=True, jit=True,
    debug=False, mock_devices=0, expect_devices=0, coordinator_address='',
    deterministic=False, cache_dir='auto', xla_flags='',
    transfer_guard=True):
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

  import jax
  import jax.numpy as jnp

  try:
    if platform:
      jax.config.update('jax_platforms', platform)
  except RuntimeError as e:
    print(f'jax setup: backend already initialized, skipping ({e})')
  if cache_dir == 'auto':
    # Persistent compile cache only for accelerator backends: XLA:CPU AOT
    # executables intermittently SEGFAULT on deserialization (machine
    # feature mismatches like +prefer-no-scatter warn and then crash
    # instead of falling back to a recompile), so caching them is a
    # reliability hazard. TPU serialization is stable and is where the
    # 20-40s compiles make the cache worthwhile.
    cache_dir = '' if jax.default_backend() == 'cpu' else host_cache_dir()
  if cache_dir:
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
  if debug:
    jax.config.update('jax_debug_nans', True)
    jax.config.update('jax_disable_most_optimizations', True)
  if deterministic:
    os.environ['XLA_FLAGS'] += ' --xla_gpu_deterministic_ops=true'
  if not jit:
    jax.config.update('jax_disable_jit', True)
  if transfer_guard and jit and not debug:
    # Implicit host<->device transfers raise; every legitimate crossing
    # in the agent wrapper runs under an explicit jax.transfer_guard
    # scope (parity: /root/reference/embodied/jax/internal.py:37-38).
    jax.config.update('jax_transfer_guard', 'disallow')

  if coordinator_address:
    jax.distributed.initialize(coordinator_address)

  from ..nn import core as nncore
  nncore.set_compute_dtype(getattr(jnp, compute_dtype))

  devices = jax.devices()
  if expect_devices:
    assert len(devices) == expect_devices, (len(devices), expect_devices)
  return devices
