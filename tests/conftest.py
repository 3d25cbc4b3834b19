import os
import sys

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (mirrors the reference's mock-device
# strategy, /root/reference/embodied/jax/internal.py:48-49).
#
# NOTE: the axon TPU plugin in this image overrides the JAX_PLATFORMS env
# var, so we must pop it and use jax.config instead.
os.environ.pop('JAX_PLATFORMS', None)
# NO persistent compilation cache on XLA:CPU: deserializing its AOT
# executables intermittently segfaults (machine-feature mismatches like
# +prefer-no-scatter warn and then crash instead of recompiling). Compile
# times are paid per run instead; parallel/setup.py keeps the cache for
# TPU, where serialization is stable and compiles are expensive. Must be
# popped BEFORE the jax import: jax latches env-derived defaults then.
os.environ.pop('JAX_COMPILATION_CACHE_DIR', None)
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir', None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(autouse=True)
def _restore_transfer_guard():
  """parallel/setup.py flips jax_transfer_guard to 'disallow' globally when
  an agent initializes (the production default); without restoring it, any
  test running after an agent-constructing test fails on ordinary
  numpy->device transfers. Tests asserting guard behavior set it
  themselves inside the test body."""
  before = jax.config.jax_transfer_guard
  yield
  jax.config.update('jax_transfer_guard', before or 'allow')
