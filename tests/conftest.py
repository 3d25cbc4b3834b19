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


# Captured once at session start: the pristine guard value to restore
# after every test. A per-test snapshot is NOT safe — module-scoped
# fixtures (e.g. the shared compiled agent in test_latents) build agents
# BEFORE the function-scoped snapshot runs, so the snapshot would capture
# the agent's 'disallow' and leak it across the whole session.
_SESSION_GUARD = jax.config.jax_transfer_guard or 'allow'


@pytest.fixture(autouse=True)
def _restore_transfer_guard():
  """parallel/setup.py flips jax_transfer_guard to 'disallow' globally when
  an agent initializes (the production default); without restoring it, any
  test running after an agent-constructing test fails on ordinary
  numpy->device transfers. Tests asserting guard behavior set it
  themselves inside the test body."""
  yield
  jax.config.update('jax_transfer_guard', _SESSION_GUARD)
