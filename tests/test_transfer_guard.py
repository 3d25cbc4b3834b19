"""Transfer-guard discipline: implicit host<->device transfers raise.

parallel/setup.py enables jax_transfer_guard='disallow' for production
(jit, non-debug) configurations, matching the reference's discipline
(/root/reference/embodied/jax/internal.py:37-38): a silent device_get or
numpy coercion in a hot loop should fail loudly, not quietly burn
host<->device bandwidth. The conftest fixture restores the guard after
each test, so enabling it here does not leak into the rest of the suite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestTransferGuard:

  def test_implicit_transfer_raises(self):
    jax.config.update('jax_transfer_guard', 'disallow')
    x = jax.device_put(np.ones((8,), np.float32))
    with pytest.raises(Exception, match='[Dd]isallowed'):
      # numpy operand forces an implicit host->device transfer.
      jnp.add(x, np.arange(8, dtype=np.float32)).block_until_ready()

  @pytest.mark.skipif(
      jax.default_backend() == 'cpu',
      reason='on XLA:CPU a device->host fetch is zero-copy, not a '
             'guarded transfer; covered on accelerator backends')
  def test_implicit_fetch_raises(self):
    jax.config.update('jax_transfer_guard', 'disallow')
    x = jax.device_put(np.ones((8,), np.float32))
    with pytest.raises(Exception, match='[Dd]isallowed'):
      np.asarray(jnp.add(x, x))  # implicit device->host

  def test_explicit_paths_stay_open(self):
    jax.config.update('jax_transfer_guard', 'disallow')
    # device_put is an explicit transfer: always sanctioned.
    x = jax.device_put(np.ones((8,), np.float32))
    y = jnp.add(x, x)
    # Sanctioned crossings ride an explicit allow scope, the pattern
    # parallel/agent.py uses at its host boundaries.
    with jax.transfer_guard('allow'):
      out = np.asarray(y)
    np.testing.assert_allclose(out, 2.0)

  def test_setup_enables_guard_for_production_configs(self):
    # setup() is process-global, so probe it in a fresh interpreter.
    import os
    import subprocess
    import sys
    code = (
        "import os; os.environ.pop('JAX_COMPILATION_CACHE_DIR', None)\n"
        "from embodied_tpu.parallel.setup import setup\n"
        "setup(platform='cpu')\n"
        "import jax\n"
        "print('guard=', jax.config.jax_transfer_guard)\n")
    env = dict(os.environ)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env['PYTHONPATH'] = root + os.pathsep + env.get('PYTHONPATH', '')
    out = subprocess.run(
        [sys.executable, '-c', code], capture_output=True, text=True,
        env=env, timeout=120)
    assert out.returncode == 0, out.stderr
    assert 'guard= disallow' in out.stdout, out.stdout
