"""Worker for the multi-host test: one of two jax.distributed processes.

Each process gets 4 virtual CPU devices (8 global). The agent scales the
global batch by process_count and feeds host-local rows through
make_array_from_process_local_data; both processes must compute the SAME
loss (allreduced by GSPMD) for the test to pass.
"""

import os
import sys


def main():
  rank = int(sys.argv[1])
  port = sys.argv[2]
  logdir = sys.argv[3]
  os.environ.pop('JAX_PLATFORMS', None)
  # Strip any inherited device-count flag (pytest's conftest sets 8).
  flags = [f for f in os.environ.get('XLA_FLAGS', '').split()
           if 'xla_force_host_platform_device_count' not in f]
  os.environ['XLA_FLAGS'] = ' '.join(
      flags + ['--xla_force_host_platform_device_count=4'])
  # No persistent compile cache on XLA:CPU: its AOT deserialization
  # segfaults intermittently (see parallel/setup.py host_cache_dir note).
  os.environ.pop('JAX_COMPILATION_CACHE_DIR', None)
  import jax
  jax.config.update('jax_platforms', 'cpu')
  jax.distributed.initialize(
      coordinator_address=f'localhost:{port}', num_processes=2,
      process_id=rank)
  assert jax.process_count() == 2, jax.process_count()
  assert jax.device_count() == 8, jax.device_count()

  sys.path.insert(0, os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))))
  import numpy as np
  from embodied_tpu.models import common
  from embodied_tpu.models.dreamerv3 import main as dv3_main
  path = os.path.join(os.path.dirname(dv3_main.__file__), 'configs.yaml')
  config = common.assemble_config(path, [
      '--configs', 'debug',
      '--task', 'dummy_disc',
      '--logdir', logdir,
      '--batch_size', '4',   # Per host; the agent scales to 8 global.
      '--batch_length', '8',
      '--jax.platform', '',
      '--jax.mesh', '8,1,1',
      '--jax.precompile', 'False',
  ])
  agent = dv3_main.make_agent(config)
  assert agent.batch_size == 8, agent.batch_size  # Global batch.

  B_local = 4
  L = config.batch_length + config.replay_context
  data = agent._example_batch(agent.batch_size, L)
  data = {k: v[:B_local] for k, v in data.items()}  # Host-local rows.
  data['is_first'][:, 0] = True
  carry = agent.init_train(B_local)
  for _ in range(2):
    carry, outs, mets = agent.train(carry, dict(data))
  loss = float(np.asarray(mets['opt/loss']))
  print(f'MHOST rank={rank} loss={loss:.6f}', flush=True)
  assert np.isfinite(loss)
  # Reach the shutdown barrier together: compile skew between the
  # processes can exceed the coordination service's shutdown timeout.
  from jax.experimental import multihost_utils
  multihost_utils.sync_global_devices('done')
  jax.distributed.shutdown()


if __name__ == '__main__':
  main()
