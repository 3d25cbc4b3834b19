"""Two-process jax.distributed training on CPU: host-local data feeding,
GSPMD cross-host gradient collectives, local output fetch.

This is how multi-host is tested without a pod: the topology is real (two
jax processes, a coordination service, global arrays spanning both), only
colocated — mirroring the reference's mock-device strategy one level up.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.multihost


def test_two_process_train(tmp_path):
  with socket.socket() as s:
    s.bind(('', 0))
    port = s.getsockname()[1]
  worker = os.path.join(os.path.dirname(__file__), 'multihost_worker.py')
  env = {**os.environ}
  env.pop('JAX_PLATFORMS', None)
  procs = [
      subprocess.Popen(
          [sys.executable, worker, str(rank), str(port),
           str(tmp_path / f'rank{rank}')],
          stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
          env=env)
      for rank in range(2)]
  outs = [p.communicate(timeout=540)[0] for p in procs]
  losses = []
  for rank, (proc, out) in enumerate(zip(procs, outs)):
    # The coordination-service shutdown barrier can race when the two
    # processes exit at different times under load; the MHOST line is
    # printed after training completed and is the actual assertion.
    lines = [l for l in out.splitlines() if l.startswith('MHOST')]
    assert lines, (proc.returncode, out[-2000:])
    losses.append(float(lines[0].split('loss=')[1]))
  # Both hosts must see the SAME loss: the global batch is allreduced.
  assert losses[0] == losses[1], losses
