"""Batched RPC inference throughput (manual; not run in CI).

Capability parity: /root/reference/embodied/perf/test_distr.py — frames/s
through a BatchServer with many clients (reference machine: ~4,100
frames/s with 32 clients, batch 16, 4 workers).
"""

import sys
import threading
import time

sys.path.insert(0, '.')

import numpy as np

from embodied_tpu import remote


def bench(clients=32, batch=16, duration=10.0):
  port = remote.free_port()
  server = remote.BatchServer(port, 'Bench')
  count = [0]

  def workfn(obs):
    count[0] += obs['image'].shape[0]
    return {'action': np.zeros((obs['image'].shape[0],), np.int32)}, None

  server.bind('act', workfn, None, batch=batch, workers=1)
  server.start(block=False)

  stop = threading.Event()

  def client_loop(i):
    client = remote.Client(port, f'C{i}', connect=True)
    obs = {'image': np.zeros((64, 64, 3), np.uint8)}
    while not stop.is_set():
      try:
        client.call('act', obs).result(timeout=10)
      except Exception:
        return
    client.close()

  threads = [
      threading.Thread(target=client_loop, args=(i,), daemon=True)
      for i in range(clients)]
  [t.start() for t in threads]
  time.sleep(1.0)  # Warmup.
  count[0] = 0
  t0 = time.perf_counter()
  time.sleep(duration)
  frames = count[0]
  dt = time.perf_counter() - t0
  stop.set()
  server.close()
  print(f'clients={clients} batch={batch}  frames/s={frames / dt:8.0f}')


if __name__ == '__main__':
  bench()
