"""Replay throughput benchmark (manual; not run in CI).

Capability parity: /root/reference/embodied/perf/test_replay.py — inserts
and samples per second across chunk sizes.
"""

import sys
import time

sys.path.insert(0, '.')

import numpy as np

from embodied_tpu.core import Replay


def make_step(i):
  return {
      'image': np.zeros((64, 64, 3), np.uint8),
      'vector': np.zeros(128, np.float32),
      'reward': np.float32(i),
      'is_first': np.bool_(i % 100 == 0),
      'is_last': np.bool_(i % 100 == 99),
  }


def bench(chunksize, inserts=20000, samples=500, batch=16, length=64):
  replay = Replay(length=length, capacity=inserts, chunksize=chunksize)
  step = make_step(0)
  t0 = time.perf_counter()
  for i in range(inserts):
    replay.add(step, worker=i % 16)
  dt_insert = time.perf_counter() - t0
  t0 = time.perf_counter()
  for _ in range(samples):
    replay.sample(batch)
  dt_sample = time.perf_counter() - t0
  print(f'chunksize={chunksize:5d}  '
        f'inserts/s={inserts / dt_insert:10.0f}  '
        f'samples/s={samples / dt_sample:8.1f}  '
        f'sampled_steps/s={samples * batch * length / dt_sample:10.0f}')


if __name__ == '__main__':
  for chunksize in (64, 256, 1024):
    bench(chunksize)
