"""Dataplane codec microbenchmarks (manual; not run in CI).

Compares the native C++ codec (embodied_tpu/native/dataplane.cpp) against
the pickle-5 out-of-band fallback on representative RPC payloads:
an env transition batch and a replay training batch.
"""

import pickle
import sys
import time

sys.path.insert(0, '.')

import numpy as np

from embodied_tpu import native


def payloads():
  rng = np.random.default_rng(0)
  tran = {
      'image': rng.integers(0, 255, (64, 64, 3), np.uint8),
      'reward': np.float32(1.0),
      'is_first': False, 'is_last': False, 'is_terminal': False,
      'dyn/deter': rng.normal(size=2048).astype(np.int8),
      'dyn/stoch': rng.integers(0, 32, 32, np.uint8),
  }
  batch = {
      'image': rng.integers(0, 255, (16, 65, 64, 64, 3), np.uint8),
      'reward': rng.normal(size=(16, 65)).astype(np.float32),
      'dyn/deter': rng.normal(size=(16, 65, 2048)).astype(np.int8),
      'stepid': rng.integers(0, 255, (16, 65, 20), np.uint8),
  }
  return {'transition': tran, 'train_batch': batch}


def bench(fn, n):
  fn()
  t0 = time.perf_counter()
  for _ in range(n):
    fn()
  return (time.perf_counter() - t0) / n * 1e6


def main():
  codec = native.codec
  assert codec is not None, 'native codec unavailable'
  for name, obj in payloads().items():
    n = 2000 if name == 'transition' else 200
    us_native = bench(lambda: codec.encode((1, 'm', (obj,))), n)
    us_pickle = bench(lambda: pickle.dumps(
        (1, 'm', (obj,)), protocol=5, buffer_callback=[].append), n)

    meta, buffers, region = codec.encode((1, 'm', (obj,)))
    pad = (-len(meta)) % 64
    frame = bytearray(len(meta) + pad + region)
    frame[:len(meta)] = meta
    off = len(meta) + pad
    for b in buffers:
      v = memoryview(b).cast('B')
      frame[off:off + v.nbytes] = v
      off += v.nbytes
    us_dec = bench(
        lambda: codec.decode(frame, 0, len(meta), len(meta) + pad), n)
    bufs = []
    m = pickle.dumps((1, 'm', (obj,)), protocol=5,
                     buffer_callback=bufs.append)
    raws = [bytes(b.raw()) for b in bufs]
    us_pdec = bench(lambda: pickle.loads(m, buffers=raws), n)
    print(f'{name:12s} encode: native {us_native:8.1f} us  '
          f'pickle5 {us_pickle:8.1f} us  ({us_pickle / us_native:.1f}x)')
    print(f'{name:12s} decode: native {us_dec:8.1f} us  '
          f'pickle5 {us_pdec:8.1f} us  ({us_pdec / us_dec:.1f}x)')


if __name__ == '__main__':
  main()
