"""Memory and socket bandwidth (manual; not run in CI).

Capability parity: /root/reference/embodied/perf/test_bandwidth.py
(reference machine: ~21 GiB/s read, ~7 GiB/s copy, ~4 GiB/s socket).
"""

import socket
import sys
import threading
import time

sys.path.insert(0, '.')

import numpy as np

GIB = 1024 ** 3


def bench_numpy(size=256 * 1024 * 1024):
  array = np.ones(size, np.uint8)
  t0 = time.perf_counter()
  array.sum()
  print(f'numpy read:  {size / GIB / (time.perf_counter() - t0):6.1f} GiB/s')
  t0 = time.perf_counter()
  array.copy()
  print(f'numpy copy:  {size / GIB / (time.perf_counter() - t0):6.1f} GiB/s')


def bench_socket(size=256 * 1024 * 1024):
  payload = np.zeros(size, np.uint8).tobytes()
  server = socket.socket()
  server.bind(('localhost', 0))
  server.listen(1)
  port = server.getsockname()[1]
  received = [0]

  def reader():
    conn, _ = server.accept()
    while received[0] < size:
      chunk = conn.recv(1 << 22)
      if not chunk:
        break
      received[0] += len(chunk)
    conn.close()

  thread = threading.Thread(target=reader, daemon=True)
  thread.start()
  client = socket.create_connection(('localhost', port))
  t0 = time.perf_counter()
  client.sendall(payload)
  thread.join(timeout=60)
  dt = time.perf_counter() - t0
  print(f'socket send: {size / GIB / dt:6.1f} GiB/s')
  client.close()
  server.close()


if __name__ == '__main__':
  bench_numpy()
  bench_socket()
