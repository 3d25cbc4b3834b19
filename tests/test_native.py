"""Native C++ dataplane codec: roundtrips, zero-copy, RPC integration."""

import numpy as np
import pytest

from embodied_tpu import native
from embodied_tpu.remote import rpc


class _Custom:

  def __init__(self, v):
    self.v = v

  def __eq__(self, other):
    return self.v == other.v


def assemble(meta, buffers, region, align=64):
  pad = (-len(meta)) % align
  frame = bytearray(len(meta) + pad + region)
  frame[:len(meta)] = meta
  off = len(meta) + pad
  for b in buffers:
    v = memoryview(b).cast('B')
    frame[off:off + v.nbytes] = v
    off += v.nbytes
  return frame, len(meta) + pad


@pytest.mark.skipif(native.codec is None, reason='no compiler')
class TestCodec:

  def roundtrip(self, obj):
    meta, buffers, region = native.codec.encode(obj)
    frame, region_off = assemble(meta, buffers, region)
    return native.codec.decode(frame, 0, len(meta), region_off)

  def test_scalars_and_containers(self):
    obj = (1, -2**40, 3.5, 'text', None, True, False, b'bytes',
           [1, [2, (3,)]], {'k': {'n': 7}})
    assert self.roundtrip(obj) == obj

  def test_arrays_all_dtypes(self):
    rng = np.random.default_rng(0)
    for dtype in ('uint8', 'int8', 'int32', 'int64', 'float16',
                  'float32', 'float64', 'bool'):
      x = rng.normal(0, 100, (3, 7)).astype(dtype)
      y = self.roundtrip({'x': x})['x']
      assert y.dtype == x.dtype and np.array_equal(y, x)

  def test_numpy_scalars(self):
    out = self.roundtrip({'a': np.float32(1.5), 'b': np.int64(-3)})
    assert out['a'] == 1.5 and out['a'].dtype == np.float32
    assert out['b'] == -3

  def test_zero_copy_large_arrays(self):
    x = np.random.randn(64, 1024).astype(np.float32)
    out = self.roundtrip({'x': x})
    assert out['x'].base is not None  # aliases the frame
    assert np.array_equal(out['x'], x)

  def test_pickle_fallback_objects(self):
    obj = {'custom': _Custom(5), 'set': {1, 2}, 'big': 2**100,
           'cplx': 1 + 2j}
    out = self.roundtrip(obj)
    assert out['custom'] == _Custom(5)
    assert out['set'] == {1, 2} and out['big'] == 2**100
    assert out['cplx'] == 1 + 2j

  def test_noncontiguous_arrays(self):
    x = np.arange(100).reshape(10, 10)[::2, ::3]
    out = self.roundtrip({'x': x})
    assert np.array_equal(out['x'], x)

  def test_empty_and_zero_size(self):
    out = self.roundtrip({'e': np.zeros((0, 4), np.float32), 'd': {},
                          'l': [], 's': ''})
    assert out['e'].shape == (0, 4)
    assert out['d'] == {} and out['l'] == [] and out['s'] == ''


class TestRpcFrames:

  @pytest.mark.parametrize('use_native', [True, False])
  def test_send_recv_roundtrip(self, use_native):
    if use_native and native.codec is None:
      pytest.skip('no compiler')
    import socket
    import threading
    old = rpc._codec
    rpc._codec = native.codec if use_native else None
    try:
      a, b = socket.socketpair()
      payload = (7, 'method', ({
          'obs': np.random.randint(0, 255, (4, 8, 8, 3), np.uint8),
          'deter': np.random.randn(4, 32).astype(np.float16),
          'reward': np.float32(2.0),
      },))
      lock = threading.Lock()
      rpc._send(a, lock, payload)
      out = rpc._recv(b)
      assert out[0] == 7 and out[1] == 'method'
      got = out[2][0]
      assert np.array_equal(got['obs'], payload[2][0]['obs'])
      assert np.array_equal(got['deter'], payload[2][0]['deter'])
      assert got['reward'] == 2.0
      a.close(), b.close()
    finally:
      rpc._codec = old

  def test_mixed_endpoints(self):
    # A pickle-mode sender must be understood regardless of local codec.
    import socket
    import threading
    old = rpc._codec
    a, b = socket.socketpair()
    try:
      rpc._codec = None
      rpc._send(a, threading.Lock(), {'x': np.arange(5)})
      rpc._codec = native.codec  # receiver may have the codec
      out = rpc._recv(b)
      assert np.array_equal(out['x'], np.arange(5))
    finally:
      rpc._codec = old
      a.close(), b.close()
