"""Wall-clock schedules, cluster-consistent across replicas.

Capability parity: /root/reference/embodied/core/clock.py — LocalClock
(0 = off, negative = always) and GlobalClock, which makes identical timing
decisions on every replica by routing through a clock server on replica 0
with a barrier over all replicas. The server here runs on our remote RPC
layer (embodied_tpu.remote) instead of portal.
"""

import threading
import time

_CLIENT = None
_REPLICA = None


def setup(is_server, replica, replicas, port, addr):
  """Wire replica 0 as the clock server; everyone gets a client."""
  global _CLIENT, _REPLICA
  assert _CLIENT is None
  if replicas <= 1:
    return
  from .. import remote
  if is_server:
    _start_server(port, replicas)
  client = remote.Client(addr, 'ClockClient')
  client.connect()
  _CLIENT = client
  _REPLICA = replica


def _start_server(port, replicas):
  from .. import remote

  clocks = []
  requests = []
  result = [None]
  receive = threading.Barrier(replicas)
  respond = threading.Barrier(replicas)

  def create(replica, every):
    requests.append(every)
    receive.wait()
    if replica == 0:
      assert len(requests) == replicas
      assert all(x == every for x in requests)
      clockid = len(clocks)
      clocks.append([float(every), time.time()])
      result[0] = clockid
      requests.clear()
    respond.wait()
    return result[0]

  def should(replica, clockid, skip):
    requests.append((clockid, skip))
    receive.wait()
    if replica == 0:
      assert len(requests) == replicas
      every, prev = clocks[clockid]
      now = time.time()
      if every == 0:
        decision = False
      elif every < 0:
        decision = True
      elif now >= prev + every:
        clocks[clockid][1] = now
        decision = True
      else:
        decision = False
      decision = decision and not any(skip for _, skip in requests)
      result[0] = decision
      requests.clear()
    respond.wait()
    return result[0]

  server = remote.Server(port, 'ClockServer')
  server.bind('create', create, workers=replicas)
  server.bind('should', should, workers=replicas)
  server.start(block=False)


class LocalClock:

  def __init__(self, every, first=False):
    self.every = every
    self.prev = None
    self.first = first

  def __call__(self, step=None, skip=None):
    if skip:
      return False
    if self.every == 0:
      return False
    if self.every < 0:
      return True
    now = time.time()
    if self.prev is None:
      self.prev = now
      return self.first
    if now >= self.prev + self.every:
      self.prev = now
      return True
    return False


class GlobalClock:

  def __init__(self, every, first=False):
    self.multihost = bool(_CLIENT)
    if self.multihost:
      self.clockid = _CLIENT.call('create', _REPLICA, every).result()
      self.skip_next = not first
    else:
      self.clock = LocalClock(every, first)

  def __call__(self, step=None, skip=None):
    if self.multihost:
      if self.skip_next:
        self.skip_next = False
        skip = True
      return _CLIENT.call('should', _REPLICA, self.clockid, bool(skip)).result()
    return self.clock(step, skip)
