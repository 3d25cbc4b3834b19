"""Test fixtures: a counting agent that proves observation ordering.

Mirrors the reference's test strategy (/root/reference/embodied/tests/
utils.py): the agent's carry arithmetic asserts that the framework delivers
observations in order, and counts env/replay steps, reports, saves, loads
for protocol assertions.
"""

import time

import numpy as np


class TestAgent:

  __test__ = False  # Not a pytest class.

  def __init__(self, obs_space, act_space):
    self.obs_space = obs_space
    self.act_space = act_space
    self._stats = {
        'env_steps': 0, 'replay_steps': 0, 'reports': 0,
        'saves': 0, 'loads': 0, 'created': time.time(),
    }

  def stats(self):
    stats = self._stats.copy()
    stats['lifetime'] = time.time() - stats.pop('created')
    return stats

  def init_policy(self, batch_size):
    return (np.zeros(batch_size),)

  def init_train(self, batch_size):
    return (np.zeros(batch_size),)

  def init_report(self, batch_size):
    return ()

  def policy(self, carry, obs, mode='train'):
    assert set(obs.keys()) == set(self.obs_space.keys())
    B = len(obs['is_first'])
    self._stats['env_steps'] += B
    carry, = carry
    carry = np.asarray(carry)
    assert carry.shape == (B,)
    assert not any(k.startswith('log/') for k in obs.keys())
    # Counting invariant: each env's count increments unless reset.
    target = (carry + 1) * (1 - obs['is_first'])
    assert (obs['count'] == target).all(), (obs['count'], target)
    carry = target
    act = {
        k: np.stack([v.sample() for _ in range(B)])
        for k, v in self.act_space.items() if k != 'reset'}
    return (carry,), act, {}

  def train(self, carry, data):
    expected = sorted(
        (set(self.obs_space.keys() | self.act_space.keys()) | {'stepid'})
        - {'reset'})
    assert sorted(data.keys()) == expected, (sorted(data.keys()), expected)
    B, T = data['count'].shape
    carry, = carry
    assert carry.shape == (B,)
    self._stats['replay_steps'] += B * T
    for t in range(T):
      current = data['count'][:, t]
      reset = data['is_first'][:, t]
      target = (1 - reset) * (carry + 1) + reset * current
      assert (current == target).all(), (t, current, target)
      carry = current
    return (carry,), {}, {}

  def report(self, carry, data):
    self._stats['reports'] += 1
    return carry, {
        'scalar': np.float32(0),
        'vector': np.zeros(10),
        'image': np.zeros((64, 64, 3)),
        'video': np.zeros((10, 64, 64, 3)),
    }

  def stream(self, st):
    return st

  def save(self):
    self._stats['saves'] += 1
    return self._stats.copy()

  def load(self, data):
    self._stats = dict(data)
    self._stats['loads'] += 1
