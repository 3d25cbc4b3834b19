"""Test fixtures: an order-verifying agent for protocol tests.

Same test strategy as the reference (a numpy agent whose carry proves that
the framework delivers observations in order and whose counters back
protocol assertions) with a shared sequence-verifier used by both the
policy and train paths.
"""

import time
from collections import Counter

import numpy as np


def verify_counting(counts, resets, carry, reset_value=None):
  """Checks that `counts` [B, T] continue `carry` [B] except where reset,
  and returns the carry after the last step. The Dummy env emits a
  per-episode step counter, so any dropped, duplicated, or reordered
  transition breaks the arithmetic. Reset steps must equal `reset_value`
  when given (fresh episodes restart at it); otherwise any value is
  accepted there (replay windows may open mid-episode)."""
  counts = np.asarray(counts)
  resets = np.asarray(resets)
  if counts.ndim == 1:
    counts, resets = counts[:, None], resets[:, None]
  for t in range(counts.shape[1]):
    at_reset = (counts[:, t] if reset_value is None
                else np.full_like(counts[:, t], reset_value))
    want = np.where(resets[:, t], at_reset, carry + 1)
    got = counts[:, t]
    assert (got == want).all(), (t, got, want)
    carry = got
  return carry


class TestAgent:
  """Counts interactions and verifies transition order. Not a model."""

  __test__ = False  # Hide from pytest collection.

  def __init__(self, obs_space, act_space):
    self.obs_space = obs_space
    self.act_space = act_space
    self.counters = Counter()
    self.born = time.time()

  COUNTERS = ('env_steps', 'replay_steps', 'reports', 'saves', 'loads')

  def stats(self):
    out = {name: self.counters[name] for name in self.COUNTERS}
    out.update(self.counters)
    out['lifetime'] = time.time() - self.born
    return out

  def init_policy(self, batch_size):
    return (np.zeros(batch_size),)

  def init_train(self, batch_size):
    return (np.zeros(batch_size),)

  def init_report(self, batch_size):
    return ()

  def policy(self, carry, obs, mode='train'):
    assert set(obs) == set(self.obs_space), (
        sorted(obs), sorted(self.obs_space))
    assert not any(k.startswith('log/') for k in obs)
    (carry,) = carry
    B = len(obs['is_first'])
    assert np.asarray(carry).shape == (B,)
    self.counters['env_steps'] += B
    # On reset steps the env restarts its counter at zero.
    carry = verify_counting(
        obs['count'], obs['is_first'], carry, reset_value=0)
    act = {
        k: np.stack([s.sample() for _ in range(B)])
        for k, s in self.act_space.items() if k != 'reset'}
    return (carry,), act, {}

  def train(self, carry, data):
    want_keys = (set(self.obs_space) | set(self.act_space)
                 | {'stepid'}) - {'reset'}
    assert set(data) == want_keys, (sorted(data), sorted(want_keys))
    (carry,) = carry
    B, T = data['count'].shape
    assert carry.shape == (B,)
    self.counters['replay_steps'] += B * T
    carry = verify_counting(data['count'], data['is_first'], carry)
    return (carry,), {}, {}

  def report(self, carry, data):
    self.counters['reports'] += 1
    media = {
        'scalar': np.float32(0),
        'vector': np.zeros(10),
        'image': np.zeros((64, 64, 3)),
        'video': np.zeros((10, 64, 64, 3)),
    }
    return carry, media

  def stream(self, st):
    return st

  def save(self):
    self.counters['saves'] += 1
    return dict(self.counters)

  def load(self, data):
    self.counters = Counter(data)
    self.counters['loads'] += 1
