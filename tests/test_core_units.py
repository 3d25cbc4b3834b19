"""Unit tests for wrappers, streams, and limiters."""

import numpy as np
import pytest

from embodied_tpu.core import limiters, streams, wrappers
from embodied_tpu.envs import Dummy
from embodied_tpu.utils import Space


class TestWrappers:

  def test_time_limit(self):
    env = wrappers.TimeLimit(Dummy('disc', length=100, size=(8, 8)), 5)
    obs = env.step({'action': np.int32(0), 'reset': True})
    steps = 0
    while True:
      obs = env.step({'action': np.int32(0), 'reset': False})
      steps += 1
      if obs['is_last']:
        break
    assert steps == 5

  def test_action_repeat_sums_reward(self):
    env = wrappers.ActionRepeat(Dummy('disc', length=100, size=(8, 8)), 4)
    env.step({'action': np.int32(0), 'reset': True})
    obs = env.step({'action': np.int32(0), 'reset': False})
    # Dummy gives reward step % 2 -> 2 of each 4 steps reward 1.
    assert obs['reward'] == 2.0

  def test_normalize_action_roundtrip(self):
    class ScaledEnv(Dummy):
      @property
      def act_space(self):
        return {
            'action': Space(np.float32, (2,), 0.0, 10.0),
            'reset': Space(bool),
        }
      def step(self, action):
        if not action['reset']:
          assert (np.asarray(action['action']) >= -1e-5).all()
          assert (np.asarray(action['action']) <= 10.0 + 1e-5).all()
        return super().step({'action': np.int32(0), 'reset': action['reset']})

    env = wrappers.NormalizeAction(ScaledEnv('disc', size=(8, 8)))
    space = env.act_space['action']
    assert (space.low == -1).all() and (space.high == 1).all()
    env.step({'action': np.zeros(2, np.float32), 'reset': True})
    env.step({'action': np.ones(2, np.float32), 'reset': False})

  def test_unify_dtypes(self):
    env = wrappers.UnifyDtypes(Dummy('disc', size=(8, 8)))
    obs = env.step({'action': np.int32(0), 'reset': True})
    assert obs['reward'].dtype == np.float32
    assert obs['image'].dtype == np.uint8
    assert env.obs_space['count'].dtype == np.int32

  def test_check_spaces_rejects_bad_action(self):
    env = wrappers.CheckSpaces(Dummy('disc', size=(8, 8)))
    env.step({'action': np.int32(0), 'reset': True})
    with pytest.raises(ValueError):
      env.step({'action': np.int32(99), 'reset': False})

  def test_restart_on_exception(self):
    calls = {'n': 0}

    class Crashy(Dummy):
      def step(self, action):
        calls['n'] += 1
        if calls['n'] == 3:
          raise RuntimeError('boom')
        return super().step(action)

    env = wrappers.RestartOnException(
        lambda: Crashy('disc', size=(8, 8)), wait=0)
    env.step({'action': np.int32(0), 'reset': True})
    env.step({'action': np.int32(0), 'reset': False})
    obs = env.step({'action': np.int32(0), 'reset': False})  # Crashes.
    assert obs['is_first']  # Env was rebuilt and reset.


class TestMoreWrappers:

  def test_resize_image_nearest(self):
    env = wrappers.ResizeImage(Dummy('disc', size=(16, 16)), size=(8, 8))
    assert env.obs_space['image'].shape == (8, 8, 3)
    obs = env.step({'action': np.int32(0), 'reset': True})
    assert obs['image'].shape == (8, 8, 3)
    assert obs['image'].dtype == np.uint8
    # Dummy images are constant per step; nearest resize preserves values.
    full = Dummy('disc', size=(16, 16)).step(
        {'action': np.int32(0), 'reset': True})['image']
    assert (obs['image'] == full[0, 0]).all()

  def test_discretize_action(self):
    received = []

    class Recorder(Dummy):
      def step(self, action):
        received.append(action['action'])
        return super().step({**action, 'action': np.int32(0)})

    base = Recorder('cont', size=(8, 8))
    env = wrappers.DiscretizeAction(base, 'action', bins=5)
    space = env.act_space['action']
    assert space.dtype == np.int32
    dims = base.act_space['action'].shape[0]
    env.step({'action': np.zeros(dims, np.int32), 'reset': True})
    np.testing.assert_allclose(received[-1], -np.ones(dims))
    env.step({'action': np.full(dims, 4, np.int32), 'reset': False})
    np.testing.assert_allclose(received[-1], np.ones(dims))
    env.step({'action': np.full(dims, 2, np.int32), 'reset': False})
    np.testing.assert_allclose(received[-1], np.zeros(dims))

  def test_backward_return(self):
    env = wrappers.BackwardReturn(Dummy('disc', size=(8, 8)), horizon=2)
    assert 'bwreturn' in env.obs_space
    obs = env.step({'action': np.int32(0), 'reset': True})
    acc = obs['reward']
    assert obs['bwreturn'] == np.float32(acc)
    for _ in range(5):
      obs = env.step({'action': np.int32(0), 'reset': False})
      acc = acc * 0.5 + obs['reward']
      np.testing.assert_allclose(obs['bwreturn'], acc, rtol=1e-6)

  def test_add_obs(self):
    env = wrappers.AddObs(
        Dummy('disc', size=(8, 8)), 'tag', np.float32(7), Space(np.float32))
    assert 'tag' in env.obs_space
    obs = env.step({'action': np.int32(0), 'reset': True})
    assert obs['tag'] == np.float32(7)

  def test_clip_action(self):
    received = []

    class Recorder(Dummy):
      def step(self, action):
        received.append(action['action'])
        return super().step({**action, 'action': np.int32(0)})

    base = Recorder('cont', size=(8, 8))
    env = wrappers.ClipAction(base, 'action')
    dims = base.act_space['action'].shape[0]
    env.step({'action': np.full(dims, 5.0, np.float32), 'reset': True})
    np.testing.assert_allclose(received[-1], np.ones(dims))


class TestStreams:

  def _source(self, total=64, length=12):
    # Yields batches shaped (2, length) with strictly increasing values.
    state = {'i': 0}

    class Src:
      def __iter__(self):
        return self
      def __next__(self):
        i = state['i']
        state['i'] += 1
        base = np.arange(length)[None] + i * 100
        return {
            'is_first': np.zeros((2, length), bool),
            'value': np.broadcast_to(base, (2, length)).copy(),
        }
      def save(self):
        return dict(state)
      def load(self, data):
        state.update(data)
    return Src()

  def test_consec_chunks_with_prefix(self):
    stream = streams.Consec(
        self._source(length=11), length=3, consec=3, prefix=2)
    it = iter(stream)
    first = next(it)
    second = next(it)
    assert first['value'].shape == (2, 5)
    assert (first['consec'][:, 0] == 0).all()
    assert (second['consec'][:, 0] == 1).all()
    # Chunks overlap by `prefix` steps.
    assert (second['value'][:, :2] == first['value'][:, 3:]).all()

  def test_prefetch_save_load(self):
    stream = streams.Prefetch(self._source(), amount=1)
    it = iter(stream)
    a = next(it)
    state = stream.save()
    b = next(it)
    stream.load(state)
    c = next(it)
    assert (c['value'] == b['value']).all()

  def test_zip_concatenates(self):
    zipped = streams.Zip([self._source(), self._source()])
    batch = next(iter(zipped))
    assert batch['value'].shape == (4, 12)

  def test_map(self):
    mapped = streams.Map(self._source(), lambda x: {'v2': x['value'] * 2})
    batch = next(iter(mapped))
    assert (batch['v2'] % 2 == 0).all()


class TestLimiters:

  def test_samples_per_insert(self):
    limiter = limiters.SamplesPerInsert(2.0, tolerance=4, minsize=2)
    assert limiter.want_insert()[0]
    assert not limiter.want_sample()[0]  # Below minsize.
    limiter.insert()
    limiter.insert()
    assert limiter.want_sample()[0]
    # Each insert grants 2 samples, plus `tolerance` overdraft.
    for _ in range(4 + 4):
      assert limiter.want_sample()[0]
      limiter.sample()
    assert not limiter.want_sample()[0]
    state = limiter.save()
    limiter.load(state)
    assert not limiter.want_sample()[0]
    # An insert unblocks sampling again.
    limiter.insert()
    assert limiter.want_sample()[0]


def test_space_saturated_integer_obs():
  # Inferred integer bounds are exclusive-high = iinfo.max + 1: a
  # saturated uint8 image pixel (255) is a valid observation (this
  # crashed dmc_vision runs on bright frames).
  import numpy as np
  from embodied_tpu.utils import Space
  space = Space(np.uint8, (2, 2, 3))
  assert space.contains(np.full((2, 2, 3), 255, np.uint8))
  assert space.classes == 256
