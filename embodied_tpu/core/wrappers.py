"""Environment middleware stack.

Capability parity: /root/reference/embodied/core/wrappers.py — TimeLimit,
ActionRepeat, ClipAction, NormalizeAction, UnifyDtypes, CheckSpaces,
DiscretizeAction, ResizeImage, BackwardReturn, AddObs, RestartOnException.
"""

import functools
import time

import numpy as np

from ..utils import Space


class Wrapper:

  def __init__(self, env):
    self.env = env

  def __len__(self):
    return len(self.env)

  def __getattr__(self, name):
    if name.startswith('__'):
      raise AttributeError(name)
    try:
      return getattr(self.env, name)
    except AttributeError:
      raise ValueError(name)


class TimeLimit(Wrapper):

  def __init__(self, env, duration, reset=True):
    super().__init__(env)
    self._duration = duration
    self._reset = reset
    self._step = 0
    self._done = False

  def step(self, action):
    if action['reset'] or self._done:
      self._step = 0
      self._done = False
      if self._reset:
        return self.env.step({**action, 'reset': True})
      obs = self.env.step({**action, 'reset': False})
      obs['is_first'] = True
      return obs
    self._step += 1
    obs = self.env.step(action)
    if self._duration and self._step >= self._duration:
      obs['is_last'] = True
    self._done = obs['is_last']
    return obs


class ActionRepeat(Wrapper):

  def __init__(self, env, repeat):
    super().__init__(env)
    self._repeat = repeat

  def step(self, action):
    if action['reset']:
      return self.env.step(action)
    reward = 0.0
    for _ in range(self._repeat):
      obs = self.env.step(action)
      reward += obs['reward']
      if obs['is_last'] or obs['is_terminal']:
        break
    obs['reward'] = np.float32(reward)
    return obs


class ClipAction(Wrapper):

  def __init__(self, env, key='action', low=-1, high=1):
    super().__init__(env)
    self._key = key
    self._low = low
    self._high = high

  def step(self, action):
    if self._key not in action:
      return self.env.step(action)
    clipped = np.clip(action[self._key], self._low, self._high)
    return self.env.step({**action, self._key: clipped})


class NormalizeAction(Wrapper):
  """Exposes bounded continuous actions in [-1, 1] and rescales to env."""

  def __init__(self, env, key='action'):
    super().__init__(env)
    self._key = key
    self._space = env.act_space[key]
    self._mask = np.isfinite(self._space.low) & np.isfinite(self._space.high)
    self._low = np.where(self._mask, self._space.low, -1)
    self._high = np.where(self._mask, self._space.high, 1)

  @functools.cached_property
  def act_space(self):
    low = np.where(self._mask, -np.ones_like(self._low), self._low)
    high = np.where(self._mask, np.ones_like(self._high), self._high)
    space = Space(np.float32, self._space.shape, low, high)
    return {**self.env.act_space, self._key: space}

  def step(self, action):
    orig = (action[self._key] + 1) / 2 * (self._high - self._low) + self._low
    orig = np.where(self._mask, orig, action[self._key])
    return self.env.step({**action, self._key: orig})


class UnifyDtypes(Wrapper):
  """Canonicalizes dtypes: floats->f32, uint8 stays, other ints->i32."""

  def __init__(self, env):
    super().__init__(env)
    self._obs_space, _, self._obs_outer = self._convert(env.obs_space)
    self._act_space, self._act_inner, _ = self._convert(env.act_space)

  @property
  def obs_space(self):
    return self._obs_space

  @property
  def act_space(self):
    return self._act_space

  def step(self, action):
    action = {
        k: np.asarray(v, self._act_inner[k]) if k in self._act_inner else v
        for k, v in action.items()}
    obs = self.env.step(action)
    for key, dtype in self._obs_outer.items():
      if key in obs:
        obs[key] = np.asarray(obs[key], dtype)
    return obs

  def _convert(self, spaces):
    results, befores, afters = {}, {}, {}
    for key, space in spaces.items():
      before = after = space.dtype
      if space.dtype == bool:
        after = np.dtype(bool)
      elif np.issubdtype(before, np.floating):
        after = np.dtype(np.float32)
      elif np.issubdtype(before, np.uint8):
        after = np.dtype(np.uint8)
      elif np.issubdtype(before, np.integer):
        after = np.dtype(np.int32)
      befores[key] = before
      afters[key] = after
      results[key] = Space(after, space.shape, space.low, space.high)
    return results, befores, afters


class CheckSpaces(Wrapper):
  """Validates every action and observation against the declared spaces."""

  def __init__(self, env):
    assert not (env.obs_space.keys() & env.act_space.keys()), (
        env.obs_space.keys(), env.act_space.keys())
    super().__init__(env)

  def step(self, action):
    for key, value in action.items():
      self._check(value, self.env.act_space[key], key)
    obs = self.env.step(action)
    for key, value in obs.items():
      if not key.startswith('log/'):
        self._check(value, self.env.obs_space[key], key)
    return obs

  def _check(self, value, space, key):
    if not isinstance(value, (
        np.ndarray, np.generic, list, tuple, int, float, bool)):
      raise TypeError(f'Invalid type {type(value)} for key {key}.')
    if space.contains(value):
      return
    arr = np.asarray(value)
    raise ValueError(
        f"Value for '{key}' with dtype {arr.dtype}, shape {arr.shape}, "
        f"range [{np.min(value)}, {np.max(value)}] is not in {space}.")


class DiscretizeAction(Wrapper):

  def __init__(self, env, key='action', bins=5):
    super().__init__(env)
    shape = env.act_space[key].shape
    self._dims = int(shape[0]) if shape else 1
    self._values = np.linspace(-1, 1, bins)
    self._key = key

  @functools.cached_property
  def act_space(self):
    space = Space(np.int32, self._dims, 0, len(self._values))
    return {**self.env.act_space, self._key: space}

  def step(self, action):
    continuous = np.take(self._values, action[self._key])
    return self.env.step({**action, self._key: continuous})


class ResizeImage(Wrapper):

  def __init__(self, env, size=(64, 64)):
    super().__init__(env)
    self._size = tuple(size)
    self._keys = [
        k for k, v in env.obs_space.items()
        if len(v.shape) > 1 and tuple(v.shape[:2]) != self._size]
    if self._keys:
      from PIL import Image
      self._Image = Image

  @functools.cached_property
  def obs_space(self):
    spaces = dict(self.env.obs_space)
    for key in self._keys:
      shape = self._size + spaces[key].shape[2:]
      spaces[key] = Space(np.uint8, shape)
    return spaces

  def step(self, action):
    obs = self.env.step(action)
    for key in self._keys:
      image = self._Image.fromarray(obs[key])
      image = image.resize(self._size, self._Image.NEAREST)
      obs[key] = np.array(image)
    return obs


class BackwardReturn(Wrapper):
  """Adds discounted backward-looking return as an observation."""

  def __init__(self, env, horizon):
    super().__init__(env)
    self._discount = 1 - 1 / horizon
    self._bwreturn = 0.0

  @functools.cached_property
  def obs_space(self):
    return {**self.env.obs_space, 'bwreturn': Space(np.float32)}

  def step(self, action):
    obs = self.env.step(action)
    self._bwreturn *= (1 - obs['is_first']) * self._discount
    self._bwreturn += obs['reward']
    obs['bwreturn'] = np.float32(self._bwreturn)
    return obs


class AddObs(Wrapper):

  def __init__(self, env, key, value, space):
    super().__init__(env)
    self._key = key
    self._value = value
    self._space = space

  @functools.cached_property
  def obs_space(self):
    return {**self.env.obs_space, self._key: self._space}

  def step(self, action):
    obs = self.env.step(action)
    obs[self._key] = self._value
    return obs


class RestartOnException(Wrapper):
  """Rebuilds a crashed env, rate-limited by a failure window."""

  def __init__(
      self, ctor, exceptions=(Exception,), window=300, maxfails=2, wait=20):
    if not isinstance(exceptions, (tuple, list)):
      exceptions = (exceptions,)
    self._ctor = ctor
    self._exceptions = tuple(exceptions)
    self._window = window
    self._maxfails = maxfails
    self._wait = wait
    self._last = time.time()
    self._fails = 0
    super().__init__(self._ctor())

  def step(self, action):
    try:
      return self.env.step(action)
    except self._exceptions as e:
      if time.time() > self._last + self._window:
        self._last = time.time()
        self._fails = 1
      else:
        self._fails += 1
      if self._fails > self._maxfails:
        raise RuntimeError('The env crashed too many times.')
      print(f'Restarting env after crash with {type(e).__name__}: {e}',
            flush=True)
      time.sleep(self._wait)
      self.env = self._ctor()
      action = dict(action)
      action['reset'] = np.ones_like(action['reset'])
      return self.env.step(action)
