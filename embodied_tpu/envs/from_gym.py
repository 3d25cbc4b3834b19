"""Gym/Gymnasium adapter (supports both old 4-tuple and new 5-tuple APIs).

Capability parity: /root/reference/embodied/envs/from_gym.py — dict or flat
observation/action spaces, nested-space flattening with '/'-joined keys.
"""

import functools

import numpy as np

from ..utils import Space


def _import_gym():
  try:
    import gymnasium as gym
    return gym, True
  except ImportError:
    pass
  try:
    import gym
    return gym, False
  except ImportError:
    raise ImportError(
        'FromGym requires gymnasium or gym, neither is installed')


class FromGym:

  def __init__(self, env, obs_key='image', act_key='action', **kwargs):
    self._gym, self._new_api = _import_gym()
    if isinstance(env, str):
      self._env = self._gym.make(env, **kwargs)
    else:
      assert not kwargs, kwargs
      self._env = env
    self._obs_dict = hasattr(self._env.observation_space, 'spaces')
    self._act_dict = hasattr(self._env.action_space, 'spaces')
    self._obs_key = obs_key
    self._act_key = act_key
    self._done = True
    self._info = None

  @property
  def env(self):
    return self._env

  @property
  def info(self):
    return self._info

  @functools.cached_property
  def obs_space(self):
    if self._obs_dict:
      spaces = self._flatten(self._env.observation_space.spaces)
    else:
      spaces = {self._obs_key: self._env.observation_space}
    spaces = {k: self._convert(v) for k, v in spaces.items()}
    return {
        **spaces,
        'reward': Space(np.float32),
        'is_first': Space(bool),
        'is_last': Space(bool),
        'is_terminal': Space(bool),
    }

  @functools.cached_property
  def act_space(self):
    if self._act_dict:
      spaces = self._flatten(self._env.action_space.spaces)
    else:
      spaces = {self._act_key: self._env.action_space}
    spaces = {k: self._convert(v) for k, v in spaces.items()}
    spaces['reset'] = Space(bool)
    return spaces

  def step(self, action):
    if action['reset'] or self._done:
      self._done = False
      obs = self._env.reset()
      if isinstance(obs, tuple):  # Gymnasium returns (obs, info).
        obs, self._info = obs
      return self._obs(obs, 0.0, is_first=True)
    if self._act_dict:
      action = self._unflatten(
          {k: v for k, v in action.items() if k != 'reset'})
    else:
      action = action[self._act_key]
    result = self._env.step(action)
    if len(result) == 5:  # Gymnasium: obs, reward, terminated, truncated.
      obs, reward, terminated, truncated, self._info = result
      self._done = bool(terminated or truncated)
      is_terminal = bool(terminated)
    else:
      obs, reward, self._done, self._info = result
      is_terminal = bool(self._info.get('is_terminal', self._done))
    return self._obs(
        obs, reward, is_last=bool(self._done), is_terminal=is_terminal)

  def _obs(self, obs, reward, is_first=False, is_last=False,
           is_terminal=False):
    if not self._obs_dict:
      obs = {self._obs_key: obs}
    obs = self._flatten(obs)
    obs = {k: np.asarray(v) for k, v in obs.items()}
    obs.update(
        reward=np.float32(reward),
        is_first=is_first,
        is_last=is_last,
        is_terminal=is_terminal)
    return obs

  def render(self):
    return self._env.render()

  def close(self):
    try:
      self._env.close()
    except Exception:
      pass

  def _flatten(self, nest, prefix=None):
    result = {}
    for key, value in nest.items():
      key = f'{prefix}/{key}' if prefix else key
      if hasattr(value, 'spaces'):
        value = value.spaces
      if isinstance(value, dict):
        result.update(self._flatten(value, key))
      else:
        result[key] = value
    return result

  def _unflatten(self, flat):
    result = {}
    for key, value in flat.items():
      parts = key.split('/')
      node = result
      for part in parts[:-1]:
        node = node.setdefault(part, {})
      node[parts[-1]] = value
    return result

  def _convert(self, space):
    if hasattr(space, 'n'):
      return Space(np.int32, (), 0, int(space.n))
    return Space(space.dtype, space.shape, space.low, space.high)
