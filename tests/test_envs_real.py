"""Adapter tests against real environment libraries (gymnasium,
dm_control) — installed in this image; other suites stay import-gated."""

import importlib.util

import numpy as np
import pytest

pytestmark = pytest.mark.slow

has = lambda mod: importlib.util.find_spec(mod) is not None


def rollout(env, steps=5):
  act = {k: np.zeros(v.shape, v.dtype)
         for k, v in env.act_space.items() if k != 'reset'}
  obs = env.step({**act, 'reset': True})
  assert obs['is_first']
  seen = [obs]
  for _ in range(steps):
    obs = env.step({**act, 'reset': False})
    seen.append(obs)
  for obs in seen:
    for key, space in env.obs_space.items():
      assert key in obs, key
      value = np.asarray(obs[key])
      assert value.shape == space.shape, (key, value.shape, space.shape)
  env.close()
  return seen


@pytest.mark.skipif(not has('gymnasium'), reason='no gymnasium')
class TestFromGymReal:

  def test_cartpole(self):
    from embodied_tpu.envs.from_gym import FromGym
    env = FromGym('CartPole-v1')
    seen = rollout(env, steps=8)
    assert seen[1]['reward'] == 1.0

  def test_wrapped_stack(self):
    from embodied_tpu.envs.from_gym import FromGym
    from embodied_tpu.core import wrappers
    env = FromGym('CartPole-v1')
    env = wrappers.UnifyDtypes(env)
    env = wrappers.CheckSpaces(env)
    rollout(env, steps=4)


@pytest.mark.skipif(not has('dm_control'), reason='no dm_control')
class TestDMCReal:

  def test_proprio(self):
    from embodied_tpu.envs.dmc import DMC
    env = DMC('walker_walk', image=False)
    seen = rollout(env, steps=4)
    assert 'orientations' in seen[0]

  def test_vision(self):
    from embodied_tpu.envs.dmc import DMC
    env = DMC('walker_walk', proprio=False, size=(64, 64))
    seen = rollout(env, steps=2)
    image = seen[-1]['image']
    assert image.shape == (64, 64, 3) and image.dtype == np.uint8
    assert image.std() > 0  # A real render, not zeros.


@pytest.mark.skipif(not has('dm_control'), reason='no dm_control')
class TestLocoNavReal:

  def test_ant_maze(self):
    from embodied_tpu.envs.loconav import LocoNav
    env = LocoNav('ant_maze_m', size=(48, 48))
    seen = rollout(env, steps=3)
    assert seen[-1]['image'].shape == (48, 48, 3)

  def test_quadruped_maze(self):
    from embodied_tpu.envs.loconav import LocoNav
    env = LocoNav('quadruped_maze_s', size=(48, 48))
    assert env.act_space['action'].shape == (12,)  # 4 legs x 3 joints.
    seen = rollout(env, steps=3)
    assert seen[-1]['image'].std() > 0
