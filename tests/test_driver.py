import numpy as np

from embodied_tpu.core import Driver, RandomAgent
from embodied_tpu.envs import Dummy

import utils


class TestDriver:

  def test_episode_boundaries(self):
    length = 10
    envs = 3
    driver = Driver(
        [lambda: Dummy('disc', length=length, size=(8, 8))] * envs,
        parallel=False)
    seen = {'steps': 0, 'episodes': 0, 'firsts': 0}

    def callback(tran, worker):
      seen['steps'] += 1
      seen['episodes'] += bool(tran['is_last'])
      seen['firsts'] += bool(tran['is_first'])

    driver.on_step(callback)
    env = Dummy('disc', length=length, size=(8, 8))
    agent = RandomAgent(env.obs_space, env.act_space)
    driver.reset(agent.init_policy)
    driver(agent.policy, episodes=6)
    assert seen['episodes'] >= 6
    assert seen['firsts'] >= 6
    driver.close()

  def test_ordering_with_counting_agent(self):
    envs = 2
    driver = Driver(
        [lambda: Dummy('disc', length=10, size=(8, 8))] * envs,
        parallel=False)
    env = Dummy('disc', length=10, size=(8, 8))
    agent = utils.TestAgent(env.obs_space, env.act_space)
    driver.reset(agent.init_policy)
    driver(agent.policy, steps=100)
    assert agent.stats()['env_steps'] >= 100
    driver.close()

  def test_parallel_processes(self):
    envs = 2
    driver = Driver(
        [lambda: Dummy('disc', length=10, size=(8, 8))] * envs,
        parallel=True)
    env = Dummy('disc', length=10, size=(8, 8))
    agent = utils.TestAgent(env.obs_space, env.act_space)
    driver.reset(agent.init_policy)
    driver(agent.policy, steps=30)
    assert agent.stats()['env_steps'] >= 30
    driver.close()

  def test_action_masking_at_episode_end(self):
    driver = Driver(
        [lambda: Dummy('cont', length=5, size=(8, 8))], parallel=False)
    records = []
    driver.on_step(lambda tran, worker: records.append(dict(tran)))
    env = Dummy('cont', length=5, size=(8, 8))
    agent = RandomAgent(env.obs_space, env.act_space)
    driver.reset(agent.init_policy)
    driver(agent.policy, episodes=2)
    for tran in records:
      if tran['is_last']:
        assert np.allclose(tran['action'], 0.0)
    driver.close()
