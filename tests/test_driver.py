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
    # After the first transition the payload rides shared memory.
    assert all(entry is not None for entry in driver.shm)
    driver.close()

  def test_parallel_processes_transition_integrity(self):
    # The shared-memory transport must deliver the same transitions as
    # in-process stepping: counting observations prove step alignment
    # and that views are not clobbered between callbacks.
    records = []
    driver = Driver(
        [lambda: Dummy('disc', length=7, size=(8, 8))], parallel=True)
    driver.on_step(lambda tran, worker: records.append(
        {k: np.copy(v) for k, v in tran.items()}))
    env = Dummy('disc', length=7, size=(8, 8))
    agent = RandomAgent(env.obs_space, env.act_space)
    driver.reset(agent.init_policy)
    driver(agent.policy, episodes=3)
    driver.close()
    count = 0
    for tran in records:
      if tran['is_first']:
        count = 0
      assert int(tran['count']) == count, (tran['count'], count)
      count += 1

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


class TestPinPad:

  def test_pinpad_episode(self):
    from embodied_tpu.envs import PinPad
    env = PinPad('three', length=50, seed=0)
    obs = env.step({'action': 0, 'reset': True})
    assert obs['is_first']
    assert obs['image'].shape == (64, 64, 3)
    total = 0.0
    for i in range(60):
      obs = env.step({'action': int(i % 5), 'reset': False})
      total += float(obs['reward'])
      if obs['is_last']:
        break
    assert obs['is_last']

  def test_pinpad_reward_for_sequence(self):
    from embodied_tpu.envs import pinpad
    env = pinpad.PinPad('three', length=1000, seed=0)
    env.step({'action': 0, 'reset': True})
    # Walk onto each pad region in order by teleporting the player.
    reward = 0.0
    for pad in (1, 2, 3):
      xs, ys = np.where(env.layout == pad)
      env.player = (int(xs[0]), int(ys[0]))
      obs = env.step({'action': 0, 'reset': False})
      reward += float(obs['reward'])
    assert reward == 10.0, reward


class TestThreadDriver:

  def test_thread_mode_matches(self):
    from embodied_tpu.core import Driver, RandomAgent
    from embodied_tpu.envs import Dummy
    fns = [lambda: Dummy('disc', size=(8, 8), length=10)] * 3
    driver = Driver(fns, parallel='thread')
    env = Dummy('disc', size=(8, 8), length=10)
    agent = RandomAgent(env.obs_space, env.act_space)
    steps = [0]
    episodes = [0]
    driver.reset(agent.init_policy)
    driver.on_step(lambda trn, i: (
        steps.__setitem__(0, steps[0] + 1),
        episodes.__setitem__(0, episodes[0] + int(trn['is_last']))))
    driver(agent.policy, steps=60)
    driver.close()
    assert steps[0] == 60
    assert episodes[0] >= 3  # 3 envs x length 10 over 20 steps each.
