"""Minecraft action-grammar parity vs the reference's three modules.

These tests exercise the pure grammar tables and translation logic only,
so they run without the minerl package. Cardinalities are pinned to the
reference: minecraft_flat.py (12 basic / 25 diamond), minecraft_factor.py
(Diamond1 main 11 x other 15; Diamond2 6/5/2/4/9/4), and
minecraft_keyboard.py (23 keys + 11x11 mu-law mouse).
"""

import numpy as np

from embodied_tpu.envs import minecraft as mc


class TestFlatGrammar:

  def test_basic_cardinality(self):
    assert len(mc.BASIC_ACTIONS) == 12
    space = mc.flat_act_space('wood')
    assert space['action'].classes == 12

  def test_diamond_cardinality(self):
    assert len(mc.DIAMOND_ACTIONS) == 25
    space = mc.flat_act_space('diamond')
    assert space['action'].classes == 25

  def test_diamond_actions_superset(self):
    for name in mc.BASIC_ACTIONS:
      assert name in mc.DIAMOND_ACTIONS

  def test_translate_fills_noop_defaults(self):
    raw = mc.translate_flat({'action': 0}, 'wood')
    assert set(raw) == set(mc.NOOP)
    assert raw['camera'] == (0, 0)
    raw = mc.translate_flat(
        {'action': list(mc.DIAMOND_ACTIONS).index('smelt_iron_ingot')},
        'diamond')
    assert raw['nearbySmelt'] == 'iron_ingot'

  def test_jump_also_moves_forward(self):
    raw = mc.translate_flat(
        {'action': list(mc.BASIC_ACTIONS).index('jump')}, 'wood')
    assert raw['jump'] == 1 and raw['forward'] == 1


class TestFactorGrammar:

  def test_factor1_cardinalities(self):
    space = mc.factor_act_space('factor1')
    assert space['main'].classes == 11
    assert space['other'].classes == 15

  def test_factor2_cardinalities(self):
    space = mc.factor_act_space('factor2')
    sizes = {k: v.classes for k, v in space.items() if k != 'reset'}
    assert sizes == {
        'move': 6, 'look': 5, 'attack': 2, 'place': 4, 'make': 9,
        'equip': 4}, sizes

  def test_factor_merge_simultaneous(self):
    act = {'move': 1, 'look': 1, 'attack': 1, 'place': 0, 'make': 0,
           'equip': 0}
    raw = mc.translate_factor(act, 'factor2')
    assert raw['forward'] == 1
    assert raw['attack'] == 1
    assert raw['camera'] == (-15, 0)

  def test_factor_camera_accumulates(self):
    # Two camera-affecting groups merge additively.
    act = {'main': 2, 'other': 0}
    raw = mc.translate_factor(act, 'factor1')
    assert raw['camera'] == (-15, 0)


class TestKeyboardGrammar:

  def test_key_table(self):
    assert len(mc.KEYBOARD_KEYS) == 23
    # Each key maps to a distinct MineRL command.
    commands = [command for _, command, _ in mc.KEYBOARD_KEYS]
    assert len(set(commands)) == 23
    space = mc.keyboard_act_space()
    assert space['keys'].shape == (23,)
    assert space['mouse'].classes == 121

  def test_mouse_roundtrip(self):
    for xy in ([0.0, 0.0], [15.0, -15.0], [66.0, 66.0], [-66.0, 3.0]):
      idx = mc.mouse_discretize(np.array(xy, np.float32))
      back = mc.mouse_undiscretize(idx)
      again = mc.mouse_discretize(np.array(back, np.float32))
      assert (idx == again).all(), (xy, idx, back, again)

  def test_mouse_center_is_noop(self):
    center = mc.MOUSE_BINS // 2
    back = mc.mouse_undiscretize(np.array([center, center], np.int32))
    assert np.allclose(back, 0.0), back

  def test_translate_keyboard(self):
    keys = np.zeros(23, np.int32)
    keys[[i for i, (n, _, _) in enumerate(mc.KEYBOARD_KEYS)
          if n == 'forward']] = 1
    center = mc.MOUSE_BINS // 2
    raw = mc.translate_keyboard(
        {'mouse': center * mc.MOUSE_BINS + center, 'keys': keys})
    assert raw['forward'] == 1
    assert raw['attack'] == 0
    assert np.allclose(raw['camera'], (0.0, 0.0))
    assert set(raw) == set(mc.KEYBOARD_NOOP)

  def test_diamond_reward_table(self):
    rewards = mc.task_rewards('diamond', 'keyboard')
    assert len(rewards) == len(mc.KEYBOARD_DIAMOND_REWARDS)


class TestRewardMachinery:

  def test_collect_once(self):
    fn = mc.CollectReward('log', once=1)
    assert fn({'is_first': True}, {'log': 0}) == 0
    assert fn({'is_first': False}, {'log': 1}) == 1
    assert fn({'is_first': False}, {'log': 2}) == 0  # once only

  def test_collect_repeated_capped(self):
    fn = mc.CollectReward('log', repeated=0.5, times=3)
    fn({'is_first': True}, {'log': 0})
    assert fn({'is_first': False}, {'log': 2}) == 1.0
    assert fn({'is_first': False}, {'log': 5}) == 0.5  # cap hit at 3
    assert fn({'is_first': False}, {'log': 9}) == 0.0

  def test_collect_item_group(self):
    fn = mc.CollectReward(mc.LOG_ITEMS, repeated=1)
    fn({'is_first': True}, {})
    assert fn({'is_first': False}, {'oak_log': 1, 'birch_log': 1}) == 2

  def test_health_reward(self):
    fn = mc.HealthReward(scale=0.01)
    assert fn({'is_first': True, 'health': 1.0}) == 0
    assert abs(fn({'is_first': False, 'health': 0.5}) + 0.005) < 1e-9

  def test_sticky_attack_and_jump(self):
    ctl = mc.StickyController(sticky_attack=3, sticky_jump=2)
    raw = ctl(dict(mc.NOOP, attack=1))
    assert raw['attack'] == 1
    raw = ctl(dict(mc.NOOP))  # still sticky
    assert raw['attack'] == 1 and raw['jump'] == 0
    ctl2 = mc.StickyController(sticky_attack=0, sticky_jump=2)
    raw = ctl2(dict(mc.NOOP, jump=1))
    raw = ctl2(dict(mc.NOOP))
    assert raw['jump'] == 1 and raw['forward'] == 1

  def test_pitch_limit(self):
    ctl = mc.StickyController(
        sticky_attack=0, sticky_jump=0, pitch_limit=(-30, 30))
    for _ in range(2):
      raw = ctl(dict(mc.NOOP, camera=(15, 0)))
      assert raw['camera'] == (15, 0)
    raw = ctl(dict(mc.NOOP, camera=(15, 0)))  # would exceed +30
    assert raw['camera'] == (0, 0)
    raw = ctl(dict(mc.NOOP, camera=(-15, 5)))  # down is fine
    assert raw['camera'] == (-15, 5)


class _FakeActSpace:

  def noop(self):
    return dict(mc.NOOP)


class _FakeMineRL:
  """Minimal MineRLObtainDiamondShovel stand-in for step-path tests."""

  def __init__(self):
    self.action_space = _FakeActSpace()
    self.inventory = {}

  def _obs(self):
    return {
        'pov': np.zeros((64, 64, 3), np.uint8),
        'inventory': dict(self.inventory),
        'life_stats': {'life': 20.0},
    }

  def reset(self):
    self.inventory = {}
    return self._obs()

  def step(self, action):
    return self._obs(), 0.0, False, {}


def _fake_minecraft(task='diamond', actions='flat'):
  env = mc.Minecraft.__new__(mc.Minecraft)
  env._task = task
  env._mode = actions
  env._env = _FakeMineRL()
  env._size = (64, 64)
  env._length = 100
  env._logs = False
  env._rewards = mc.task_rewards(task, actions)
  env._sticky = mc.StickyController(sticky_attack=0)
  env._inventory = {}
  env._max_y = None
  env._step_count = 0
  env._done = True
  return env


class TestEpisodeRewardReset:
  """Reward-fn state must reset on every episode boundary, not only at
  construction: milestone 'once' rewards fire again in later episodes
  and the health baseline re-anchors after respawn."""

  def test_once_milestones_fire_each_episode(self):
    env = _fake_minecraft('diamond', 'flat')
    noop = {'reset': False, 'action': 0}

    def run_episode():
      env.step({'reset': True, 'action': 0})
      env._env.inventory = {'log': 1}
      obs = env.step(noop)
      return float(obs['reward'])

    first = run_episode()
    second = run_episode()
    assert first >= 1.0, first   # 'log' milestone once-reward
    assert second == first, (first, second)

  def test_keyboard_times_cap_resets_each_episode(self):
    env = _fake_minecraft('diamond', 'keyboard')
    noop = {k: np.zeros_like(v.sample())
            for k, v in mc.keyboard_act_space().items()}
    noop['reset'] = False

    def collect_logs(n):
      env.step({**noop, 'reset': True})
      total = 0.0
      for i in range(n):
        env._env.inventory = {'oak_log': i + 1}
        total += float(env.step(noop)['reward'])
      return total

    first = collect_logs(10)
    second = collect_logs(10)
    assert first > 0, first
    assert second == first, (first, second)
