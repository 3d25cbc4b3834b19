"""Minecraft (MineRL) adapter with milestone-reward tasks.

Capability parity: /root/reference/embodied/envs/minecraft.py family —
task wrappers (wood / climb / diamond) over a base MineRL env that grants
one-time rewards for inventory milestones, with three action-space
variants mirroring the reference's minecraft_flat / minecraft_factor /
minecraft_keyboard modules:

- actions='flat':     one discrete action over composite primitives.
- actions='factor':   a dict of independent discrete subaction groups
                      (move/turn/look/attack/jump/place/craft/smelt/equip)
                      merged into one simultaneous MineRL action.
- actions='keyboard': a multi-hot key vector plus a binned mouse action,
                      the rawest humanlike interface.

This adapter is gated on the `minerl` package, which needs a patched wheel
and a JDK; see the reference Dockerfile for the full environment recipe.
"""

import numpy as np

from ..utils import Space

DIAMOND_MILESTONES = [
    'log', 'planks', 'stick', 'crafting_table', 'wooden_pickaxe',
    'cobblestone', 'stone_pickaxe', 'iron_ore', 'furnace', 'iron_ingot',
    'iron_pickaxe', 'diamond']

WOOD_MILESTONES = ['log', 'planks', 'stick', 'crafting_table']

# Composite actions: each entry maps to a MineRL action dict update.
ACTIONS = {
    'noop': {},
    'attack': {'attack': 1},
    'forward': {'forward': 1},
    'back': {'back': 1},
    'left': {'left': 1},
    'right': {'right': 1},
    'jump': {'jump': 1, 'forward': 1},
    'look_up': {'camera': (-15, 0)},
    'look_down': {'camera': (15, 0)},
    'turn_left': {'camera': (0, -15)},
    'turn_right': {'camera': (0, 15)},
    'place_table': {'place': 'crafting_table'},
    'place_furnace': {'place': 'furnace'},
    'craft_planks': {'craft': 'planks'},
    'craft_stick': {'craft': 'stick'},
    'craft_table': {'craft': 'crafting_table'},
    'craft_wooden_pickaxe': {'nearbyCraft': 'wooden_pickaxe'},
    'craft_stone_pickaxe': {'nearbyCraft': 'stone_pickaxe'},
    'craft_iron_pickaxe': {'nearbyCraft': 'iron_pickaxe'},
    'smelt_iron': {'nearbySmelt': 'iron_ingot'},
    'place_torch': {'place': 'torch'},
    'equip_best': {'equip': 'iron_pickaxe'},
}


# Factorized subaction groups: each group is an independent discrete
# choice; the selected entries merge into one simultaneous action.
FACTOR_GROUPS = {
    'move': [{}, {'forward': 1}, {'back': 1}, {'left': 1}, {'right': 1}],
    'turn': [{}, {'camera': (0, -15)}, {'camera': (0, 15)}],
    'look': [{}, {'camera': (-15, 0)}, {'camera': (15, 0)}],
    'attack': [{}, {'attack': 1}],
    'jump': [{}, {'jump': 1}],
    'place': [{}, {'place': 'crafting_table'}, {'place': 'furnace'},
              {'place': 'torch'}],
    'craft': [{}, {'craft': 'planks'}, {'craft': 'stick'},
              {'craft': 'crafting_table'},
              {'nearbyCraft': 'wooden_pickaxe'},
              {'nearbyCraft': 'stone_pickaxe'},
              {'nearbyCraft': 'iron_pickaxe'}],
    'smelt': [{}, {'nearbySmelt': 'iron_ingot'}],
    'equip': [{}, {'equip': 'wooden_pickaxe'}, {'equip': 'stone_pickaxe'},
              {'equip': 'iron_pickaxe'}],
}

# Keyboard mode: multi-hot keys plus a binned mouse (camera) action.
KEYBOARD_KEYS = ['forward', 'back', 'left', 'right', 'jump', 'sneak',
                 'sprint', 'attack', 'use']
MOUSE_BINS = 11  # Odd, so the center bin is a no-op.
MOUSE_SPAN = 60.0  # Degrees covered by the outermost bins.


class Minecraft:

  def __init__(self, task, size=(64, 64), break_speed=100.0, logs=False,
               length=36000, actions='flat', seed=None):
    try:
      import minerl  # noqa: F401
      import gym
    except ImportError:
      raise ImportError('The Minecraft env requires minerl (and a JDK)')
    assert actions in ('flat', 'factor', 'keyboard'), actions
    self._milestones = {
        'wood': WOOD_MILESTONES,
        'climb': [],
        'diamond': DIAMOND_MILESTONES,
    }[task]
    self._task = task
    self._env = gym.make('MineRLObtainDiamondShovel-v0')
    self._size = tuple(size)
    self._length = length
    self._logs = logs
    self._mode = actions
    self._actions = list(ACTIONS.values())
    self._collected = set()
    self._max_y = None
    self._step_count = 0
    self._done = True

  @property
  def obs_space(self):
    spaces = {
        'image': Space(np.uint8, (*self._size, 3)),
        'inventory': Space(np.float32, len(self._milestones) or 1),
        'reward': Space(np.float32),
        'is_first': Space(bool),
        'is_last': Space(bool),
        'is_terminal': Space(bool),
    }
    if self._logs:
      spaces.update({
          f'log/{item}': Space(np.int32) for item in self._milestones})
    return spaces

  @property
  def act_space(self):
    if self._mode == 'factor':
      spaces = {
          name: Space(np.int32, (), 0, len(group))
          for name, group in FACTOR_GROUPS.items()}
      return {**spaces, 'reset': Space(bool)}
    if self._mode == 'keyboard':
      return {
          'keys': Space(np.int32, (len(KEYBOARD_KEYS),), 0, 2),
          'mouse': Space(np.int32, (), 0, MOUSE_BINS * MOUSE_BINS),
          'reset': Space(bool),
      }
    return {
        'action': Space(np.int32, (), 0, len(self._actions)),
        'reset': Space(bool),
    }

  def _merge(self, act, update):
    for key, value in update.items():
      if key == 'camera':
        prev = tuple(np.asarray(act.get('camera', (0, 0))).tolist())
        act['camera'] = (prev[0] + value[0], prev[1] + value[1])
      else:
        act[key] = value

  def _translate(self, action):
    act = self._env.action_space.noop()
    if self._mode == 'factor':
      for name, group in FACTOR_GROUPS.items():
        self._merge(act, group[int(action[name])])
    elif self._mode == 'keyboard':
      for key, pressed in zip(KEYBOARD_KEYS, np.asarray(action['keys'])):
        if pressed:
          act[key] = 1
      mouse = int(action['mouse'])
      row, col = divmod(mouse, MOUSE_BINS)
      center = MOUSE_BINS // 2
      scale = MOUSE_SPAN / center
      act['camera'] = ((row - center) * scale, (col - center) * scale)
    else:
      self._merge(act, self._actions[int(action['action'])])
    return act

  def step(self, action):
    if action['reset'] or self._done:
      obs = self._env.reset()
      self._collected = set()
      self._max_y = None
      self._step_count = 0
      self._done = False
      return self._obs(obs, 0.0, is_first=True)
    act = self._translate(action)
    obs, _, done, _ = self._env.step(act)
    self._step_count += 1
    reward = 0.0
    if self._task == 'climb':
      y = float(obs.get('location_stats', {}).get('ypos', 0.0))
      if self._max_y is None:
        self._max_y = y
      reward = max(0.0, y - self._max_y)
      self._max_y = max(self._max_y, y)
    else:
      inventory = obs.get('inventory', {})
      for item in self._milestones:
        if item not in self._collected and inventory.get(item, 0) > 0:
          self._collected.add(item)
          reward += 1.0
    self._done = done or self._step_count >= self._length
    return self._obs(obs, reward, is_last=self._done, is_terminal=done)

  def _obs(self, obs, reward, is_first=False, is_last=False,
           is_terminal=False):
    image = np.asarray(obs['pov'], np.uint8)
    if image.shape[:2] != self._size:
      from PIL import Image
      image = np.array(
          Image.fromarray(image).resize(self._size, Image.BILINEAR))
    inventory = obs.get('inventory', {})
    invvec = np.array([
        np.log1p(float(inventory.get(item, 0)))
        for item in (self._milestones or ['log'])], np.float32)
    result = {
        'image': image,
        'inventory': invvec,
        'reward': np.float32(reward),
        'is_first': is_first,
        'is_last': is_last,
        'is_terminal': is_terminal,
    }
    if self._logs:
      result.update({
          f'log/{item}': np.int32(item in self._collected)
          for item in self._milestones})
    return result

  def close(self):
    try:
      self._env.close()
    except Exception:
      pass
