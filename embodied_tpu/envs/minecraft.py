"""Minecraft (MineRL) adapter with milestone-reward tasks.

Capability parity: /root/reference/embodied/envs/minecraft.py family —
task wrappers (wood / climb / diamond) over a base MineRL env that grants
one-time rewards for inventory milestones, with a flat discrete-ish action
space (movement/camera/attack/place/craft composites).

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


class Minecraft:

  def __init__(self, task, size=(64, 64), break_speed=100.0, logs=False,
               length=36000, seed=None):
    try:
      import minerl  # noqa: F401
      import gym
    except ImportError:
      raise ImportError('The Minecraft env requires minerl (and a JDK)')
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
    return {
        'action': Space(np.int32, (), 0, len(self._actions)),
        'reset': Space(bool),
    }

  def step(self, action):
    if action['reset'] or self._done:
      obs = self._env.reset()
      self._collected = set()
      self._max_y = None
      self._step_count = 0
      self._done = False
      return self._obs(obs, 0.0, is_first=True)
    act = self._env.action_space.noop()
    for key, value in self._actions[int(action['action'])].items():
      act[key] = value
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
