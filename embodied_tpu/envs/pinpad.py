"""PinPad: built-in grid task testing long-horizon memory.

Capability parity: /root/reference/embodied/envs/pinpad.py — the agent
walks a 16x14 grid containing N colored pads and is rewarded for visiting
all pads in a fixed (per-task) order; the activation sequence is shown
along the right edge. Layouts here are generated procedurally (pads placed
around the perimeter of a walled arena) rather than from ASCII art.
"""

import collections

import numpy as np

from ..utils import Space

COLORS = {
    1: (255, 0, 0), 2: (0, 255, 0), 3: (0, 0, 255), 4: (255, 255, 0),
    5: (255, 0, 255), 6: (0, 255, 255), 7: (128, 0, 128), 8: (0, 128, 128),
}

TASKS = {'three': 3, 'four': 4, 'five': 5, 'six': 6, 'seven': 7, 'eight': 8}


def _make_layout(num_pads):
  """16x14 arena: border walls, pads as 3x3 regions along the perimeter."""
  width, height = 16, 14
  grid = np.zeros((width, height), np.int8)  # 0 floor, -1 wall, >0 pad id.
  grid[0, :] = grid[-1, :] = -1
  grid[:, 0] = grid[:, -1] = -1
  # Pad anchor positions around the perimeter (clockwise).
  anchors = [
      (1, 1), (6, 1), (11, 1), (12, 5), (12, 10),
      (6, 10), (1, 10), (1, 5)]
  for pad in range(1, num_pads + 1):
    ax, ay = anchors[(pad - 1) % len(anchors)]
    grid[ax:ax + 3, ay:ay + 3] = pad
  return grid


class PinPad:

  def __init__(self, task, length=10000, seed=None):
    assert task in TASKS, (task, sorted(TASKS))
    assert length > 0
    self.num_pads = TASKS[task]
    self.layout = _make_layout(self.num_pads)
    self.length = length
    self.random = np.random.default_rng(seed)
    self.target = tuple(range(1, self.num_pads + 1))
    self.spawns = [
        (x, y) for (x, y), v in np.ndenumerate(self.layout) if v >= 0]
    self.sequence = collections.deque(maxlen=self.num_pads)
    self.player = None
    self.steps = 0
    self.done = True
    self.countdown = 0

  @property
  def act_space(self):
    return {
        'action': Space(np.int32, (), 0, 5),
        'reset': Space(bool),
    }

  @property
  def obs_space(self):
    return {
        'image': Space(np.uint8, (64, 64, 3)),
        'reward': Space(np.float32),
        'is_first': Space(bool),
        'is_last': Space(bool),
        'is_terminal': Space(bool),
    }

  def step(self, action):
    if self.done or action['reset']:
      self.player = self.spawns[self.random.integers(len(self.spawns))]
      self.sequence.clear()
      self.steps = 0
      self.done = False
      self.countdown = 0
      return self._obs(0.0, is_first=True)
    if self.countdown:
      self.countdown -= 1
      if self.countdown == 0:
        self.player = self.spawns[self.random.integers(len(self.spawns))]
        self.sequence.clear()
    reward = 0.0
    move = [(0, 0), (0, 1), (0, -1), (1, 0), (-1, 0)][int(action['action'])]
    x = int(np.clip(self.player[0] + move[0], 0, 15))
    y = int(np.clip(self.player[1] + move[1], 0, 13))
    tile = int(self.layout[x, y])
    if tile >= 0:
      self.player = (x, y)
    if tile > 0:
      if not self.sequence or self.sequence[-1] != tile:
        self.sequence.append(tile)
    if tuple(self.sequence) == self.target and not self.countdown:
      reward += 10.0
      self.countdown = 10
    self.steps += 1
    self.done = self.steps >= self.length
    return self._obs(reward, is_last=self.done)

  def _obs(self, reward, is_first=False, is_last=False, is_terminal=False):
    return dict(
        image=self._render(),
        reward=np.float32(reward),
        is_first=is_first,
        is_last=is_last,
        is_terminal=is_terminal,
    )

  def _render(self):
    grid = np.full((16, 16, 3), 255, np.uint8)
    white = np.array([255, 255, 255])
    if self.countdown:
      grid[:] = (223, 255, 223)
    current = int(self.layout[self.player[0], self.player[1]])
    for (x, y), value in np.ndenumerate(self.layout):
      value = int(value)
      if value == -1:
        grid[x, y] = (192, 192, 192)
      elif value > 0:
        color = np.array(COLORS[value])
        if value != current:
          color = (10 * color + 90 * white) / 100
        grid[x, y] = color
    grid[self.player] = (0, 0, 0)
    grid[:, -2:] = (192, 192, 192)
    for i, pad in enumerate(self.sequence):
      grid[2 * i + 1, -2] = COLORS[pad]
    image = np.repeat(np.repeat(grid, 4, 0), 4, 1)
    return image

  def close(self):
    pass
