"""Framework contracts: Agent, Env, Stream.

Capability parity: /root/reference/embodied/core/base.py:1-73. These are the
stable interfaces every run protocol drives. Observations must contain
is_first/is_last/is_terminal (and usually reward); keys prefixed 'log/'
bypass the agent. Action spaces must contain a 'reset' key.
"""


class Agent:

  def __init__(self, obs_space, act_space, config):
    pass

  def init_train(self, batch_size):
    raise NotImplementedError('init_train(batch_size) -> carry')

  def init_report(self, batch_size):
    raise NotImplementedError('init_report(batch_size) -> carry')

  def init_policy(self, batch_size):
    raise NotImplementedError('init_policy(batch_size) -> carry')

  def train(self, carry, data):
    raise NotImplementedError('train(carry, data) -> carry, out, metrics')

  def report(self, carry, data):
    raise NotImplementedError('report(carry, data) -> carry, metrics')

  def policy(self, carry, obs, mode='train'):
    raise NotImplementedError('policy(carry, obs, mode) -> carry, act, out')

  def stream(self, st):
    raise NotImplementedError('stream(st) -> st')

  def save(self):
    raise NotImplementedError('save() -> data')

  def load(self, data):
    raise NotImplementedError('load(data) -> None')


class Env:

  def __repr__(self):
    return (
        f'{self.__class__.__name__}('
        f'obs_space={self.obs_space}, '
        f'act_space={self.act_space})')

  @property
  def obs_space(self):
    raise NotImplementedError('Returns: dict of spaces')

  @property
  def act_space(self):
    raise NotImplementedError('Returns: dict of spaces')

  def step(self, action):
    raise NotImplementedError('Returns: dict')

  def close(self):
    pass


class Stream:

  def __iter__(self):
    return self

  def __next__(self):
    raise NotImplementedError

  def save(self):
    raise NotImplementedError

  def load(self, state):
    raise NotImplementedError
