"""Offline pretrain protocol: stream-only training with resume."""

import numpy as np

from embodied_tpu import run
from embodied_tpu.core import streams
from embodied_tpu.utils import Config, Counter, Logger, Space, TerminalOutput

import utils

import pytest

pytestmark = pytest.mark.slow


def make_spaces():
  from embodied_tpu.envs import Dummy
  env = Dummy('disc', size=(16, 16), length=10)
  obs_space = dict(env.obs_space)
  act_space = {k: v for k, v in env.act_space.items() if k != 'reset'}
  env.close()
  return obs_space, act_space


def make_stream(batch_size, length):
  def factory(_, mode):
    def batches():
      i = 0
      while True:
        i += 1
        is_first = np.zeros((batch_size, length), bool)
        is_first[:, 0] = True  # Sequences restart each batch.
        yield {
            'image': np.zeros((batch_size, length, 16, 16, 3), np.uint8),
            'vector': np.full((batch_size, length, 7), i, np.float32),
            'token': np.zeros((batch_size, length), np.int32),
            'count': np.tile(np.arange(length, dtype=np.int32),
                             (batch_size, 1)),
            'reward': np.zeros((batch_size, length), np.float32),
            'is_first': is_first,
            'is_last': np.zeros((batch_size, length), bool),
            'is_terminal': np.zeros((batch_size, length), bool),
            'action': np.zeros((batch_size, length), np.int32),
            'stepid': np.zeros((batch_size, length, 20), np.uint8),
        }
    return streams.Stateless(batches())
  return factory


class TestPretrain:

  def make_args(self, tmp_path, steps):
    return Config({
        'steps': steps,
        'batch_size': 4,
        'batch_length': 8,
        'log_every': -1,
        'report_every': -1,
        'save_every': -1,
        'consec_report': 1,
        'report_batches': 1,
        'replica': 0,
        'from_checkpoint': '',
        'logdir': str(tmp_path),
        'usage': {'psutil': False},
    })

  def test_train_and_resume(self, tmp_path):
    obs_space, act_space = make_spaces()
    agents = []

    def make_model():
      agent = utils.TestAgent(obs_space, act_space)
      agents.append(agent)
      return agent

    def make_logger():
      return Logger(Counter(), [TerminalOutput(limit=3)])

    args = self.make_args(tmp_path, steps=60)
    run.pretrain(make_model, make_stream(4, 8), make_logger, args)
    assert (tmp_path / 'checkpoint.pkl').exists()
    stats = agents[-1].stats()
    assert stats['replay_steps'] > 0
    assert stats['reports'] > 0
    assert stats['saves'] >= 1

    args = self.make_args(tmp_path, steps=120)
    run.pretrain(make_model, make_stream(4, 8), make_logger, args)
    stats = agents[-1].stats()
    assert stats['loads'] == 1, stats
