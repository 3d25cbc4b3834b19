from functools import partial as bind

import numpy as np

from embodied_tpu import core, run
from embodied_tpu.core import streams
from embodied_tpu.envs import Dummy
from embodied_tpu.utils import Config, Counter, Logger, TerminalOutput

import utils


class TestTrain:

  def test_run_loop_and_resume(self, tmp_path):
    args = self._make_args(tmp_path)
    agent = self._make_agent()
    run.train(
        lambda: agent, bind(self._make_replay, args), self._make_env,
        self._make_stream(args), self._make_logger, args)
    stats = agent.stats()
    replay_steps = args.steps * args.train_ratio
    assert np.allclose(stats['env_steps'], args.steps, 100, 0.1)
    assert np.allclose(stats['replay_steps'], replay_steps, 200, 0.2)
    assert stats['reports'] >= 1
    assert stats['saves'] >= 1
    assert stats['loads'] == 0

    # Re-run: must restore from checkpoint and continue.
    args = args.update(steps=2 * args.steps)
    run.train(
        lambda: agent, bind(self._make_replay, args), self._make_env,
        self._make_stream(args), self._make_logger, args)
    stats = agent.stats()
    assert stats['loads'] == 1
    assert np.allclose(stats['env_steps'], args.steps, 200, 0.1)

  def _make_agent(self):
    env = self._make_env(0)
    agent = utils.TestAgent(env.obs_space, env.act_space)
    env.close()
    return agent

  def _make_env(self, index):
    return Dummy('disc', size=(8, 8), length=100)

  def _make_replay(self, args):
    return core.Replay(length=args.batch_length, capacity=1e4, chunksize=64)

  def _make_stream(self, args):
    def make_stream(replay, mode):
      batch = args.batch_size
      return streams.Stateless(lambda: replay.sample(batch, mode))
    return make_stream

  def _make_logger(self):
    return Logger(Counter(), [TerminalOutput(limit=5)])

  def _make_args(self, logdir):
    return Config(
        logdir=str(logdir),
        steps=1000,
        duration=0,
        train_ratio=8.0,
        log_every=0.05,
        report_every=0.05,
        save_every=0.05,
        batch_size=4,
        batch_length=8,
        report_batches=1,
        consec_report=1,
        from_checkpoint='',
        envs=2,
        debug=True,
        usage={'psutil': False},
    )
