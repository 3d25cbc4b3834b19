"""Learning sanity: agents must improve on a trivially learnable task.

The 'dummy_bandit' task rewards one fixed action out of five; a working
gradient path takes random policy (~0.2 reward/step) towards 1.0.
"""

import json
import os

import numpy as np

from embodied_tpu.models import common
from embodied_tpu.models.ppo import main as ppo_main

import pytest

pytestmark = pytest.mark.slow


class TestLearning:

  def test_ppo_learns_bandit(self, tmp_path):
    path = os.path.join(
        os.path.dirname(ppo_main.__file__), 'configs.yaml')
    config = common.assemble_config(path, [
        '--configs', 'debug',
        '--task', 'dummy_bandit',
        '--logdir', str(tmp_path),
        '--batch_size', '8',
        '--batch_length', '16',
        '--replay_context', '0',
        '--run.steps', '3000',
        '--run.train_ratio', '64',
        '--run.log_every', '2',
        '--run.report_every', '1e9',
        '--run.save_every', '1e9',
        '--run.envs', '4',
        '--replay.size', '4e3',
        '--agent.opt.lr', '3e-3',
        '--agent.opt.warmup', '20',
        '--agent.enc.impala.depth', '4',
        '--agent..*\\.units', '32',
        '--jax.platform', '',
        '--jax.mesh', '1,1,1',
    ])
    common.run_script(config, ppo_main.make_agent)

    scores = []
    with open(tmp_path / 'scores.jsonl') as f:
      for line in f:
        if line.strip():
          scores.append(json.loads(line))
    assert len(scores) >= 10, len(scores)
    half = len(scores) // 2
    early = np.mean([s['score'] for s in scores[:max(3, half // 2)]])
    late = np.mean([s['score'] for s in scores[-max(3, half // 2):]])
    # Episodes last 100 steps; random policy scores ~20, optimal ~99.
    assert late > early + 10, (early, late)
    assert late > 40, (early, late)


class TestDreamerLearnsRewards:

  def test_reward_loss_decreases(self, tmp_path):
    # Dummy 'disc' rewards are a deterministic function of the observable
    # step counter, so the world model must drive the reward loss toward
    # zero — proves the end-to-end encode/observe/head gradient path.
    import json
    import os
    from embodied_tpu.models import common
    from embodied_tpu.models.dreamerv3 import main as dv3_main
    path = os.path.join(os.path.dirname(dv3_main.__file__), 'configs.yaml')
    config = common.assemble_config(path, [
        '--configs', 'debug',
        '--task', 'dummy_disc',
        '--logdir', str(tmp_path),
        '--run.steps', '400',
        '--run.train_ratio', '32',
        '--run.log_every', '2',
        '--run.save_every', '9999',
        '--agent.opt.lr', '1e-3',
        '--agent.opt.warmup', '50',
        '--jax.platform', '',
        '--jax.mesh', '1,1,1',
    ])
    common.run_script(config, dv3_main.make_agent)
    records = []
    with open(tmp_path / 'metrics.jsonl') as f:
      for line in f:
        rec = json.loads(line)
        if 'train/loss/rew' in rec:
          records.append(rec['train/loss/rew'])
    assert len(records) >= 3, records
    assert records[0] > 1.0, records
    assert min(records) < 0.5, records
