"""End-to-end Director (hierarchical agent) debug-size run."""

import os

import numpy as np

from embodied_tpu.models import common
from embodied_tpu.models.director import main as dir_main

import pytest

pytestmark = pytest.mark.slow


def make_config(tmp_path, steps=48):
  path = os.path.join(os.path.dirname(dir_main.__file__), 'configs.yaml')
  return common.assemble_config(path, [
      '--configs', 'debug',
      '--task', 'dummy_disc',
      '--logdir', str(tmp_path),
      '--batch_size', '4',
      '--batch_length', '8',
      '--run.steps', str(steps),
      '--run.train_ratio', '4',
      '--run.log_every', '0.2',
      '--run.report_every', '1e9',
      '--run.save_every', '0.5',
      '--jax.platform', '',
      '--jax.mesh', '1,1,1',
  ])


class TestDirectorEndToEnd:

  def test_train_and_resume(self, tmp_path):
    config = make_config(tmp_path, steps=48)
    common.run_script(config, dir_main.make_agent)
    assert (tmp_path / 'checkpoint.pkl').exists()
    config = make_config(tmp_path, steps=96)
    common.run_script(config, dir_main.make_agent)

  def test_hierarchy_carry_and_goal(self, tmp_path):
    config = make_config(tmp_path)
    agent = dir_main.make_agent(config)
    obs = agent._example_obs(3)
    obs['is_first'][:] = True
    carry = agent.init_policy(3)
    for step in range(6):
      obs['is_first'][:] = step == 0
      carry, act, out = agent.policy(carry, obs)
    _, hier, _ = carry
    import jax
    hier = jax.device_get(hier)
    assert (np.asarray(hier['step']) == 6).all()
    # Skills are one-hot codes; goals live in deter space.
    assert hier['skill'].shape == (3, 2, 4)
    assert np.allclose(np.asarray(hier['skill']).sum(-1), 1.0)
    assert hier['goal'].shape == (3, 8)


class TestDirectorExploration:
  """Disag ensemble + behavior selection (parity: reference director
  expl.py Disag and behaviors.py Greedy/Random/Explore)."""

  def _make_agent(self, tmp_path, **overrides):
    args = [
        '--configs', 'debug',
        '--task', 'dummy_disc',
        '--logdir', str(tmp_path),
        '--batch_size', '2',
        '--batch_length', '8',
        '--jax.platform', '',
        '--jax.mesh', '1,1,1',
    ]
    for key, value in overrides.items():
      args += [f'--{key}', str(value)]
    path = os.path.join(os.path.dirname(dir_main.__file__), 'configs.yaml')
    config = common.assemble_config(path, args)
    return dir_main.make_agent(config), config

  def test_explore_behavior_trains_disag(self, tmp_path):
    agent, config = self._make_agent(
        tmp_path, **{'agent.expl_behavior': 'explore',
                     'agent.expl_rew': 'disag'})
    data = agent._example_batch(2, 8 + config.replay_context)
    carry = agent.init_train(2)
    losses = []
    for _ in range(8):
      carry, outs, mets = agent.train(carry, data)
      losses.append(float(mets['disag_opt/loss']))
    # The ensemble regresses onto fixed example latents: loss must drop.
    assert losses[-1] < losses[0], losses
    assert any(k.startswith('expl_ac_opt') for k in mets), sorted(mets)[:10]

  def test_explore_policy_mode(self, tmp_path):
    agent, _ = self._make_agent(
        tmp_path, **{'agent.expl_behavior': 'explore'})
    obs = agent._example_obs(3)
    carry = agent.init_policy(3)
    for mode in ('train', 'explore', 'eval'):
      carry, act, _ = agent.policy(carry, obs, mode=mode)
      assert act['action'].shape == (3,)

  def test_random_behavior_in_range(self, tmp_path):
    agent, _ = self._make_agent(
        tmp_path, **{'agent.expl_behavior': 'random'})
    obs = agent._example_obs(4)
    carry = agent.init_policy(4)
    seen = set()
    for _ in range(8):
      carry, act, _ = agent.policy(carry, obs, mode='explore')
      vals = np.asarray(act['action'])
      assert ((0 <= vals) & (vals < 5)).all(), vals
      seen.update(vals.tolist())
    assert len(seen) > 1, seen

  def test_worker_disag_reward(self, tmp_path):
    agent, config = self._make_agent(
        tmp_path, **{'agent.expl_rew': 'disag',
                     'agent.worker_rews.expl': '1.0'})
    data = agent._example_batch(2, 8 + config.replay_context)
    carry = agent.init_train(2)
    carry, outs, mets = agent.train(carry, data)
    assert 'disag_opt/loss' in mets
