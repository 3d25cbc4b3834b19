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
