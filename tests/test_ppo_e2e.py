"""End-to-end PPO on the virtual 8-device CPU mesh via the train protocol."""

import os

from embodied_tpu.models import common
from embodied_tpu.models.ppo import main as ppo_main
from embodied_tpu.utils import Config


def make_config(tmp_path, steps=64):
  path = os.path.join(
      os.path.dirname(ppo_main.__file__), 'configs.yaml')
  config = common.assemble_config(path, [
      '--configs', 'debug',
      '--task', 'dummy_disc',
      '--logdir', str(tmp_path),
      '--batch_size', '8',
      '--batch_length', '8',
      '--report_length', '8',
      '--run.steps', str(steps),
      '--run.train_ratio', '4',
      '--run.log_every', '0.2',
      '--run.report_every', '0.5',
      '--run.save_every', '0.3',
      '--jax.platform', '',
      '--jax.mesh', '4,2,1',
  ])
  return config


import pytest


@pytest.mark.slow
class TestPPOEndToEnd:

  def test_train_and_resume(self, tmp_path):
    config = make_config(tmp_path, steps=64)
    common.run_script(config, ppo_main.make_agent)
    assert (tmp_path / 'checkpoint.pkl').exists()
    assert (tmp_path / 'metrics.jsonl').exists()

    # Resume: agent store and step counter restore from checkpoint.
    config = make_config(tmp_path, steps=128)
    common.run_script(config, ppo_main.make_agent)

  def test_latent_table_replaces_memory_column(self, tmp_path):
    # With the device-resident latent table on (default), the recurrent
    # GRU state never reaches the host: replay stores slot ids and the
    # policy outs carry slot/slotgen instead of the memory vector.
    import numpy as np
    config = make_config(tmp_path)
    agent = ppo_main.make_agent(config)
    assert agent._latents is not None
    ext = agent.ext_space
    assert 'slot' in ext and 'memory' not in ext
    assert 'logp/action' in ext  # Behavior logp stays replay data.
    obs = agent._example_obs(3)
    obs['is_first'][:] = True
    carry = agent.init_policy(3)
    carry, act, out = agent.policy(carry, obs)
    assert 'slot' in out and 'memory' not in out
    B = config.batch_size
    T = config.batch_length + config.replay_context
    data = agent._example_batch(B, T)
    data['is_first'][:, 0] = True
    tcarry = agent.init_train(B)
    tcarry, outs, mets = agent.train(tcarry, data)
    assert np.isfinite(float(mets['opt/loss']))

  def test_policy_store_subset(self, tmp_path):
    config = make_config(tmp_path)
    agent = ppo_main.make_agent(config)
    pstore = agent.policy_store()
    assert pstore, 'policy store empty'
    assert all(k.split('/')[0] in ('enc', 'actemb', 'rnn', 'policy')
               for k in pstore)
    assert not any(k.startswith('value/') for k in pstore)
    assert not any(k.startswith('opt/') for k in pstore)


class TestConfigAssembly:

  def test_presets_and_overrides(self, tmp_path):
    config = make_config(tmp_path)
    assert config.agent.enc.impala.depth == 2  # debug preset
    assert config.batch_size == 8  # CLI override
    assert config.jax.mesh == '4,2,1'
