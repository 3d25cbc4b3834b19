"""End-to-end DreamerV3 debug-size runs, incl. multi-device mesh + resume."""

import os

import numpy as np

from embodied_tpu.models import common
from embodied_tpu.models.dreamerv3 import main as dv3_main

import pytest

pytestmark = pytest.mark.slow


def make_config(tmp_path, steps=48, mesh='1,1,1', batch=4, *extra):
  path = os.path.join(os.path.dirname(dv3_main.__file__), 'configs.yaml')
  return common.assemble_config(path, [
      '--configs', 'debug',
      '--task', 'dummy_disc',
      '--logdir', str(tmp_path),
      '--batch_size', str(batch),
      '--batch_length', '8',
      '--report_length', '8',
      '--run.steps', str(steps),
      '--run.train_ratio', '4',
      '--run.log_every', '0.2',
      '--run.report_every', '1.0',
      '--run.save_every', '0.5',
      '--jax.platform', '',
      '--jax.mesh', mesh,
      *extra,
  ])


class TestDreamerEndToEnd:

  def test_train_and_resume(self, tmp_path):
    config = make_config(tmp_path, steps=48)
    common.run_script(config, dv3_main.make_agent)
    assert (tmp_path / 'checkpoint.pkl').exists()
    config = make_config(tmp_path, steps=96)
    common.run_script(config, dv3_main.make_agent)

  def test_multidevice_mesh(self, tmp_path):
    config = make_config(tmp_path, steps=48, mesh='2,2,1', batch=4)
    common.run_script(config, dv3_main.make_agent)

  def test_replay_latent_roundtrip(self, tmp_path):
    # Host-path latents (jax.latent_slots=0): the train outs must carry
    # refreshed latents keyed by stepid, and the policy outs must provide
    # the latent entries for replay storage.
    config = make_config(tmp_path, 48, '1,1,1', 4, '--jax.latent_slots', '0')
    agent = dv3_main.make_agent(config)
    ext = agent.ext_space
    assert 'stepid' in ext and 'consec' in ext
    assert 'dyn/deter' in ext and 'dyn/stoch' in ext

    B = config.batch_size
    L = config.batch_length + config.replay_context
    data = agent._example_batch(B, L)
    data['is_first'][:, 0] = True
    carry = agent.init_train(B)
    carry, outs, mets = agent.train(carry, data)
    assert 'replay' in outs
    upd = outs['replay']
    assert upd['stepid'].shape == (B, config.batch_length, 20)
    assert upd['dyn/deter'].shape[:2] == (B, config.batch_length)
    assert np.isfinite(upd['dyn/deter']).all()
    assert np.isfinite(float(mets['opt/loss']))

  def test_policy_emits_latents(self, tmp_path):
    config = make_config(tmp_path, 48, '1,1,1', 4, '--jax.latent_slots', '0')
    agent = dv3_main.make_agent(config)
    obs = agent._example_obs(3)
    obs['is_first'][:] = True
    carry = agent.init_policy(3)
    carry, act, out = agent.policy(carry, obs)
    assert 'action' in act
    assert 'dyn/deter' in out and 'dyn/stoch' in out
    assert out['dyn/deter'].shape[0] == 3

  def test_report_videos(self, tmp_path):
    config = make_config(tmp_path)
    agent = dv3_main.make_agent(config)
    B = config.batch_size
    L = config.batch_length + config.replay_context
    data = agent._example_batch(B, L)
    data['is_first'][:, 0] = True
    carry = agent.init_report(B)
    carry, mets = agent.report(carry, data)
    videos = [k for k in mets if k.startswith('openloop/')]
    assert videos, sorted(mets.keys())
    grid = mets[videos[0]]
    assert grid.ndim == 4 and grid.dtype == np.uint8


class TestPolicyTrainSplit:

  def test_policy_mesh_split(self, tmp_path):
    path = os.path.join(os.path.dirname(dv3_main.__file__), 'configs.yaml')
    config = common.assemble_config(path, [
        '--configs', 'debug',
        '--task', 'dummy_disc',
        '--logdir', str(tmp_path),
        '--batch_size', '4',
        '--batch_length', '8',
        '--jax.platform', '',
        '--jax.mesh', '2,1,1',
        '--jax.policy_mesh', '1,1,1',
    ])
    agent = dv3_main.make_agent(config)
    obs = agent._example_obs(3)
    obs['is_first'][:] = True
    carry = agent.init_policy(3)
    carry, act, out = agent.policy(carry, obs)
    assert 'action' in act
    # Train updates mark the policy cache dirty; next policy call refreshes.
    data = agent._example_batch(4, 8 + config.replay_context)
    data['is_first'][:, 0] = True
    tcarry = agent.init_train(4)
    tcarry, outs, mets = agent.train(tcarry, data)
    assert agent._policy_dirty
    carry, act, out = agent.policy(carry, obs)
    assert not agent._policy_dirty


class TestLatentPacking:

  def test_entry_pack_roundtrip(self, tmp_path):
    # Packed latents (int8 deter, uint8 stoch indices) must survive the
    # storage roundtrip with quantization error below bf16 resolution.
    import jax
    import jax.numpy as jnp
    config = make_config(tmp_path)
    agent = dv3_main.make_agent(config)
    dyn = agent.model.dyn
    space = dyn.entry_space
    assert space['deter'].dtype == np.int8
    assert space['stoch'].dtype == np.uint8
    rng = np.random.default_rng(0)
    B, T = 4, 6
    deter = jnp.asarray(np.tanh(
        rng.normal(size=(B, T, dyn.deter))).astype(np.float32))
    idx = rng.integers(0, dyn.classes, (B, T, dyn.stoch))
    stoch = jnp.asarray(
        np.eye(dyn.classes, dtype=np.float32)[idx])
    packed = dyn.entry_pack(dict(deter=deter, stoch=stoch))
    assert packed['deter'].dtype == jnp.int8
    assert packed['stoch'].dtype == jnp.uint8
    un = dyn.entry_unpack(packed)
    err = np.abs(np.asarray(un['deter'], np.float32) - np.asarray(deter))
    assert err.max() <= 1 / 127 + 1e-6, err.max()
    assert np.array_equal(
        np.argmax(np.asarray(un['stoch']), -1), idx)


class TestReportGradnorms:

  def test_gradnorm_metrics(self, tmp_path):
    config = make_config(tmp_path)
    config = config.update({'agent.report_gradnorms': True})
    agent = dv3_main.make_agent(config)
    B = config.batch_size
    L = config.batch_length + config.replay_context
    data = agent._example_batch(B, L)
    data['is_first'][:, 0] = True
    carry = agent.init_report(B)
    carry, mets = agent.report(carry, data)
    norms = {k: v for k, v in mets.items() if k.startswith('gradnorm/')}
    assert 'gradnorm/dyn' in norms and 'gradnorm/policy' in norms
    assert all(np.isfinite(v) for v in norms.values()), norms
