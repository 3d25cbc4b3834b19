"""shard_map explicit-collective train mode on a multi-device CPU mesh.

Parity: /root/reference/embodied/jax/transform.py:84-111 (use_shardmap) —
data split over the mesh, per-device RNG folding, explicit gradient pmean
in the optimizer, replicated parameters and scalar metrics.
"""

import os

import numpy as np

from embodied_tpu.models import common
from embodied_tpu.models.dreamerv3 import main as dv3_main

import pytest

pytestmark = pytest.mark.slow


def make_agent(tmp_path, shardmap, mesh='4,2,1', batch=8):
  path = os.path.join(os.path.dirname(dv3_main.__file__), 'configs.yaml')
  config = common.assemble_config(path, [
      '--configs', 'debug',
      '--task', 'dummy_disc',
      '--logdir', str(tmp_path),
      '--batch_size', str(batch),
      '--batch_length', '8',
      '--jax.platform', '',
      '--jax.mesh', mesh,
      '--jax.shardmap', str(shardmap),
  ])
  return dv3_main.make_agent(config), config


class TestShardMapTrain:

  def test_train_steps_and_metrics(self, tmp_path):
    agent, config = make_agent(tmp_path, shardmap=True)
    assert agent.use_shardmap
    B = config.batch_size
    L = config.batch_length + config.replay_context
    data = agent._example_batch(B, L)
    data['is_first'][:, 0] = True
    data['image'][:] = 128
    carry = agent.init_train(B)
    before = {
        k: np.asarray(v) for k, v in agent.store.items()
        if agent.meta.get(k) == 'param'}
    mets = {}
    for _ in range(3):  # Metrics arrive with one step of delay.
      carry, outs, mets = agent.train(carry, dict(data))
    assert np.isfinite(float(mets['opt/loss']))
    assert np.isfinite(float(mets['opt/grad_norm']))
    assert 'replay' in outs
    assert outs['replay']['dyn/deter'].shape[:2] == (B, config.batch_length)
    changed = sum(
        not np.allclose(np.asarray(agent.store[k]), before[k])
        for k in before)
    assert changed > len(before) // 2, (changed, len(before))

  def test_store_replicated(self, tmp_path):
    agent, config = make_agent(tmp_path, shardmap=True)
    from jax.sharding import PartitionSpec as P
    for key, sharding in agent.shardings.items():
      assert sharding.spec == P(), (key, sharding.spec)

  def test_policy_still_works(self, tmp_path):
    agent, config = make_agent(tmp_path, shardmap=True)
    obs = agent._example_obs(4)
    obs['is_first'][:] = True
    carry = agent.init_policy(4)
    carry, act, out = agent.policy(carry, obs)
    assert 'action' in act

  def test_matches_gspmd_loss_scale(self, tmp_path):
    # Same zero-data batch: both modes should produce losses in the same
    # ballpark on the first step (different RNG folding, so not identical).
    agent_sm, config = make_agent(tmp_path / 'sm', shardmap=True)
    agent_gs, _ = make_agent(tmp_path / 'gs', shardmap=False)
    B = config.batch_size
    L = config.batch_length + config.replay_context
    data = agent_sm._example_batch(B, L)
    data['is_first'][:, 0] = True
    losses = {}
    for name, agent in (('sm', agent_sm), ('gs', agent_gs)):
      carry = agent.init_train(B)
      for _ in range(2):
        carry, outs, mets = agent.train(carry, dict(data))
      losses[name] = float(mets['opt/loss'])
    assert np.isfinite(losses['sm']) and np.isfinite(losses['gs'])
    ratio = losses['sm'] / losses['gs']
    assert 0.5 < ratio < 2.0, losses
