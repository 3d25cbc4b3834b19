"""Device-resident replay-latent table (embodied_tpu/parallel/latents.py).

Covers the slot allocator, the in-graph gather/scatter semantics, the
policy -> replay -> train slot round trip, generation-tag invalidation
(carry reset fallback), and an e2e train-protocol run in table mode.
"""

import os

import numpy as np
import pytest

from embodied_tpu.models import common
from embodied_tpu.models.dreamerv3 import main as dv3_main
from embodied_tpu.parallel.latents import GEN_INVALID, LatentTable


def make_config(tmp_path, *extra, steps=48):
  path = os.path.join(os.path.dirname(dv3_main.__file__), 'configs.yaml')
  return common.assemble_config(path, [
      '--configs', 'debug',
      '--task', 'dummy_disc',
      '--logdir', str(tmp_path),
      '--batch_size', '4',
      '--batch_length', '8',
      '--report_length', '8',
      '--run.steps', str(steps),
      '--run.train_ratio', '4',
      '--run.log_every', '0.2',
      '--run.report_every', '1.0',
      '--run.save_every', '0.5',
      '--jax.platform', '',
      '--jax.mesh', '1,1,1',
      *extra,
  ])


class TestAllocator:

  def test_slots_wrap_and_generations_advance(self):
    import jax
    from embodied_tpu.parallel import meshes
    from embodied_tpu.utils import Space
    mesh = meshes.make_mesh('1,1,1', devices=jax.devices('cpu')[:1])
    spaces = {'dyn/deter': Space(np.int8, 16)}
    table = LatentTable(spaces, 8, mesh)
    s1, g1 = table.alloc(6)
    s2, g2 = table.alloc(6)
    assert s1.dtype == np.int32 and g1.dtype == np.uint32
    np.testing.assert_array_equal(s1, np.arange(6))
    np.testing.assert_array_equal(s2, [6, 7, 0, 1, 2, 3])
    np.testing.assert_array_equal(g1, [0] * 6)
    np.testing.assert_array_equal(g2, [0, 0, 1, 1, 1, 1])
    # Multi-host allocators own disjoint ranges.
    t0 = LatentTable(spaces, 8, mesh, nprocs=2, proc=0)
    t1 = LatentTable(spaces, 8, mesh, nprocs=2, proc=1)
    a, _ = t0.alloc(4)
    b, _ = t1.alloc(4)
    assert set(a.tolist()).isdisjoint(b.tolist())

  def test_eval_region_is_disjoint(self):
    import jax
    from embodied_tpu.parallel import meshes
    from embodied_tpu.utils import Space
    mesh = meshes.make_mesh('1,1,1', devices=jax.devices('cpu')[:1])
    spaces = {'dyn/deter': Space(np.int8, 16)}
    table = LatentTable(spaces, 16, mesh, eval_slots=4)
    # Wrapping eval traffic never touches the train region.
    tr, _ = table.alloc(16, 'train')
    ev, _ = table.alloc(40, 'eval')
    assert set(tr.tolist()).isdisjoint(ev.tolist())
    assert table.counters['train'] == 16 and table.counters['eval'] == 40
    # Unknown regions fall back to train allocations.
    extra, _ = table.alloc(2, 'report')
    assert set(extra.tolist()) <= set(tr.tolist())

  def test_bump_generations(self):
    import jax
    from embodied_tpu.parallel import meshes
    from embodied_tpu.utils import Space
    mesh = meshes.make_mesh('1,1,1', devices=jax.devices('cpu')[:1])
    spaces = {'dyn/deter': Space(np.int8, 16)}
    table = LatentTable(spaces, 8, mesh)
    s1, g1 = table.alloc(4)
    table2 = LatentTable(spaces, 8, mesh)
    table2.bump_generations()  # Simulates load() of a pre-table ckpt.
    s2, g2 = table2.alloc(4)
    # Identical slots but strictly newer generations: the restored replay's
    # (slot, gen) pairs can never validate against fresh allocations.
    np.testing.assert_array_equal(s1, s2)
    assert (g2 > g1).all()

  def test_save_load_counter(self):
    import jax
    from embodied_tpu.parallel import meshes
    from embodied_tpu.utils import Space
    mesh = meshes.make_mesh('1,1,1', devices=jax.devices('cpu')[:1])
    table = LatentTable({'x': Space(np.int8, 4)}, 16, mesh)
    table.alloc(10)
    state = table.save()
    table2 = LatentTable({'x': Space(np.int8, 4)}, 16, mesh)
    table2.load(state)
    assert table2.counter == 10



@pytest.fixture(scope='module')
def shared(tmp_path_factory):
  """One compiled default-config table-mode agent for the whole module:
  agent construction dominates this file's runtime (one jit set per
  agent), and every test that needs default config can start from a
  reset table instead of a fresh compile."""
  config = make_config(tmp_path_factory.mktemp('latents_shared'))
  return dv3_main.make_agent(config), config


@pytest.fixture
def agent_config(shared):
  agent, config = shared
  agent._latents.reset()
  # Flush the depth-k async metric pipeline so each test's first train
  # call returns its own metrics (warmup semantics, as on a fresh agent).
  agent._pending_train.clear()
  agent._fetched_train = None
  return agent, config


class TestAgentIntegration:

  def test_ext_space_replaces_latents_with_slots(self, agent_config):
    agent, config = agent_config
    assert agent._latents is not None
    ext = agent.ext_space
    assert 'slot' in ext and 'slotgen' in ext
    assert 'dyn/deter' not in ext and 'dyn/stoch' not in ext
    # The model-native space still carries the latent columns.
    assert 'dyn/deter' in agent.model.ext_space

  def test_policy_scatters_and_returns_slots(self, agent_config):
    import jax
    agent, config = agent_config
    obs = agent._example_obs(3)
    obs['is_first'][:] = True
    carry = agent.init_policy(3)
    carry, act, out = agent.policy(carry, obs)
    assert 'slot' in out and 'slotgen' in out
    assert 'dyn/deter' not in out
    np.testing.assert_array_equal(out['slot'], [0, 1, 2])
    gen = np.asarray(jax.device_get(agent._latents.tables['_gen']))
    np.testing.assert_array_equal(gen[:3], [0, 0, 0])
    assert (gen[3:] == GEN_INVALID).all()

  def test_train_grafts_valid_context_and_refreshes(self, agent_config):
    import jax
    agent, config = agent_config
    B = config.batch_size
    T = config.batch_length + config.replay_context
    # Fill the first B*T slots with policy latents so the training batch
    # references valid table entries.
    obs = agent._example_obs(B * T)
    obs['is_first'][:] = True
    pcarry = agent.init_policy(B * T)
    pcarry, act, out = agent.policy(pcarry, obs)
    data = agent._example_batch(B, T)
    data['is_first'][:, 0] = True
    data['slot'] = out['slot'].reshape(B, T).astype(np.int32)
    data['slotgen'] = out['slotgen'].reshape(B, T)
    carry = agent.init_train(B)
    carry, outs, mets = agent.train(carry, data)
    # Latents stay device-resident: no replay payload comes back.
    assert 'replay' not in outs
    assert float(mets['latents/valid']) == 1.0
    assert np.isfinite(float(mets['opt/loss']))
    # The train step refreshed the trained slots in place.
    gen = np.asarray(jax.device_get(agent._latents.tables['_gen']))
    assert (gen[:B * T] != GEN_INVALID).all()

  def test_invalid_generation_falls_back_to_reset(self, agent_config):
    agent, config = agent_config
    B = config.batch_size
    T = config.batch_length + config.replay_context
    data = agent._example_batch(B, T)
    # consec==0 marks window starts; the table is empty, so every context
    # latent is invalid and the carry must reset instead of grafting junk.
    data['consec'][:] = 0
    carry = agent.init_train(B)
    carry, outs, mets = agent.train(carry, data)
    assert float(mets['latents/valid']) == 0.0
    assert np.isfinite(float(mets['opt/loss']))

  def test_latents_in_replay_fallback(self, tmp_path):
    # With jax.latents_in_replay, the packed latent columns ride replay
    # alongside the slot ids. After an agent restart (fresh table, all
    # generations invalid) the train step grafts the BATCH-provided
    # latents instead of resetting the carry: reference-exact resume.
    import jax
    cfg = make_config(tmp_path, '--jax.latents_in_replay', 'True')
    agent = dv3_main.make_agent(cfg)
    ext = agent.ext_space
    assert 'slot' in ext and 'dyn/deter' in ext  # Both travel.
    B = cfg.batch_size
    T = cfg.batch_length + cfg.replay_context
    obs = agent._example_obs(B * T)
    obs['is_first'][:] = True
    pcarry = agent.init_policy(B * T)
    pcarry, act, out = agent.policy(pcarry, obs)
    assert 'dyn/deter' in out and 'slot' in out
    data = agent._example_batch(B, T)
    data['is_first'][:, 0] = True
    data['consec'][:] = 0
    data['slot'] = out['slot'].reshape(B, T).astype(np.int32)
    data['slotgen'] = out['slotgen'].reshape(B, T)
    for k in ('dyn/deter', 'dyn/stoch'):
      data[k] = np.asarray(jax.device_get(out[k])).reshape(
          (B, T) + np.asarray(out[k]).shape[1:])
    # Simulate an agent restart: new agent, empty table, same replay data.
    agent2 = dv3_main.make_agent(cfg)
    carry = agent2.init_train(B)
    carry, outs, mets = agent2.train(carry, data)
    # Table says invalid, but the batch carried the context.
    assert float(mets['latents/valid']) == 0.0
    assert np.isfinite(float(mets['opt/loss']))
    # Refreshed latents flow back for replay patching in this mode.
    assert 'replay' in outs

  def test_report_with_table(self, agent_config):
    agent, config = agent_config
    B = config.batch_size
    T = config.batch_length + config.replay_context
    data = agent._example_batch(B, T)
    data['is_first'][:, 0] = True
    carry = agent.init_report(B)
    carry, mets = agent.report(carry, data)
    assert any(k.startswith('openloop/') for k in mets)

  def test_checkpoint_persists_allocator(self, agent_config):
    agent, config = agent_config
    agent._latents.alloc(7)
    state = agent.save()
    # Restart sim: reset the allocator, then restore from the checkpoint.
    agent._latents.reset()
    agent.load(state)
    assert agent._latents.counter == 7

  def test_pretable_checkpoint_bumps_generation(self, agent_config):
    # A checkpoint saved without allocator state (pre-table version) must
    # not let fresh allocations mint (slot, gen) pairs that collide with
    # pairs potentially sitting in restored replay.
    agent, config = agent_config
    state = agent.save()
    del state['latents']
    agent._latents.reset()
    agent.load(state)
    _, gens = agent._latents.alloc(4)
    assert (gens >= 1).all()


@pytest.mark.slow
class TestEndToEnd:

  def test_train_protocol_with_table(self, tmp_path):
    # Full driver -> replay -> train loop in table mode, with resume.
    config = make_config(tmp_path, steps=48)
    common.run_script(config, dv3_main.make_agent)
    assert (tmp_path / 'checkpoint.pkl').exists()
    config = make_config(tmp_path, steps=96)
    common.run_script(config, dv3_main.make_agent)

  def test_table_and_host_paths_agree(self, tmp_path):
    # With identical data and an empty (all-invalid) table vs host-path
    # zero latents + first-step resets, both paths see reset carries and
    # must produce identical losses under the same seed.
    cfg_t = make_config(tmp_path / 'a')
    cfg_h = make_config(tmp_path / 'b', '--jax.latent_slots', '0')
    agent_t = dv3_main.make_agent(cfg_t)
    agent_h = dv3_main.make_agent(cfg_h)
    B = cfg_t.batch_size
    T = cfg_t.batch_length + cfg_t.replay_context
    data_t = agent_t._example_batch(B, T)
    data_t['is_first'][:, 0] = True
    data_t['consec'][:] = 0
    data_h = agent_h._example_batch(B, T)
    data_h['is_first'][:, 0] = True
    data_h['is_first'][:, cfg_h.replay_context] = True  # Mirror the reset.
    data_h['consec'][:] = 0
    carry_t = agent_t.init_train(B)
    carry_h = agent_h.init_train(B)
    _, _, mets_t = agent_t.train(carry_t, data_t)
    _, _, mets_h = agent_h.train(carry_h, data_h)
    np.testing.assert_allclose(
        float(mets_t['opt/loss']), float(mets_h['opt/loss']),
        rtol=1e-4, atol=1e-4)
