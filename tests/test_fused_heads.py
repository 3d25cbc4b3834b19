"""The fused imagination-head trunk must match the per-module path.

model._fused_imag_heads computes the five AC heads with their first
layers fused into one matmul on concatenated kernels; the outputs must
equal the plain per-module calls on the same store (the fusion is a
pure reassociation of independent weight columns).
"""

import numpy as np
import pytest


@pytest.fixture(scope='module')
def agent_and_model():
  import bench
  agent, model, config = bench.build_agent(quick=True)
  return agent, model


@pytest.fixture()
def _allow_transfers():
  import jax
  with jax.transfer_guard('allow'):
    yield


def test_fused_heads_match_modules(agent_and_model, _allow_transfers):
  import jax
  import jax.numpy as jnp
  from embodied_tpu.nn.core import Ctx
  agent, model = agent_and_model
  rng = np.random.default_rng(0)
  dyn = model.dyn
  indim = dyn.deter + dyn.stoch * dyn.classes
  inp = jnp.asarray(rng.standard_normal((4, 6, indim)), jnp.float32)
  key = jax.random.PRNGKey(0)

  def run(store):
    ctx = Ctx(dict(store), create=False, key=key, meta=agent.meta)
    fused = model._fused_imag_heads(ctx, inp)
    assert fused is not None
    plain = dict(
        rew=model.rew(ctx, inp, 2), con=model.con(ctx, inp, 2),
        pol=model.pol(ctx, inp, 2), val=model.val(ctx, inp, 2),
        slowval=model.slowval(ctx, inp, 2))
    outs = {}
    for name in ('rew', 'con', 'val', 'slowval'):
      outs[f'{name}/fused'] = fused[name].pred()
      outs[f'{name}/plain'] = plain[name].pred()
    for k, d in fused['pol'].items():
      outs[f'pol_{k}/fused'] = d.pred()
      outs[f'pol_{k}/plain'] = plain['pol'][k].pred()
    return outs

  outs = jax.jit(run)(dict(agent.store))
  names = sorted({k.split('/')[0] for k in outs})
  for name in names:
    a = np.asarray(outs[f'{name}/fused'], np.float32)
    b = np.asarray(outs[f'{name}/plain'], np.float32)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4, err_msg=name)


def test_fused_heads_none_during_create(agent_and_model):
  import jax
  import jax.numpy as jnp
  from embodied_tpu.nn.core import Ctx
  agent, model = agent_and_model
  ctx = Ctx(dict(agent.store), create=True, key=jax.random.PRNGKey(0),
            meta=agent.meta)
  inp = jnp.zeros((2, 3, model.dyn.deter + model.dyn.stoch *
                   model.dyn.classes), jnp.float32)
  assert model._fused_imag_heads(ctx, inp) is None
