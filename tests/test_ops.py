"""Pallas kernel correctness tests (interpret mode on CPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embodied_tpu.ops import blockgru


def make_params(key, D=64, H=24, S=16, g=4, dtype=jnp.float32):
  ks = jax.random.split(key, 6)
  dg = D // g
  init = lambda k, shape: 0.1 * jax.random.normal(k, shape, dtype)
  return (
      init(ks[0], (D, H)), 0.01 * jnp.ones((H,), dtype),
      jnp.ones((H,), jnp.float32),
      init(ks[1], (S, H)), 0.01 * jnp.ones((H,), dtype),
      jnp.ones((H,), jnp.float32),
      init(ks[2], (g, dg, dg)), 0.01 * jnp.ones((D,), dtype),
      init(ks[3], (3 * H, D)),
      jnp.ones((D,), jnp.float32),
      init(ks[4], (g, dg, 3 * dg)), 0.01 * jnp.ones((3 * D,), dtype),
  )


def make_inputs(D=64, H=24, S=16, B=8, dtype=jnp.float32):
  deter = jax.random.normal(jax.random.PRNGKey(1), (B, D), dtype)
  stoch = jax.random.normal(jax.random.PRNGKey(2), (B, S), dtype)
  act = jax.random.normal(jax.random.PRNGKey(3), (B, H), dtype)
  return deter, stoch, act


class TestBlockGRU:

  def test_kernel_matches_reference(self):
    params = make_params(jax.random.PRNGKey(0))
    deter, stoch, act = make_inputs()
    want = blockgru.reference_step(deter, stoch, act, params)
    got = blockgru.fused_core_step(deter, stoch, act, params,
                                   interpret=True)
    np.testing.assert_allclose(
        np.asarray(want, np.float32), np.asarray(got, np.float32),
        rtol=2e-3, atol=2e-3)

  def test_custom_vjp_matches_autodiff(self):
    params = make_params(jax.random.PRNGKey(0))
    deter, stoch, act = make_inputs()

    def loss_ref(params, deter):
      out = blockgru.reference_step(deter, stoch, act, params)
      return jnp.square(out).sum()

    def loss_wrapped(params, deter):
      out = blockgru.core_step(deter, stoch, act, params, False)
      return jnp.square(out).sum()

    g1 = jax.grad(loss_ref, argnums=(0, 1))(params, deter)
    g2 = jax.grad(loss_wrapped, argnums=(0, 1))(params, deter)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)

  @pytest.mark.parametrize('B', [8, 24, 192, 256])
  def test_fused_bwd_matches_autodiff(self, B):
    # The analytic Pallas backward must produce the same input and weight
    # gradients as differentiating the XLA reference (f32: tight match;
    # the bf16 paths differ only by matmul rounding, covered on TPU).
    # B=192/256 map to multiple grid chunks, covering the scratch
    # zero-init / accumulate / flush logic of the weight-grad accumulation
    # that the imagination path (B*K > 128) exercises in production.
    params = make_params(jax.random.PRNGKey(0))
    deter, stoch, act = make_inputs(B=B)
    dout = jax.random.normal(jax.random.PRNGKey(4), deter.shape,
                             deter.dtype)
    _, vjp = jax.vjp(blockgru.reference_step, deter, stoch, act, params)
    want = vjp(dout)
    got = blockgru.fused_core_bwd(deter, stoch, act, params, dout,
                                  interpret=True)
    flat_want = list(want[:3]) + list(want[3])
    flat_got = list(got[:3]) + list(got[3])
    names = ['ddeter', 'dstoch', 'dact'] + ['d' + f for f in blockgru.FIELDS]
    for name, a, b in zip(names, flat_want, flat_got):
      assert a.shape == b.shape and a.dtype == b.dtype, name
      np.testing.assert_allclose(
          np.asarray(a, np.float32), np.asarray(b, np.float32),
          rtol=1e-4, atol=1e-5, err_msg=name)

  def test_reference_matches_model_core(self):
    # The kernel's reference math must track rssm.RSSM._core exactly.
    from embodied_tpu.models.dreamerv3 import rssm
    from embodied_tpu.nn.core import Ctx
    from embodied_tpu.utils import Space
    act_space = {'action': Space(np.int32, (), 0, 5)}
    dyn = rssm.RSSM(
        act_space, 'dyn', deter=64, hidden=24, stoch=4, classes=4,
        act='silu', norm='rms', blocks=4, kernel='off')
    B = 8
    key = jax.random.PRNGKey(0)
    ctx = Ctx({}, create=True, key=key)
    carry = dyn.initial(B)
    tokens = jax.random.normal(jax.random.PRNGKey(1), (B, 16))
    action = {'action': jnp.zeros((B,), np.int32)}
    reset = jnp.zeros((B,), bool)
    dyn.observe(ctx, carry, tokens, action, reset, training=True,
                single=True)
    store = {**ctx.store, **ctx.updates}

    actx = Ctx(store, create=False, key=key, meta=ctx.meta)
    p = dyn.sub(actx)
    deter = jax.random.normal(jax.random.PRNGKey(2), (B, 64))
    stoch = jax.random.normal(jax.random.PRNGKey(3), (B, 4, 4))
    actfeat = jax.random.normal(jax.random.PRNGKey(4), (B, 24))
    from embodied_tpu import nn
    want = dyn._core(p, nn.cast(deter), nn.cast(stoch), nn.cast(actfeat))
    params = dyn._core_params(p)
    got = blockgru.reference_step(
        nn.cast(deter), nn.cast(stoch.reshape(B, -1)), nn.cast(actfeat),
        params)
    np.testing.assert_allclose(
        np.asarray(want, np.float32), np.asarray(got, np.float32),
        rtol=2e-2, atol=2e-2)

  def test_supported_vmem_budget(self):
    params = make_params(jax.random.PRNGKey(0))
    assert blockgru.supported(params)
    big = make_params(jax.random.PRNGKey(0), D=4096, H=1024, S=512, g=8)
    assert not blockgru.supported(big, max_vmem_bytes=1 << 20)
