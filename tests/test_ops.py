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

  @pytest.mark.parametrize('B', [8, 192])
  def test_kernel_matches_reference(self, B):
    # B=192 maps to multiple grid chunks, covering the batch-chunked
    # forward blocking (large-B launches would otherwise OOM scoped VMEM
    # on real hardware).
    params = make_params(jax.random.PRNGKey(0))
    deter, stoch, act = make_inputs(B=B)
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


from embodied_tpu.ops import observe


def make_obs_params(key, D=64, H=24, S=16, g=4, K=32, L=48,
                    dtype=jnp.float32):
  core = make_params(key, D, H, S, g, dtype)
  ks = jax.random.split(jax.random.fold_in(key, 99), 2)
  init = lambda k, shape: 0.1 * jax.random.normal(k, shape, dtype)
  return core + (
      init(ks[0], (D + K, H)), 0.01 * jnp.ones((H,), dtype),
      jnp.ones((H,), jnp.float32),
      init(ks[1], (H, L)), 0.01 * jnp.ones((L,), dtype),
  )


def make_obs_inputs(D=64, H=24, S=16, B=8, K=32, dtype=jnp.float32):
  deter, stoch, act = make_inputs(D, H, S, B, dtype)
  tokens = jax.random.normal(jax.random.PRNGKey(7), (B, K), dtype)
  return deter, stoch, act, tokens


class TestObserveKernel:

  @pytest.mark.parametrize('B', [8, 192])
  def test_forward_matches_reference(self, B):
    # B=192 covers the batch-chunked grid of the fused forward.
    params = make_obs_params(jax.random.PRNGKey(0))
    deter, stoch, act, tokens = make_obs_inputs(B=B)
    want = observe.reference_obs_step(deter, stoch, act, tokens, params)
    got = observe.fused_obs_step(deter, stoch, act, tokens, params,
                                 interpret=True)
    for name, a, b in zip(('deter', 'logit'), want, got):
      np.testing.assert_allclose(
          np.asarray(a, np.float32), np.asarray(b, np.float32),
          rtol=2e-3, atol=2e-3, err_msg=name)

  def test_reference_head_matches_composition(self):
    # The obs head applied to blockgru's reference output must equal
    # reference_obs_step (guards against layout drift between the files).
    params = make_obs_params(jax.random.PRNGKey(0))
    deter, stoch, act, tokens = make_obs_inputs()
    D = deter.shape[1]
    core = blockgru.reference_step(
        deter, stoch, act, params[:len(blockgru.FIELDS)])
    wo, bo, so, wl, bl = params[len(blockgru.FIELDS):]
    x = core @ wo[:D] + tokens @ wo[D:] + bo
    rstd = jax.lax.rsqrt(jnp.square(x).mean(-1, keepdims=True) + 1e-4)
    x = x * rstd * so
    x = x * jax.nn.sigmoid(x)
    logit = x @ wl + bl
    out, got_logit = observe.reference_obs_step(
        deter, stoch, act, tokens, params)
    np.testing.assert_allclose(np.asarray(core), np.asarray(out),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(logit), np.asarray(got_logit),
                               rtol=1e-5, atol=1e-5)

  @pytest.mark.parametrize('B', [8, 192])
  def test_fused_bwd_matches_autodiff(self, B):
    params = make_obs_params(jax.random.PRNGKey(0))
    deter, stoch, act, tokens = make_obs_inputs(B=B)
    dout = jax.random.normal(jax.random.PRNGKey(4), deter.shape,
                             deter.dtype)
    L = params[-1].shape[0]
    dlogit = jax.random.normal(jax.random.PRNGKey(5), (B, L), deter.dtype)
    _, vjp = jax.vjp(
        observe.reference_obs_step, deter, stoch, act, tokens, params)
    want = vjp((dout, dlogit))
    got = observe.fused_obs_bwd(
        deter, stoch, act, tokens, params, dout, dlogit, interpret=True)
    flat_want = list(want[:4]) + list(want[4])
    flat_got = list(got[:4]) + list(got[4])
    names = ['ddeter', 'dstoch', 'dact', 'dtok'] + [
        'd' + f for f in observe.FIELDS]
    for name, a, b in zip(names, flat_want, flat_got):
      assert a.shape == b.shape and a.dtype == b.dtype, name
      np.testing.assert_allclose(
          np.asarray(a, np.float32), np.asarray(b, np.float32),
          rtol=1e-4, atol=1e-5, err_msg=name)

  def test_custom_vjp_wrapper(self):
    params = make_obs_params(jax.random.PRNGKey(0))
    deter, stoch, act, tokens = make_obs_inputs()

    def loss_ref(deter):
      out, logit = observe.reference_obs_step(
          deter, stoch, act, tokens, params)
      return jnp.square(out).sum() + jnp.square(logit).sum()

    def loss_wrapped(deter):
      out, logit = observe.obs_step(
          deter, stoch, act, tokens, params, False)
      return jnp.square(out).sum() + jnp.square(logit).sum()

    g1 = jax.grad(loss_ref)(deter)
    g2 = jax.grad(loss_wrapped)(deter)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-6)


class TestObserveRSSMWiring:

  def test_obs_params_match_nn_path(self):
    # The reference_obs_step applied to the rssm's _obs_params must agree
    # with the module's own XLA observe path (guards the param plumbing
    # that the fused TPU kernel consumes).
    from embodied_tpu import nn
    from embodied_tpu.models.dreamerv3 import rssm as rssmlib
    from embodied_tpu.utils import Space as USpace

    act_space = {'action': USpace(np.int32, (), 0, 5)}
    mod = rssmlib.RSSM(
        act_space, 'dyn', deter=64, hidden=24, stoch=4, classes=8,
        norm='rms', act='silu', blocks=4, latents='i8', kernel='auto')
    B, K = 6, 16
    tokens = jax.random.normal(jax.random.PRNGKey(1), (B, K), jnp.float32)
    action = {'action': jnp.zeros((B,), jnp.int32)}
    reset = jnp.zeros((B,), bool)
    carry = mod.initial(B)

    def fn(ctx, carry, tokens, action, reset):
      c2, entry, feat = mod.observe(
          ctx, carry, tokens, action, reset, training=False, single=True)
      p = mod.sub(ctx)
      params = mod._obs_params(p, K)
      actfeat = mod._action_feat(p, action, ~reset)
      stoch_flat = carry['stoch'].reshape((B, -1))
      want_deter, want_logit = None, None
      return feat, params, actfeat

    store, _ = nn.init(fn)(jax.random.PRNGKey(0), carry, tokens, action,
                           reset)
    _, (feat, params, actfeat) = nn.pure(fn)(
        store, jax.random.PRNGKey(0), carry, tokens, action, reset)
    from embodied_tpu.ops import observe
    deter0 = nn.cast(carry['deter'])
    stoch0 = nn.cast(carry['stoch'].reshape((B, -1)))
    ref_deter, ref_logit = observe.reference_obs_step(
        deter0, stoch0, nn.cast(actfeat), nn.cast(tokens),
        jax.tree.map(jnp.asarray, params))
    np.testing.assert_allclose(
        np.asarray(feat['deter'], np.float32),
        np.asarray(ref_deter, np.float32), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(feat['logit'], np.float32).reshape(B, -1),
        np.asarray(ref_logit, np.float32), rtol=2e-2, atol=2e-2)
