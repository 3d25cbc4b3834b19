"""Ring attention (sequence-parallel) vs dense attention on a CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from embodied_tpu.ops import ring_attention as ra


def make_mesh(n=4):
  return Mesh(np.array(jax.devices()[:n]), ('t',))


def make_qkv(B=2, T=32, H=2, D=16, dtype=jnp.float32, seed=0):
  ks = jax.random.split(jax.random.PRNGKey(seed), 3)
  q = jax.random.normal(ks[0], (B, T, H, D), dtype)
  k = jax.random.normal(ks[1], (B, T, H, D), dtype)
  v = jax.random.normal(ks[2], (B, T, H, D), dtype)
  return q, k, v


class TestRingAttention:

  @pytest.mark.parametrize(
      'causal',
      [pytest.param(False, marks=pytest.mark.slow), True])
  def test_matches_dense(self, causal):
    mesh = make_mesh(4)
    q, k, v = make_qkv()
    want = ra.full_attention(q, k, v, causal=causal)
    got = ra.ring_attention_sharded(q, k, v, mesh, 't', causal=causal)
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got), rtol=1e-5, atol=1e-5)

  @pytest.mark.slow
  def test_matches_dense_bf16(self):
    mesh = make_mesh(4)
    q, k, v = make_qkv(dtype=jnp.bfloat16)
    want = ra.full_attention(q, k, v, causal=True)
    got = ra.ring_attention_sharded(q, k, v, mesh, 't', causal=True)
    np.testing.assert_allclose(
        np.asarray(want, np.float32), np.asarray(got, np.float32),
        rtol=3e-2, atol=3e-2)

  def test_gradients_match(self):
    mesh = make_mesh(4)
    q, k, v = make_qkv(T=16)

    def loss_ring(q, k, v):
      out = ra.ring_attention_sharded(q, k, v, mesh, 't', causal=True)
      return jnp.square(out.astype(jnp.float32)).sum()

    def loss_full(q, k, v):
      out = ra.full_attention(q, k, v, causal=True)
      return jnp.square(out.astype(jnp.float32)).sum()

    g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

  @pytest.mark.slow
  def test_eight_way_ring(self):
    mesh = make_mesh(8)
    q, k, v = make_qkv(T=64)
    want = ra.full_attention(q, k, v, causal=True)
    got = ra.ring_attention_sharded(q, k, v, mesh, 't', causal=True)
    np.testing.assert_allclose(
        np.asarray(want), np.asarray(got), rtol=1e-5, atol=1e-5)


class TestRingAttentionLayer:

  def test_layer_matches_dense_layer(self):
    # The nn.Attention layer in ring mode, run under shard_map with the
    # time dim sharded, must match the dense layer on replicated data.
    from jax.sharding import PartitionSpec as P
    from embodied_tpu import nn
    from embodied_tpu.nn.core import Ctx
    mesh = make_mesh(4)
    B, T, U, H = 2, 32, 32, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, U))

    dense = nn.Attention(U, H, 'att', pos='rope', impl='dense')
    key = jax.random.PRNGKey(1)
    ctx = Ctx({}, create=True, key=key)
    causal_mask = jnp.tril(jnp.ones((T, T), bool))[None, None]
    dense(ctx, x, mask=causal_mask)
    store = dict(ctx.store)
    actx = Ctx(store, create=False, key=key, meta=ctx.meta)
    want = dense(actx, x, mask=causal_mask)

    ring = nn.Attention(U, H, 'att', pos='rope', impl='ring', causal=True)

    def fn(x):
      ictx = Ctx(store, create=False, key=key, meta=ctx.meta)
      return ring(ictx, x)

    got = jax.shard_map(
        fn, mesh=mesh, in_specs=P(None, 't'), out_specs=P(None, 't'),
        check_vma=False)(x)
    # The layer computes in bf16; block-wise accumulation reorders sums,
    # so agreement is at bf16 resolution.
    np.testing.assert_allclose(
        np.asarray(want, np.float32), np.asarray(got, np.float32),
        rtol=5e-2, atol=2e-2)

  @pytest.mark.slow
  def test_transformer_ring_matches_dense(self):
    # A full Transformer stack in ring mode (impl flows through to the
    # attention layers only) must match the dense stack on sharded time.
    from jax.sharding import PartitionSpec as P
    from embodied_tpu import nn
    from embodied_tpu.nn.core import Ctx
    mesh = make_mesh(4)
    B, T, U, H = 2, 32, 32, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, U))
    key = jax.random.PRNGKey(1)

    dense = nn.Transformer(2, U, H, 'tf', pos='rope', impl='dense')
    ctx = Ctx({}, create=True, key=key)
    causal_mask = jnp.tril(jnp.ones((T, T), bool))[None, None]
    dense(ctx, x, mask=causal_mask)
    store = dict(ctx.store)
    actx = Ctx(store, create=False, key=key, meta=ctx.meta)
    want = dense(actx, x, mask=causal_mask)

    ring = nn.Transformer(2, U, H, 'tf', pos='rope', impl='ring',
                          causal=True)

    def fn(x):
      ictx = Ctx(store, create=False, key=key, meta=ctx.meta)
      return ring(ictx, x)

    got = jax.shard_map(
        fn, mesh=mesh, in_specs=P(None, 't'), out_specs=P(None, 't'),
        check_vma=False)(x)
    # Two residual blocks compound bf16 rounding; slightly wider bars
    # than the single-layer test.
    np.testing.assert_allclose(
        np.asarray(want, np.float32), np.asarray(got, np.float32),
        rtol=5e-2, atol=8e-2)
