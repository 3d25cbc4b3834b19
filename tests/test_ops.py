"""Pallas kernel correctness tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embodied_tpu.ops import blockgru


def make_params(key, D=64, H=24, S=16, g=4, dtype=jnp.float32):
  ks = jax.random.split(key, 7)
  dg = D // g
  din = dg + 3 * H
  init = lambda k, shape: 0.1 * jax.random.normal(k, shape, dtype)
  return (
      init(ks[0], (D, H)), jnp.ones((H,), dtype),
      init(ks[1], (S, H)), jnp.ones((H,), dtype),
      init(ks[2], (g, din, dg)), jnp.ones((D,), dtype),
      init(ks[3], (dg, dg * 3)) * jnp.ones((g, 1, 1), dtype),
  )


class TestBlockGRU:

  @pytest.mark.parametrize('dtype', [jnp.float32])
  def test_kernel_matches_reference(self, dtype):
    key = jax.random.PRNGKey(0)
    B, D, H, S, g = 8, 64, 24, 16, 4
    params = make_params(key, D, H, S, g, dtype)
    deter = jax.random.normal(jax.random.PRNGKey(1), (B, D), dtype)
    stoch = jax.random.normal(jax.random.PRNGKey(2), (B, S), dtype)
    act = jax.random.normal(jax.random.PRNGKey(3), (B, H), dtype)
    want = blockgru.reference_step(deter, stoch, act, params)
    got = blockgru.fused_core_step(deter, stoch, act, params,
                                   interpret=True)
    np.testing.assert_allclose(
        np.asarray(want, np.float32), np.asarray(got, np.float32),
        rtol=2e-3, atol=2e-3)

  def test_supported_vmem_budget(self):
    params = make_params(jax.random.PRNGKey(0))
    assert blockgru.supported(params)
    big = make_params(jax.random.PRNGKey(0), D=4096, H=1024, S=512, g=8)
    assert not blockgru.supported(big, max_vmem_bytes=1 << 20)
