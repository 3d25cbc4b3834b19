"""Grid-over-time observe kernel (ops/observe_seq.py) numerics.

Interpret-mode validation on CPU: the deterministic tensors are checked
step-by-step against the XLA reference replaying the kernel's own
samples, the analytic backward against autodiff of that replayed
reference, and the sampling distribution statistically.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embodied_tpu.ops import observe_seq as seqlib

f32 = jnp.float32

T, B, D, G, H, S, C, A, K = 5, 4, 64, 2, 32, 4, 8, 32, 24
L = S * C


def make_params(seed=0):
  rng = np.random.default_rng(seed)
  dg = D // G
  shapes = dict(
      w0=(D, H), b0=(H,), s0=(H,), w1=(L, H), b1=(H,), s1=(H,),
      wblk=(G, dg, dg), bblk=(D,), win=(3 * H, D), sh=(D,),
      wg=(G, dg, 3 * dg), bg=(3 * D,),
      wo=(D + K, H), bo=(H,), so=(H,), wl=(H, L), bl=(L,))
  out = []
  for name in seqlib.FIELDS:
    scale = 1.0 if name in ('s0', 's1', 'sh', 'so') else 0.3
    base = 1.0 if name in ('s0', 's1', 'sh', 'so') else 0.0
    out.append(jnp.asarray(
        base + scale * rng.standard_normal(shapes[name]), f32))
  return tuple(out)


def make_inputs(seed=1):
  rng = np.random.default_rng(seed)
  deter0 = jnp.asarray(rng.standard_normal((B, D)), f32)
  stoch0 = jnp.asarray(
      np.eye(C)[rng.integers(0, C, (B, S))].reshape(B, L), f32)
  act = jnp.asarray(rng.standard_normal((T, B, A)), f32)
  tok = jnp.asarray(rng.standard_normal((T, B, K)), f32)
  keep = np.ones((T, B), np.float32)
  keep[2, 1] = 0.0  # One mid-window reset exercises the masking.
  return deter0, stoch0, act, tok, jnp.asarray(keep)


def make_gumbels(seed):
  key = jax.random.PRNGKey(int(seed))
  return jax.random.gumbel(key, (T, B, L), f32)


fwd = functools.partial(
    seqlib.fused_observe_seq, g=G, S=S, C=C, interpret=True)


class TestForward:

  def test_matches_reference_on_replayed_samples(self):
    params = make_params()
    deter0, stoch0, act, tok, keep = make_inputs()
    gum = make_gumbels(7)
    dseq, sseq, lseq = fwd(
        deter0, stoch0, act, tok, keep, gum, params)
    assert dseq.shape == (T, B, D)
    assert sseq.shape == (T, B, L) and lseq.shape == (T, B, L)
    # Samples are exact one-hots per class group.
    s3 = np.asarray(sseq).reshape(T, B, S, C)
    np.testing.assert_array_equal(s3.sum(-1), np.ones((T, B, S)))
    # Replay the samples through the XLA reference: the deterministic
    # tensors must agree.
    rd, rs, rl = seqlib.reference_observe_seq(
        deter0, stoch0, act, tok, keep, params, sseq, C)
    np.testing.assert_allclose(
        np.asarray(dseq), np.asarray(rd), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(lseq), np.asarray(rl), rtol=2e-3, atol=2e-3)

  def test_seed_changes_samples(self):
    params = make_params()
    deter0, stoch0, act, tok, keep = make_inputs()
    _, s1, _ = fwd(deter0, stoch0, act, tok, keep, make_gumbels(1), params)
    _, s2, _ = fwd(deter0, stoch0, act, tok, keep, make_gumbels(2), params)
    _, s1b, _ = fwd(deter0, stoch0, act, tok, keep, make_gumbels(1), params)
    assert not np.array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s1b))

  def test_sampling_statistics(self):
    # Near-uniform logits must sample all classes near-uniformly.
    params = make_params()
    deter0, stoch0, act, tok, keep = make_inputs()
    counts = np.zeros(C)
    for seed in range(40):
      _, sseq, _ = fwd(
          deter0, stoch0, act, tok, keep, make_gumbels(seed), params)
      counts += np.asarray(sseq).reshape(-1, C).sum(0)
    freqs = counts / counts.sum()
    # Logits are data-dependent, not exactly uniform; just require broad
    # support: every class sampled, none dominating.
    assert (freqs > 0).all(), freqs
    assert freqs.max() < 0.6, freqs


class TestBackward:

  def test_matches_autodiff_of_replayed_reference(self):
    params = make_params()
    deter0, stoch0, act, tok, keep = make_inputs()
    gum = make_gumbels(7)
    dseq, sseq, lseq = fwd(
        deter0, stoch0, act, tok, keep, gum, params)
    rng = np.random.default_rng(3)
    ddet = jnp.asarray(rng.standard_normal(dseq.shape), f32)
    dsto = jnp.asarray(rng.standard_normal(sseq.shape), f32)
    dlog = jnp.asarray(rng.standard_normal(lseq.shape), f32)

    def ref_loss(deter0, stoch0, act, tok, params):
      rd, rs, rl = seqlib.reference_observe_seq(
          deter0, stoch0, act, tok, keep, params, sseq, C)
      return (jnp.sum(rd * ddet) + jnp.sum(rs.astype(f32) * dsto)
              + jnp.sum(rl * dlog))

    want = jax.grad(ref_loss, argnums=(0, 1, 2, 3, 4))(
        deter0, stoch0, act, tok, params)

    deter_prev = jnp.concatenate([deter0[None], dseq[:-1]], 0)
    stoch_prev = jnp.concatenate([stoch0[None], sseq[:-1]], 0)
    got = seqlib.fused_observe_seq_bwd(
        deter_prev, stoch_prev, act, tok, keep, params,
        ddet, dsto, dlog, g=G, S=S, C=C, interpret=True)

    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(want[0]), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(got[1]), np.asarray(want[1]), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(got[2]), np.asarray(want[2]), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(got[3]), np.asarray(want[3]), rtol=2e-3, atol=2e-3)
    for name, g_got, g_want in zip(seqlib.FIELDS, got[4], want[4]):
      np.testing.assert_allclose(
          np.asarray(g_got), np.asarray(g_want), rtol=5e-3, atol=5e-3,
          err_msg=name)

  def test_custom_vjp_wires_the_kernel(self):
    params = make_params()
    deter0, stoch0, act, tok, keep = make_inputs()

    def loss(deter0, act, params):
      dseq, sseq, lseq = seqlib.observe_seq(
          deter0, stoch0, act, tok, keep, make_gumbels(7), params,
          G, S, C)
      return jnp.sum(dseq) + jnp.sum(lseq)

    # The public entry runs the non-interpret kernel; on CPU hosts that
    # would fail to compile, so only check it traces through grad when
    # interpret mode is forced globally.
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
      grads = jax.grad(loss, argnums=(0, 1))(deter0, act, params)
    assert np.isfinite(np.asarray(grads[0])).all()
    assert np.isfinite(np.asarray(grads[1])).all()


class TestImagStep:
  """Fused imagination step (ops/imagine.py): core + prior + sampling."""

  def _params(self, seed=0):
    from embodied_tpu.ops import imagine as imaglib
    rng = np.random.default_rng(seed)
    dg = D // G
    shapes = dict(
        w0=(D, H), b0=(H,), s0=(H,), w1=(L, H), b1=(H,), s1=(H,),
        wblk=(G, dg, dg), bblk=(D,), win=(3 * H, D), sh=(D,),
        wg=(G, dg, 3 * dg), bg=(3 * D,),
        wp0=(D, H), bp0=(H,), sp0=(H,), wp1=(H, H), bp1=(H,), sp1=(H,),
        wl=(H, L), bl=(L,))
    out = []
    for name in imaglib.FIELDS:
      scale = 1.0 if name.startswith('s') and len(name) <= 3 else 0.3
      base = 1.0 if name in ('s0', 's1', 'sh', 'sp0', 'sp1') else 0.0
      out.append(jnp.asarray(
          base + scale * rng.standard_normal(shapes[name]), f32))
    return tuple(out)

  def test_matches_reference(self):
    from embodied_tpu.ops import imagine as imaglib
    params = self._params()
    deter0, stoch0, act, tok, keep = make_inputs()
    gum = jax.random.gumbel(jax.random.PRNGKey(5), (B, L), f32)
    got = imaglib.fused_imag_step(
        deter0, stoch0, act[0], gum, params, g=G, S=S, C=C,
        interpret=True)
    want = imaglib.reference_imag_step(
        deter0, stoch0, act[0], gum, params, C)
    np.testing.assert_allclose(
        np.asarray(got[0]), np.asarray(want[0]), rtol=2e-4, atol=2e-4)
    # The reference sample is ST-attached (probs + sg(hard - probs)):
    # equal to the hard one-hot up to float rounding.
    np.testing.assert_allclose(
        np.asarray(got[1]), np.asarray(want[1]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got[2]), np.asarray(want[2]), rtol=2e-3, atol=2e-3)
    # Samples are exact one-hots per group.
    s3 = np.asarray(got[1]).reshape(B, S, C)
    np.testing.assert_array_equal(s3.sum(-1), np.ones((B, S)))

  def test_vjp_matches_reference_autodiff(self):
    from jax.experimental.pallas import tpu as pltpu
    from embodied_tpu.ops import imagine as imaglib
    params = self._params()
    deter0, stoch0, act, tok, keep = make_inputs()
    gum = jax.random.gumbel(jax.random.PRNGKey(5), (B, L), f32)

    def loss_kernel(deter, act, params):
      d, s, lg = imaglib.imag_step_vjp(
          deter, stoch0, act, gum, params, G, S, C)
      return jnp.sum(d) + jnp.sum(lg)

    def loss_ref(deter, act, params):
      d, s, lg = imaglib.reference_imag_step(
          deter, stoch0, act, gum, params, C)
      return jnp.sum(d) + jnp.sum(lg)

    with pltpu.force_tpu_interpret_mode():
      got = jax.grad(loss_kernel, argnums=(0, 1))(deter0, act[0], params)
    want = jax.grad(loss_ref, argnums=(0, 1))(deter0, act[0], params)
    for a, b in zip(got, want):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3)
