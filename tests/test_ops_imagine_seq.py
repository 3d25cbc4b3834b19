"""Whole-horizon fused imagination kernel (ops/imagine_seq.py) numerics.

Interpret-mode validation on CPU: the deterministic tensors are checked
against the XLA reference replaying the kernel's own stochastic samples
(continuous actions are recomputed from the shared noise, discrete
actions re-derived by the same Gumbel-max), the custom VJP against
autodiff of that replayed reference, and the sampling distributions
statistically.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from embodied_tpu.ops import blockgru
from embodied_tpu.ops import imagine_seq as imslib

f32 = jnp.float32

T, B, D, G, H, S, C = 4, 4, 64, 2, 32, 4, 8
L = S * C
AP = 16  # padded action lane (128 on real TPU; any size in interpret)
NPOL = 2
UNITS = 24
MINSTD, MAXSTD = 0.1, 1.0


def make_params(disc, ain, seed=0):
  rng = np.random.default_rng(seed)
  dg = D // G
  indim = D + L
  shapes = dict(
      w0=(D, H), b0=(H,), s0=(H,), w1=(L, H), b1=(H,), s1=(H,),
      wblk=(G, dg, dg), bblk=(D,), win=(3 * H, D), sh=(D,),
      wg=(G, dg, 3 * dg), bg=(3 * D,),
      wp0=(D, H), bp0=(H,), sp0=(H,), wp1=(H, H), bp1=(H,), sp1=(H,),
      wpl=(H, L), bpl=(L,),
      wa=(AP, H), ba=(H,), sa=(H,),
      wm0=(indim, UNITS), bm0=(UNITS,), sm0=(UNITS,),
      wm1=(UNITS, UNITS), bm1=(UNITS,), sm1=(UNITS,),
      wh=(UNITS, AP), bh=(AP,),
      whm=(UNITS, AP), bhm=(AP,), whs=(UNITS, AP), bhs=(AP,))
  out = []
  for name in imslib.fields(NPOL, disc):
    scales = name in ('s0', 's1', 'sh', 'sp0', 'sp1', 'sa', 'sm0', 'sm1')
    val = (1.0 if scales else 0.0) + (1.0 if scales else 0.3) * (
        rng.standard_normal(shapes[name]) if not scales else 0.0)
    arr = np.asarray(val, np.float32) * np.ones(shapes[name], np.float32)
    # Lane padding as the model applies it: zero weight columns/rows past
    # ain; -1e9 on padded discrete logit bias so padding never wins.
    if name == 'wa':
      arr[ain:] = 0.0
    if name in ('wh', 'whm', 'whs'):
      arr[:, ain:] = 0.0
    if name in ('bhm', 'bhs'):
      arr[ain:] = 0.0
    if name == 'bh':
      arr[ain:] = -1e9
    out.append(jnp.asarray(arr, f32))
  return tuple(out)


def make_inputs(seed=1):
  rng = np.random.default_rng(seed)
  deter0 = jnp.asarray(rng.standard_normal((B, D)), f32)
  stoch0 = jnp.asarray(
      np.eye(C)[rng.integers(0, C, (B, S))].reshape(B, L), f32)
  key = jax.random.PRNGKey(seed)
  k1, k2 = jax.random.split(key)
  gum = jax.random.gumbel(k1, (T, B, L), f32)
  return deter0, stoch0, gum, k2


def run_fused(disc, ain, seed=1):
  params = make_params(disc, ain)
  deter0, stoch0, gum, k2 = make_inputs(seed)
  sampler = jax.random.gumbel if disc else jax.random.normal
  noise = sampler(k2, (T, B, AP), f32)
  out = imslib.fused_imagine_seq(
      deter0, stoch0, gum, noise, params, g=G, S=S, C=C, npol=NPOL,
      disc=disc, minstd=MINSTD, maxstd=MAXSTD, interpret=True)
  return params, deter0, stoch0, gum, noise, out


class TestForward:

  def test_continuous_matches_reference(self):
    params, deter0, stoch0, gum, noise, out = run_fused(False, 3)
    dseq, sseq, lseq, aseq = out
    assert dseq.shape == (T, B, D)
    assert sseq.shape == (T, B, L) and lseq.shape == (T, B, L)
    assert aseq.shape == (T, B, AP)
    s3 = np.asarray(sseq).reshape(T, B, S, C)
    np.testing.assert_array_equal(s3.sum(-1), np.ones((T, B, S)))
    rd, rs, rl, ra = imslib.reference_imagine_seq(
        deter0, stoch0, gum, noise, sseq, aseq, params, NPOL, False, C,
        minstd=MINSTD, maxstd=MAXSTD)
    np.testing.assert_allclose(
        np.asarray(dseq), np.asarray(rd), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(lseq), np.asarray(rl), rtol=2e-3, atol=2e-3)
    # Continuous actions are recomputed by the reference from the same
    # noise — they must agree on the live lanes.
    np.testing.assert_allclose(
        np.asarray(aseq)[..., :3], np.asarray(ra)[..., :3],
        rtol=1e-4, atol=1e-4)

  def test_discrete_matches_reference(self):
    params, deter0, stoch0, gum, noise, out = run_fused(True, 5)
    dseq, sseq, lseq, aseq = out
    a = np.asarray(aseq)
    # Discrete actions are exact one-hots confined to the live lanes.
    np.testing.assert_array_equal(a[..., 5:], np.zeros((T, B, AP - 5)))
    np.testing.assert_array_equal(a.sum(-1), np.ones((T, B)))
    rd, rs, rl, ra = imslib.reference_imagine_seq(
        deter0, stoch0, gum, noise, sseq, aseq, params, NPOL, True, C)
    np.testing.assert_array_equal(np.asarray(aseq), np.asarray(ra))
    np.testing.assert_allclose(
        np.asarray(dseq), np.asarray(rd), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(lseq), np.asarray(rl), rtol=2e-3, atol=2e-3)

  def test_carry_chains_across_steps(self):
    # Rolling two single-step kernels by hand must equal one T=2 window.
    params = make_params(False, 3)
    deter0, stoch0, gum, k2 = make_inputs(3)
    noise = jax.random.normal(k2, (T, B, AP), f32)
    call = functools.partial(
        imslib.fused_imagine_seq, params=params, g=G, S=S, C=C, npol=NPOL,
        disc=False, minstd=MINSTD, maxstd=MAXSTD, interpret=True)
    full = call(deter0, stoch0, gum[:2], noise[:2])
    s1 = call(deter0, stoch0, gum[:1], noise[:1])
    s2 = call(s1[0][0], s1[1][0], gum[1:2], noise[1:2])
    np.testing.assert_allclose(
        np.asarray(full[0][1]), np.asarray(s2[0][0]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(full[3][1]), np.asarray(s2[3][0]), rtol=1e-5, atol=1e-5)


class TestBackward:

  def test_vjp_matches_reference_autodiff(self, monkeypatch):
    monkeypatch.setattr(
        imslib, 'fused_imagine_seq',
        functools.partial(imslib.fused_imagine_seq, interpret=True))
    params, deter0, stoch0, gum, noise, out = run_fused(False, 3)
    sseq, aseq = out[1], out[3]

    def loss_fused(d0, pa):
      ds, ss, ls, As = imslib.imagine_seq(
          d0, stoch0, gum, noise, pa, G, S, C, NPOL, False,
          MINSTD, MAXSTD, 0.01)
      return (jnp.square(ds).mean() + jnp.square(ss).mean() +
              jnp.square(ls).mean() + jnp.square(As).mean())

    def loss_ref(d0, pa):
      ds, ss, ls, As = imslib.reference_imagine_seq(
          d0, stoch0, gum, noise, sseq, aseq, pa, NPOL, False, C,
          minstd=MINSTD, maxstd=MAXSTD)
      return (jnp.square(ds).mean() + jnp.square(ss).mean() +
              jnp.square(ls).mean() + jnp.square(As).mean())

    gd, gp = jax.grad(loss_fused, (0, 1))(deter0, params)
    rd_, rp = jax.grad(loss_ref, (0, 1))(deter0, params)
    np.testing.assert_allclose(
        np.asarray(gd), np.asarray(rd_), rtol=2e-3, atol=2e-3)
    for a, b, name in zip(gp, rp, imslib.fields(NPOL, False)):
      np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
          err_msg=name)


class TestSampling:

  def test_stoch_frequencies_match_distribution(self):
    # One step, many rows: empirical class frequencies of the in-kernel
    # Gumbel-max track the unimix-blended softmax of the emitted logits.
    BB = 512
    params = make_params(False, 3, seed=5)
    rng = np.random.default_rng(9)
    deter0 = jnp.asarray(0.1 * rng.standard_normal((BB, D)), f32)
    stoch0 = jnp.asarray(
        np.eye(C)[rng.integers(0, C, (BB, S))].reshape(BB, L), f32)
    key = jax.random.PRNGKey(11)
    gum = jax.random.gumbel(key, (1, BB, L), f32)
    noise = jax.random.normal(jax.random.fold_in(key, 1), (1, BB, AP), f32)
    ds, ss, ls, _ = imslib.fused_imagine_seq(
        deter0, stoch0, gum, noise, params, g=G, S=S, C=C, npol=NPOL,
        disc=False, minstd=MINSTD, maxstd=MAXSTD, interpret=True)
    logits = np.asarray(ls)[0].reshape(BB, S, C)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = 0.99 * e / e.sum(-1, keepdims=True) + 0.01 / C
    freq = np.asarray(ss)[0].reshape(BB, S, C).mean(0)
    np.testing.assert_allclose(freq, probs.mean(0), atol=0.08)

  def test_continuous_action_moments(self):
    BB = 512
    params = make_params(False, 3, seed=6)
    rng = np.random.default_rng(10)
    deter0 = jnp.asarray(0.1 * rng.standard_normal((BB, D)), f32)
    stoch0 = jnp.asarray(
        np.eye(C)[rng.integers(0, C, (BB, S))].reshape(BB, L), f32)
    key = jax.random.PRNGKey(12)
    gum = jax.random.gumbel(key, (1, BB, L), f32)
    noise = jax.random.normal(jax.random.fold_in(key, 1), (1, BB, AP), f32)
    _, _, _, As = imslib.fused_imagine_seq(
        deter0, stoch0, gum, noise, params, g=G, S=S, C=C, npol=NPOL,
        disc=False, minstd=MINSTD, maxstd=MAXSTD, interpret=True)
    acts = np.asarray(As)[0, :, :3]
    # All rows share (nearly) the same state -> same mean/std; the
    # sample std must sit inside [minstd, maxstd] up to sampling error.
    assert MINSTD * 0.7 <= acts.std(0).mean() <= MAXSTD * 1.3, acts.std(0)
