"""Fused whole-horizon imagination rollout: ONE pallas_call, policy in-kernel.

The imagination rollout is a sequential chain: policy(state) -> action ->
dynamics step -> next state. Because every step depends on the previous
step's SAMPLE, XLA cannot batch it over time, and the per-step fused
kernel (ops/imagine.py) still pays one launch per horizon step plus the
XLA-side policy MLP, action embedding, and sampling fusions between
launches — profiling showed the rollout dominating the train step
(~9.9 of 14 ms at size12m, runs/bench_r04/profile_size12m.json).

This kernel runs the ENTIRE rollout in one launch, mirroring the design
that won for the observe window (ops/observe_seq.py): the pallas grid is
(row_chunks, horizon) — horizon steps execute sequentially per row chunk
— the recurrent state lives in VMEM scratch, the weights (core + prior +
policy MLP + action embed) are fetched into VMEM once, and BOTH sampling
steps happen in-kernel:

  per grid step t the kernel
    1. runs the policy MLP on the carried (deter, stoch) feature,
    2. samples the action head — bounded_normal (tanh-mean, sigmoid-std,
       reparameterized with supplied normal noise) or categorical
       (Gumbel-max over the logits, one-hot result),
    3. embeds the clipped action (dynin2 linear + rms + silu),
    4. runs the block-GRU core and the 2-layer prior head,
    5. samples the stochastic state by Gumbel-max over the unimix
       distribution (flat segmented softmax/argmax, see observe_seq),
    6. writes (deter_t, stoch_t, logit_t, action_t) and carries
       (deter_t, stoch_t) in VMEM.

The action feature lane is padded to AP=128 outside the kernel (zero
weight rows / -1e9 logit bias on the padding), so all in-kernel shapes
are lane-tile aligned.

DreamerV3 trains the actor-critic on the ROLLED-OUT features with stop
gradients around the dynamics (model.py applies sg unless agent.ac_grads),
so the rollout is data generation and the kernel is forward-only on the
hot path. The custom VJP routes the rare differentiable case (ac_grads)
through autodiff of the XLA reference replay, which reproduces the XLA
scan path's gradient semantics: continuous actions are reparameterized
through the supplied noise, discrete actions are constants, and the
stochastic samples carry straight-through probability gradients.

Sampling parity note: as with the observe window, the kernel draws from
the exact sampling distributions of the XLA path (dists.Normal /
dists.Categorical / dists.OneHot) with noise generated once per rollout
by jax.random — key-deterministic, though the realized sample STREAM
differs from the jax.random.normal/categorical path's.

Reference anchors: /root/reference/dreamerv3/agent.py:156-245 (imag loss
rollout), /root/reference/dreamerv3/rssm.py:85-118 (imagine math),
/root/reference/embodied/jax/heads.py:107-121 (bounded_normal head),
/root/reference/embodied/jax/outs.py:243-271 (OneHot sampling).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import blockgru
from . import observe_seq as seqlib
from .blockgru import _chunk, _silu

f32 = jnp.float32
sg = jax.lax.stop_gradient

PRIOR_FIELDS = ('wp0', 'bp0', 'sp0', 'wp1', 'bp1', 'sp1', 'wpl', 'bpl')
EMBED_FIELDS = ('wa', 'ba', 'sa')


def fields(npol, disc):
  """Parameter tuple order for a rollout with an npol-layer policy MLP."""
  mlp = tuple(
      f'{k}{i}' for i in range(npol) for k in ('wm', 'bm', 'sm'))
  head = ('wh', 'bh') if disc else ('whm', 'bhm', 'whs', 'bhs')
  return blockgru.FIELDS + PRIOR_FIELDS + EMBED_FIELDS + mlp + head


def _policy_act(p, deter, stoch, noise, npol, disc, minstd, maxstd, eps):
  """Policy MLP + head sampling on (already stop-gradient) carry values.
  Returns (action record f32 (B, AP), embed input compute-dtype)."""
  cdt = deter.dtype
  D = deter.shape[-1]
  mm = lambda a, b: jnp.dot(a, b, preferred_element_type=f32)
  x = mm(deter, p['wm0'][:D]) + mm(stoch, p['wm0'][D:]) + p['bm0']
  x = _silu(seqlib._rms(x, p['sm0'], eps)).astype(cdt)
  for i in range(1, npol):
    x = _silu(seqlib._rms(
        mm(x, p[f'wm{i}']) + p[f'bm{i}'], p[f'sm{i}'], eps)).astype(cdt)
  if disc:
    logits = mm(x, p['wh']) + p['bh'].astype(f32)
    AP = logits.shape[-1]
    pos, same = seqlib._group_ids(AP, AP)
    # argmax(log_softmax(z) + g) == argmax(z + g): the log-normalizer is
    # constant per row (dists.Categorical sampling semantics).
    hard = seqlib._seg_argmax_onehot(
        logits + noise.astype(f32), pos, same, AP, f32)
    return hard, hard.astype(cdt)
  mean = jnp.tanh(mm(x, p['whm']) + p['bhm'].astype(f32))
  std = (maxstd - minstd) * jax.nn.sigmoid(
      mm(x, p['whs']) + p['bhs'].astype(f32) + 2.0) + minstd
  act = mean + std * noise.astype(f32)
  clipped = act / jnp.maximum(1.0, jnp.abs(act))
  return act, clipped.astype(cdt)


def _prior_logit(p, new, eps):
  cdt = new.dtype
  mm = lambda a, b: jnp.dot(a, b, preferred_element_type=f32)
  px = _silu(seqlib._rms(
      mm(new, p['wp0']) + p['bp0'], p['sp0'], eps)).astype(cdt)
  px = _silu(seqlib._rms(
      mm(px, p['wp1']) + p['bp1'], p['sp1'], eps)).astype(cdt)
  return mm(px, p['wpl']) + p['bpl'].astype(f32)


def _core(p, deter, stoch, actfeat, g, eps):
  """Block-GRU core on VMEM values (same math as blockgru._kernel)."""
  cdt = deter.dtype
  B, D = deter.shape
  dg = D // g
  mm = lambda a, b: jnp.dot(a, b, preferred_element_type=f32)
  xd = _silu(seqlib._rms(
      mm(deter, p['w0']) + p['b0'], p['s0'], eps)).astype(cdt)
  x0 = _silu(seqlib._rms(
      mm(stoch, p['w1']) + p['b1'], p['s1'], eps)).astype(cdt)
  x = jnp.concatenate([xd, x0, actfeat], -1)
  hs = [mm(deter[:, b * dg:(b + 1) * dg], p['wblk'][b]) for b in range(g)]
  h = jnp.concatenate(hs, -1) + p['bblk']
  h = h + mm(x, p['win'])
  h = _silu(seqlib._rms(h, p['sh'], eps)).astype(cdt)
  gs = [mm(h[:, b * dg:(b + 1) * dg], p['wg'][b]) for b in range(g)]
  gates = jnp.concatenate(gs, -1) + p['bg'].astype(f32)
  outs = []
  for b in range(g):
    off = b * 3 * dg
    reset = jax.nn.sigmoid(gates[:, off:off + dg])
    cand = jnp.tanh(reset * gates[:, off + dg:off + 2 * dg])
    update = jax.nn.sigmoid(gates[:, off + 2 * dg:off + 3 * dg] - 1)
    prev = deter[:, b * dg:(b + 1) * dg].astype(f32)
    outs.append(update * cand + (1 - update) * prev)
  return jnp.concatenate(outs, -1).astype(cdt)


def _seq_kernel(gum_ref, noise_ref, deter0_ref, stoch0_ref,
                *rest, flds, g, eps, unimix, S, C, npol, disc,
                minstd, maxstd):
  nw = len(flds)
  wrefs = rest[:nw]
  deter_out, stoch_out, logit_out, act_out = rest[nw:nw + 4]
  sd, ss = rest[nw + 4:]
  t = pl.program_id(1)

  @pl.when(t == 0)
  def _():
    sd[...] = deter0_ref[...]
    ss[...] = stoch0_ref[...]

  cdt = sd.dtype
  p = dict(zip(flds, [r[:] for r in wrefs]))
  deter = sd[...]
  stoch = ss[...]

  # 1-3. Policy + action sample + embed (actions act on the carried state).
  act_rec, act_in = _policy_act(
      p, deter, stoch, noise_ref[0], npol, disc, minstd, maxstd, eps)
  actfeat = _silu(seqlib._rms(
      jnp.dot(act_in, p['wa'], preferred_element_type=f32) + p['ba'],
      p['sa'], eps)).astype(cdt)

  # 4. Core + prior head.
  new = _core(p, deter, stoch, actfeat, g, eps)
  logit = _prior_logit(p, new, eps)

  # 5. Unimix Gumbel-max stochastic sample.
  L = S * C
  pos, same = seqlib._group_ids(L, C)
  probs, _ = seqlib._seg_softmax_flat(logit, pos, same, C, unimix)
  y = jnp.log(probs) + gum_ref[0].astype(f32)
  hard = seqlib._seg_argmax_onehot(y, pos, same, C, cdt)

  deter_out[0] = new
  stoch_out[0] = hard
  logit_out[0] = logit
  act_out[0] = act_rec
  sd[...] = new
  ss[...] = hard


@functools.partial(jax.jit, static_argnames=(
    'g', 'eps', 'unimix', 'S', 'C', 'npol', 'disc', 'minstd', 'maxstd',
    'bk', 'interpret'))
def fused_imagine_seq(deter0, stoch0, gumbels, noise, params, g, S, C,
                      npol, disc, minstd=0.1, maxstd=1.0, eps=1e-4,
                      unimix=0.01, bk=None, interpret=False):
  """Forward rollout. deter0/stoch0 are (B, D)/(B, L) compute-dtype
  starts; gumbels (H, B, L) and noise (H, B, AP) are f32 time-major
  noise (Gumbel for the stoch sample; Gumbel for discrete actions or
  standard normal for bounded_normal actions). Returns time-major
  (deter_seq, stoch_seq, logit_seq f32, act_seq f32); act_seq holds the
  raw continuous actions or the one-hot discrete choices on the first
  `adim` of the AP=128 padded lanes."""
  flds = fields(npol, disc)
  assert len(params) == len(flds), (len(params), len(flds))
  p = dict(zip(flds, params))
  H, B, L = gumbels.shape
  AP = noise.shape[2]
  D = deter0.shape[1]
  bk = bk or _chunk(B, 256)
  step = lambda dim: pl.BlockSpec(
      (1, bk, dim), lambda i, t: (t, i, 0), memory_space=pltpu.VMEM)
  row = lambda dim: pl.BlockSpec(
      (bk, dim), lambda i, t: (i, 0), memory_space=pltpu.VMEM)
  full = lambda arr: pl.BlockSpec(
      arr.shape, (lambda i, t: (0,) * arr.ndim), memory_space=pltpu.VMEM)
  weight_bytes = sum(
      int(np.prod(x.shape)) * jnp.dtype(x.dtype).itemsize for x in params)
  kernel = functools.partial(
      _seq_kernel, flds=flds, g=g, eps=eps, unimix=unimix, S=S, C=C,
      npol=npol, disc=disc, minstd=minstd, maxstd=maxstd)
  return pl.pallas_call(
      kernel,
      grid=(B // bk, H),
      in_specs=([step(L), step(AP), row(D), row(L)] +
                [full(p[k]) for k in flds]),
      out_specs=(step(D), step(L), step(L), step(AP)),
      out_shape=(jax.ShapeDtypeStruct((H, B, D), deter0.dtype),
                 jax.ShapeDtypeStruct((H, B, L), stoch0.dtype),
                 jax.ShapeDtypeStruct((H, B, L), f32),
                 jax.ShapeDtypeStruct((H, B, AP), f32)),
      scratch_shapes=[
          pltpu.VMEM((bk, D), deter0.dtype),
          pltpu.VMEM((bk, L), stoch0.dtype),
      ],
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=int(weight_bytes + (1 << 26))),
      interpret=interpret,
  )(gumbels, noise, deter0, stoch0, *params)


# --- XLA reference (tests + the custom VJP's backward) ----------------------


def reference_imagine_seq(deter0, stoch0, gumbels, noise, hard_seq,
                          act_seq, params, npol, disc, C, unimix=0.01,
                          minstd=0.1, maxstd=1.0, eps=1e-4):
  """Replays the kernel's stochastic one-hots `hard_seq` (H, B, L) and —
  for discrete heads — its recorded one-hot actions `act_seq` (H, B, AP)
  through the XLA step math. Continuous actions are RECOMPUTED from
  `noise` (reparameterized — so autodiff of this function reproduces the
  XLA scan path's gradients into the policy); discrete actions enter as
  replayed constants, as integer samples do (recomputing the Gumbel-max
  in XLA can flip near-tie rows against the Mosaic argmax). Returns
  time-major (deter_seq, stoch_seq, logit_seq, act_seq)."""
  flds = fields(npol, disc)
  p = dict(zip(flds, params))
  B, L = stoch0.shape
  D = deter0.shape[1]
  cdt = deter0.dtype
  ncore = len(blockgru.FIELDS)
  core_params = tuple(params[:ncore])

  def step(carry, inp):
    deter, stoch = carry
    gum, nz, hard, act = inp
    if disc:
      act_rec, act_in = act, act.astype(cdt)
    else:
      act_rec, act_in = _policy_act(
          dict(p), sg(deter), sg(stoch), nz, npol, disc, minstd, maxstd,
          eps)
    actfeat = _silu(seqlib._rms(
        act_in @ p['wa'] + p['ba'], p['sa'], eps)).astype(cdt)
    new = blockgru.reference_step(deter, stoch, actfeat, core_params, eps)
    logit = _prior_logit(p, new, eps)
    z3 = logit.reshape(B, L // C, C)
    probs, _ = seqlib._sample_probs(z3, unimix)
    hard3 = hard.astype(f32).reshape(B, L // C, C)
    sample = (probs + sg(hard3 - probs)).reshape(B, L).astype(cdt)
    return (new, sample), (new, sample, logit, act_rec)

  _, outs = jax.lax.scan(
      step, (deter0, stoch0), (gumbels, noise, hard_seq, act_seq))
  return outs


# --- Custom-VJP entry point ------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12))
def imagine_seq(deter0, stoch0, gumbels, noise, params, g, S, C, npol,
                disc, minstd=0.1, maxstd=1.0, unimix=0.01):
  """Fused whole-horizon imagination. The hot path is forward-only (the
  model stop-gradients rollout outputs unless agent.ac_grads); the
  backward replays the XLA reference with the recorded samples."""
  return fused_imagine_seq(
      deter0, stoch0, gumbels, noise, tuple(params),
      g=g, S=S, C=C, npol=npol, disc=disc, minstd=minstd, maxstd=maxstd,
      unimix=unimix)


def _fwd(deter0, stoch0, gumbels, noise, params, g, S, C, npol, disc,
         minstd, maxstd, unimix):
  out = imagine_seq(deter0, stoch0, gumbels, noise, params,
                    g, S, C, npol, disc, minstd, maxstd, unimix)
  _, stoch_seq, _, act_seq = out
  return out, (deter0, stoch0, gumbels, noise, stoch_seq, act_seq, params)


def _bwd(g, S, C, npol, disc, minstd, maxstd, unimix, residuals, grads):
  deter0, stoch0, gumbels, noise, stoch_seq, act_seq, params = residuals
  _, vjp = jax.vjp(
      lambda d0, s0, pa: reference_imagine_seq(
          d0, s0, gumbels, noise, stoch_seq, sg(act_seq), pa, npol, disc,
          C, unimix, minstd, maxstd),
      deter0, stoch0, tuple(params))
  dd0, ds0, dp = vjp(tuple(grads))
  return (dd0, ds0, jnp.zeros_like(gumbels), jnp.zeros_like(noise), dp)


imagine_seq.defvjp(_fwd, _bwd)
