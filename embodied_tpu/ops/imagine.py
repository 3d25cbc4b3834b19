"""Fused RSSM imagination step: core + prior head + stoch sampling.

The imagination rollout (models/dreamerv3/rssm.py imagine_single) is the
largest remaining share of the train step after the fused observe window:
per horizon step it runs the block-GRU core, a 2-layer prior MLP, the
logit projection, and a unimix categorical sample over B*K rows — each
its own set of XLA fusions (the core already runs as one kernel; the
prior tail and sampling add ~a dozen small launches per step). This
kernel fuses core + prior + sampling into ONE launch per step. The
policy MLP and action embedding stay in XLA (they depend on the previous
step's sample, so they cannot batch, but they are two dense matmuls XLA
handles well).

Sampling uses the same flat segmented softmax/argmax as the observe
window (ops/observe_seq.py) with Gumbel noise supplied by the caller, so
it is key-deterministic.

The rollout is data generation: DreamerV3 trains the actor-critic on the
rolled-out FEATURES with stop-gradients around the dynamics (model.py
_imagination_objectives applies sg unless agent.ac_grads). The custom
VJP therefore routes the (rare) differentiable case through autodiff of
the XLA reference rather than an analytic backward kernel.

Weight layout: the 12 core FIELDS of ops/blockgru.py followed by
  wp0 (D, Hh), bp0 (Hh), sp0 (Hh)   prior0 + rms scale
  wp1 (Hh, Hh), bp1 (Hh), sp1 (Hh)  prior1 + rms scale
  wl (Hh, L), bl (L)                priorlogit   (L = stoch * classes)

Reference anchors: /root/reference/dreamerv3/rssm.py:85-118 (imagine),
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
from .blockgru import _silu

f32 = jnp.float32

FIELDS = blockgru.FIELDS + ('wp0', 'bp0', 'sp0', 'wp1', 'bp1', 'sp1',
                            'wl', 'bl')


def reference_imag_step(deter, stoch_flat, actfeat, gum, params, C,
                        unimix=0.01, eps=1e-4):
  """Pure XLA: core step + prior head + Gumbel-max sample."""
  p = dict(zip(FIELDS, params))
  cdt = deter.dtype
  new = blockgru.reference_step(
      deter, stoch_flat, actfeat, params[:len(blockgru.FIELDS)], eps)
  x = _silu(seqlib._rms(new @ p['wp0'] + p['bp0'], p['sp0'], eps))
  x = x.astype(cdt)
  x = _silu(seqlib._rms(x @ p['wp1'] + p['bp1'], p['sp1'], eps)).astype(cdt)
  logit = (x @ p['wl'] + p['bl']).astype(f32)
  B, L = logit.shape
  z3 = logit.reshape(B, L // C, C)
  probs, _ = seqlib._sample_probs(z3, unimix)
  y = jnp.log(probs) + gum.astype(f32).reshape(B, L // C, C)
  hard = (y >= y.max(-1, keepdims=True)).astype(f32)
  # Straight-through attachment (dists.OneHot semantics): values equal
  # the hard sample, gradients flow into the class probabilities — so
  # autodiff of this reference (the custom VJP's backward) matches the
  # XLA sampling path when rollout features are differentiated.
  sample = (probs + jax.lax.stop_gradient(hard - probs)).reshape(B, L)
  return new, sample.astype(cdt), logit


def _kernel(deter_ref, stoch_ref, act_ref, gum_ref, *wrefs_and_outs,
            g, eps, unimix, S, C):
  wrefs = wrefs_and_outs[:len(FIELDS)]
  deter_out, stoch_out, logit_out = wrefs_and_outs[len(FIELDS):]
  p = dict(zip(FIELDS, [r[:] for r in wrefs]))
  deter = deter_ref[:]
  cdt = deter.dtype
  B, D = deter.shape
  dg = D // g
  mm = lambda a, b: jnp.dot(a, b, preferred_element_type=f32)

  # --- Core step (mirrors blockgru._kernel) -------------------------------
  xd = _silu(seqlib._rms(
      mm(deter, p['w0']) + p['b0'], p['s0'], eps)).astype(cdt)
  x0 = _silu(seqlib._rms(
      mm(stoch_ref[:], p['w1']) + p['b1'], p['s1'], eps)).astype(cdt)
  x = jnp.concatenate([xd, x0, act_ref[:]], -1)
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
  new = jnp.concatenate(outs, -1).astype(cdt)

  # --- Prior head ---------------------------------------------------------
  px = _silu(seqlib._rms(
      mm(new, p['wp0']) + p['bp0'], p['sp0'], eps)).astype(cdt)
  px = _silu(seqlib._rms(
      mm(px, p['wp1']) + p['bp1'], p['sp1'], eps)).astype(cdt)
  logit = mm(px, p['wl']) + p['bl'].astype(f32)

  # --- Unimix Gumbel-max sample -------------------------------------------
  L = S * C
  pos, same = seqlib._group_ids(L, C)
  probs, _ = seqlib._seg_softmax_flat(logit, pos, same, C, unimix)
  y = jnp.log(probs) + gum_ref[:].astype(f32)
  hard = seqlib._seg_argmax_onehot(y, pos, same, C, cdt)

  deter_out[:] = new
  stoch_out[:] = hard
  logit_out[:] = logit


@functools.partial(
    jax.jit, static_argnames=('g', 'eps', 'unimix', 'S', 'C', 'interpret'))
def fused_imag_step(deter, stoch_flat, actfeat, gum, params, g, S, C,
                    eps=1e-4, unimix=0.01, interpret=False):
  p = dict(zip(FIELDS, params))
  B, D = deter.shape
  L = S * C
  A = actfeat.shape[1]
  bk = blockgru._chunk(B)
  row = lambda dim: pl.BlockSpec(
      (bk, dim), lambda i: (i, 0), memory_space=pltpu.VMEM)
  full = lambda arr: pl.BlockSpec(
      arr.shape, (lambda i: (0,) * arr.ndim), memory_space=pltpu.VMEM)
  weight_bytes = sum(
      int(np.prod(x.shape)) * jnp.dtype(x.dtype).itemsize for x in params)
  kernel = functools.partial(
      _kernel, g=g, eps=eps, unimix=unimix, S=S, C=C)
  return pl.pallas_call(
      kernel,
      grid=(B // bk,),
      in_specs=([row(D), row(L), row(A), row(L)] +
                [full(p[k]) for k in FIELDS]),
      out_specs=(row(D), row(L), row(L)),
      out_shape=(jax.ShapeDtypeStruct((B, D), deter.dtype),
                 jax.ShapeDtypeStruct((B, L), deter.dtype),
                 jax.ShapeDtypeStruct((B, L), f32)),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=int(weight_bytes + (1 << 25))),
      interpret=interpret,
  )(deter, stoch_flat, actfeat, gum, *params)


# The public entry: differentiable via the XLA reference (the rollout is
# normally under stop_gradient, so the backward almost never runs).
@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def imag_step_vjp(deter, stoch_flat, actfeat, gum, params, g, S, C,
                  unimix=0.01):
  return fused_imag_step(
      deter, stoch_flat, actfeat, gum, tuple(params),
      g=g, S=S, C=C, unimix=unimix)


def _fwd(deter, stoch_flat, actfeat, gum, params, g, S, C, unimix):
  out = imag_step_vjp(deter, stoch_flat, actfeat, gum, params, g, S, C,
                      unimix)
  return out, (deter, stoch_flat, actfeat, gum, params)


def _bwd(g, S, C, unimix, residuals, grads):
  deter, stoch_flat, actfeat, gum, params = residuals
  _, vjp = jax.vjp(
      lambda de, st, ac, pa: reference_imag_step(
          de, st, ac, gum, pa, C, unimix),
      deter, stoch_flat, actfeat, tuple(params))
  dd, ds, da, dp = vjp(grads)
  return dd, ds, da, jnp.zeros_like(gum), dp


imag_step_vjp.defvjp(_fwd, _bwd)
