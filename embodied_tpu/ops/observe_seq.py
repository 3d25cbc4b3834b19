"""Grid-over-time fused RSSM observe: ONE pallas_call per BPTT window.

The per-step fused observe kernel (ops/observe.py) still launches once per
scan iteration and leaves the categorical sampling to XLA, so a T=64
training window costs 64 launches plus 64 small sampling fusions in each
direction, with the recurrent state bouncing through HBM between steps.
This module fuses the WHOLE window: the pallas grid runs over time (TPU
grid steps execute sequentially), the recurrent state lives in VMEM
scratch across grid steps, the weights are fetched into VMEM once, and
the unimix categorical sampling (straight-through gradients) happens
in-kernel by Gumbel-max over noise supplied as an input.

Per grid step t the kernel:
  masks state by ~reset[t], runs the block-GRU core + posterior head
  (same math as ops/observe.py), samples the stochastic state with
  Gumbel-max over the unimix-blended class distribution, writes
  (deter_t, hard_t, logit_t), and carries (deter_t, hard_t) in VMEM.

The backward kernel runs the grid in reverse: it recomputes the step's
forward from the (stored) previous states, adds the straight-through
probability gradient into the logit gradient, and accumulates weight
gradients in VMEM scratch, emitting them on the final grid step.

Sampling parity note: the kernel draws from the exact sampling
distribution of dists.OneHot (log_softmax -> unimix blend -> Gumbel-max)
with Gumbel noise generated once per window by jax.random — sampling is
key-deterministic and resume-stable, though the realized sample STREAM
differs from the jax.random.categorical path's. Tests therefore validate
(a) the deterministic tensors step-by-step against the XLA reference
driven by the kernel's own samples, (b) the backward against autodiff of
that replayed reference, and (c) the sampling frequencies statistically
(tests/test_ops_seq.py).

Reference anchors: /root/reference/dreamerv3/rssm.py:61-118 (observe
math), /root/reference/embodied/jax/outs.py:243-271 (OneHot sampling).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import blockgru
from . import observe as observelib
from .blockgru import _dsilu, _rms_bwd, _rms_parts, _silu

f32 = jnp.float32

FIELDS = observelib.FIELDS


def _sample_probs(z3, unimix):
  """Softmax + unimix blend per class group; z3 (B, S, C) f32. XLA-side
  reference formulation (Mosaic cannot reshape (B, L) -> (B, S, C), so
  the kernels use the flat segmented helpers below instead)."""
  m = z3.max(-1, keepdims=True)
  e = jnp.exp(z3 - m)
  sm = e / e.sum(-1, keepdims=True)
  C = z3.shape[-1]
  return (1.0 - unimix) * sm + unimix / C, sm


def _st_logit_grad(dsoft, sm, unimix):
  """d(logits) for the straight-through path: dsoft flows into the
  unimix-blended probabilities, whose logit jacobian is (1-u) times the
  softmax jacobian."""
  inner = dsoft - (dsoft * sm).sum(-1, keepdims=True)
  return (1.0 - unimix) * sm * inner


# --- Flat segmented ops (kernel-side) --------------------------------------
# The stochastic state is S groups x C classes laid out contiguously in the
# L = S*C lane dimension. Mosaic rejects lane-splitting reshapes, so group
# reductions run flat: per-group sums/broadcasts as ONE (B,L)x(L,L) matmul
# with the 0/1 same-group matrix, and per-group max by lane-shift doubling
# (slice+concat rotations) with a position predicate so shifts never cross
# a group boundary.


def _group_ids(L, C):
  pos = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1) % C
  row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0) // C
  col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1) // C
  same = (row == col).astype(f32)
  return pos, same


def _rotate(x, k):
  return jnp.concatenate([x[:, k:], x[:, :k]], axis=1)


def _bcast(start, same):
  # Exactness note: `start` has ONE nonzero per group, so the product
  # against the 0/1 matrix is a single term; still, the MXU's f32 path is
  # multi-pass bf16, so only values with short mantissas (small integers)
  # broadcast bit-exactly. Use HIGHEST precision to keep real-valued
  # broadcasts (softmax max/sum) accurate too.
  return jnp.dot(start, same, preferred_element_type=f32,
                 precision=jax.lax.Precision.HIGHEST)


def _seg_max_bcast(z, pos, same, C):
  """Per-group max of z (B, L) f32, broadcast back to every lane."""
  m = z
  k = 1
  while k < C:
    m = jnp.where(pos + k < C, jnp.maximum(m, _rotate(m, k)), m)
    k *= 2
  start = jnp.where(pos == 0, m, 0.0)  # Suffix max at pos 0 == group max.
  return _bcast(start, same)


def _seg_argmax_onehot(z, pos, same, C, dtype):
  """Per-group one-hot argmax of z (B, L) f32, computed by propagating
  the argmax POSITION through the max doubling: positions are small
  integers that survive the broadcast matmul exactly, so the final
  equality compare is robust to MXU rounding (an equality on the VALUE
  broadcast is not)."""
  m = z
  a = jnp.broadcast_to(pos.astype(f32), z.shape)
  k = 1
  while k < C:
    ms, as_ = _rotate(m, k), _rotate(a, k)
    within = pos + k < C
    better = jnp.logical_and(within, ms > m)
    m = jnp.where(better, ms, m)
    a = jnp.where(better, as_, a)
    k *= 2
  idx = _bcast(jnp.where(pos == 0, a, 0.0), same)
  return (jnp.abs(pos.astype(f32) - idx) < 0.5).astype(dtype)


def _seg_softmax_flat(z, pos, same, C, unimix):
  """Unimix-blended per-group softmax of flat logits (B, L) f32."""
  e = jnp.exp(z - _seg_max_bcast(z, pos, same, C))
  gsum = _bcast(e, same)
  sm = e / gsum
  return (1.0 - unimix) * sm + unimix / C, sm


def _st_logit_grad_flat(dsoft, sm, same, unimix):
  inner = dsoft - _bcast(dsoft * sm, same)
  return (1.0 - unimix) * sm * inner


def _fwd_step(deter, stoch, act, tok, p, g, eps):
  """Shared forward math (core + posterior head) on VMEM values; returns
  (new_deter cdt, logits f32). `p` maps FIELDS to loaded refs/values."""
  B, D = deter.shape
  dg = D // g
  cdt = deter.dtype
  mm = lambda a, b: jnp.dot(a, b, preferred_element_type=f32)
  xd = _silu(_rms(mm(deter, p['w0']) + p['b0'], p['s0'], eps)).astype(cdt)
  x0 = _silu(_rms(mm(stoch, p['w1']) + p['b1'], p['s1'], eps)).astype(cdt)
  x = jnp.concatenate([xd, x0, act], -1)
  hs = [mm(deter[:, b * dg:(b + 1) * dg], p['wblk'][b]) for b in range(g)]
  h = jnp.concatenate(hs, -1) + p['bblk']
  h = h + mm(x, p['win'])
  h = _silu(_rms(h, p['sh'], eps)).astype(cdt)
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
  pre = mm(new, p['wo'][:D]) + mm(tok, p['wo'][D:]) + p['bo']
  xo = _silu(_rms(pre, p['so'], eps)).astype(cdt)
  logit = mm(xo, p['wl']) + p['bl'].astype(f32)
  return new, logit


def _rms(x, scale, eps):
  x = x.astype(f32)
  mult = jax.lax.rsqrt(jnp.square(x).mean(-1, keepdims=True) + eps)
  return x * mult * scale.astype(f32)


def _seq_kernel(act_ref, tok_ref, mask_ref, gum_ref,
                deter0_ref, stoch0_ref,
                *wrefs_and_outs, g, eps, unimix, S, C):
  wrefs = wrefs_and_outs[:len(FIELDS)]
  deter_out, stoch_out, logit_out = wrefs_and_outs[
      len(FIELDS):len(FIELDS) + 3]
  sd, ss = wrefs_and_outs[len(FIELDS) + 3:]
  t = pl.program_id(0)

  @pl.when(t == 0)
  def _():
    sd[:] = deter0_ref[:]
    ss[:] = stoch0_ref[:]

  cdt = sd.dtype
  mask = mask_ref[t][:, None]  # (B, 1) f32 keep-mask row for this step.
  deter = (sd[:].astype(f32) * mask).astype(cdt)
  stoch = (ss[:].astype(f32) * mask).astype(cdt)
  act = (act_ref[0].astype(f32) * mask).astype(cdt)
  tok = tok_ref[0]
  p = dict(zip(FIELDS, [r[:] for r in wrefs]))
  new, logit = _fwd_step(deter, stoch, act, tok, p, g, eps)
  L = S * C
  pos, same = _group_ids(L, C)
  probs, _ = _seg_softmax_flat(logit, pos, same, C, unimix)
  # Gumbel-max over the blended distribution; the Gumbel noise is a
  # kernel input (generated once per window with jax.random outside), so
  # sampling stays key-deterministic and resume-stable.
  y = jnp.log(probs) + gum_ref[0].astype(f32)
  hard_flat = _seg_argmax_onehot(y, pos, same, C, cdt)
  deter_out[0] = new
  stoch_out[0] = hard_flat
  logit_out[0] = logit  # f32: the KL losses consume these directly.
  sd[:] = new
  ss[:] = hard_flat


@functools.partial(
    jax.jit, static_argnames=('g', 'eps', 'unimix', 'S', 'C', 'interpret'))
def fused_observe_seq(deter0, stoch0, actfeat, tokens, keepmask, gumbels,
                      params, g, S, C, eps=1e-4, unimix=0.01,
                      interpret=False):
  """Forward window. actfeat/tokens/keepmask/gumbels are TIME-MAJOR:
  (T, B, A), (T, B, K), (T, B) f32, (T, B, L) f32 Gumbel noise. Returns
  time-major (deter_seq, stoch_seq, logit_seq)."""
  p = dict(zip(FIELDS, params))
  T, B, A = actfeat.shape
  K = tokens.shape[2]
  D = deter0.shape[1]
  L = S * C
  step = lambda dim: pl.BlockSpec(
      (1, B, dim), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
  full = lambda arr: pl.BlockSpec(
      arr.shape, (lambda t: (0,) * arr.ndim), memory_space=pltpu.VMEM)
  weight_bytes = sum(
      int(np.prod(x.shape)) * jnp.dtype(x.dtype).itemsize for x in params)
  kernel = functools.partial(
      _seq_kernel, g=g, eps=eps, unimix=unimix, S=S, C=C)
  return pl.pallas_call(
      kernel,
      grid=(T,),
      in_specs=([step(A), step(K),
                 pl.BlockSpec((T, B), lambda t: (0, 0),
                              memory_space=pltpu.VMEM),
                 step(L),
                 full(deter0), full(stoch0)] +
                [full(p[k]) for k in FIELDS]),
      out_specs=(step(D), step(L), step(L)),
      scratch_shapes=[
          pltpu.VMEM((B, D), deter0.dtype),
          pltpu.VMEM((B, L), stoch0.dtype),
      ],
      out_shape=(jax.ShapeDtypeStruct((T, B, D), deter0.dtype),
                 jax.ShapeDtypeStruct((T, B, L), stoch0.dtype),
                 jax.ShapeDtypeStruct((T, B, L), jnp.float32)),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=int(weight_bytes + (1 << 25))),
      interpret=interpret,
  )(actfeat, tokens, keepmask, gumbels, deter0, stoch0, *params)


def _seq_bwd_kernel(act_ref, tok_ref, mask_ref, dprev_ref, sprev_ref,
                    ddet_ref, dsto_ref, dlog_ref,
                    *rest, g, eps, unimix, S, C, T):
  nw = len(FIELDS)
  wrefs = rest[:nw]
  outs = rest[nw:nw + 2 + 2 + nw]
  dact_ref, dtok_ref, ddeter0_ref, dstoch0_ref = outs[:4]
  dw_out = outs[4:]
  scr = rest[nw + 4 + nw:]
  cd, cs = scr[:2]
  wacc = scr[2:]
  i = pl.program_id(0)

  @pl.when(i == 0)
  def _():
    cd[...] = jnp.zeros_like(cd)
    cs[...] = jnp.zeros_like(cs)
    for ref in wacc:
      ref[...] = jnp.zeros_like(ref)

  p = dict(zip(FIELDS, [r[:] for r in wrefs]))
  cdt = dprev_ref.dtype
  B = dprev_ref.shape[1]
  D = dprev_ref.shape[2]
  dg = D // g
  H = p['b0'].shape[0]
  mask = mask_ref[pl.num_programs(0) - 1 - i][:, None]
  mm = lambda a, b: jnp.dot(a, b, preferred_element_type=f32)
  mmT = lambda a, b: jax.lax.dot_general(
      a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32)
  mmBT = lambda a, b: jax.lax.dot_general(
      a, b, (((1,), (1,)), ((), ())), preferred_element_type=f32)

  deter = (dprev_ref[0].astype(f32) * mask).astype(cdt)
  stoch = (sprev_ref[0].astype(f32) * mask).astype(cdt)
  act = (act_ref[0].astype(f32) * mask).astype(cdt)
  tok = tok_ref[0]

  # --- Forward recompute (mirrors ops/observe.py _obs_bwd_kernel) ---------
  pre0 = mm(deter, p['w0']) + p['b0'].astype(f32)
  n0, rstd0 = _rms_parts(pre0, eps)
  y0 = n0 * p['s0'].astype(f32)
  xd = _silu(y0)
  pre1 = mm(stoch, p['w1']) + p['b1'].astype(f32)
  n1, rstd1 = _rms_parts(pre1, eps)
  y1 = n1 * p['s1'].astype(f32)
  x0 = _silu(y1)
  x = jnp.concatenate([xd.astype(cdt), x0.astype(cdt), act], -1)
  hbs = [mm(deter[:, b * dg:(b + 1) * dg], p['wblk'][b]) for b in range(g)]
  hpre = jnp.concatenate(hbs, -1) + p['bblk'].astype(f32)
  hpre = hpre + mm(x, p['win'])
  nh, rstdh = _rms_parts(hpre, eps)
  yh = nh * p['sh'].astype(f32)
  h = _silu(yh)
  hc = h.astype(cdt)
  deter32 = deter.astype(f32)
  rs, cs_, us, news = [], [], [], []
  for b in range(g):
    sl = slice(b * dg, (b + 1) * dg)
    gates = mm(hc[:, sl], p['wg'][b]) + p['bg'][
        b * 3 * dg:(b + 1) * 3 * dg].astype(f32)
    r = jax.nn.sigmoid(gates[:, :dg])
    c = jnp.tanh(r * gates[:, dg:2 * dg])
    u = jax.nn.sigmoid(gates[:, 2 * dg:] - 1)
    rs.append(r)
    cs_.append((c, gates[:, dg:2 * dg]))
    us.append(u)
    news.append(u * c + (1 - u) * deter32[:, sl])
  new32 = jnp.concatenate(news, -1)
  newc = new32.astype(cdt)
  preo = mm(newc, p['wo'][:D]) + mm(tok, p['wo'][D:]) + p['bo'].astype(f32)
  no, rstdo = _rms_parts(preo, eps)
  yo = no * p['so'].astype(f32)
  xo = _silu(yo)
  xoc = xo.astype(cdt)
  logit = mm(xoc, p['wl']) + p['bl'].astype(f32)

  # --- Straight-through sampling backward ---------------------------------
  pos, same = _group_ids(S * C, C)
  _, sm = _seg_softmax_flat(logit, pos, same, C, unimix)
  dstoch_total = dsto_ref[0].astype(f32) + cs[:]
  dlogit = dlog_ref[0].astype(f32) + _st_logit_grad_flat(
      dstoch_total, sm, same, unimix)

  # --- Posterior head backward --------------------------------------------
  (aw0, ab0, as0, aw1, ab1, as1, awblk, abblk, awin, ash, awg, abg,
   awo, abo, aso, awl, abl) = wacc
  abl[...] += jnp.sum(dlogit, 0)
  dlogit_c = dlogit.astype(cdt)
  awl[...] += mmT(xoc, dlogit_c)
  dxo = mmBT(dlogit_c, p['wl'])
  dyo = dxo * _dsilu(yo)
  aso[...] += jnp.sum(dyo * no, 0)
  dpreo = _rms_bwd(dyo * p['so'].astype(f32), no, rstdo)
  abo[...] += jnp.sum(dpreo, 0)
  dpreo_c = dpreo.astype(cdt)
  awo[:D] += mmT(newc, dpreo_c)
  awo[D:] += mmT(tok, dpreo_c)
  dtok_ref[0] = mmBT(dpreo_c, p['wo'][D:]).astype(cdt)
  dout = ddet_ref[0].astype(f32) + cd[:] + mmBT(dpreo_c, p['wo'][:D])

  # --- Gate backward ------------------------------------------------------
  dh_parts, ddeter_parts = [], []
  for b in range(g):
    sl = slice(b * dg, (b + 1) * dg)
    r = rs[b]
    c, gc = cs_[b]
    u = us[b]
    db = dout[:, sl]
    du = db * (c - deter32[:, sl]) * u * (1 - u)
    dc = db * u
    dt = dc * (1 - jnp.square(c))
    dgc = dt * r
    dgr = dt * gc * r * (1 - r)
    ddeter_parts.append(db * (1 - u))
    dgates = jnp.concatenate([dgr, dgc, du], -1)
    abg[b * 3 * dg:(b + 1) * 3 * dg] += jnp.sum(dgates, 0)
    dgates_c = dgates.astype(cdt)
    awg[b] += mmT(hc[:, sl], dgates_c)
    dh_parts.append(mmBT(dgates_c, p['wg'][b]))
  dh = jnp.concatenate(dh_parts, -1)
  ddeter = jnp.concatenate(ddeter_parts, -1)

  # --- Hidden layer backward ----------------------------------------------
  dyh = dh * _dsilu(yh)
  ash[...] += jnp.sum(dyh * nh, 0)
  dhpre = _rms_bwd(dyh * p['sh'].astype(f32), nh, rstdh)
  abblk[...] += jnp.sum(dhpre, 0)
  dhpre_c = dhpre.astype(cdt)
  dblk_parts = []
  for b in range(g):
    sl = slice(b * dg, (b + 1) * dg)
    awblk[b] += mmT(deter[:, sl], dhpre_c[:, sl])
    dblk_parts.append(mmBT(dhpre_c[:, sl], p['wblk'][b]))
  ddeter = ddeter + jnp.concatenate(dblk_parts, -1)
  awin[...] += mmT(x, dhpre_c)
  dx = mmBT(dhpre_c, p['win'])

  # --- Input projections backward -----------------------------------------
  dxd, dx0, dact = dx[:, :H], dx[:, H:2 * H], dx[:, 2 * H:]
  dy0 = dxd * _dsilu(y0)
  as0[...] += jnp.sum(dy0 * n0, 0)
  dpre0 = _rms_bwd(dy0 * p['s0'].astype(f32), n0, rstd0)
  ab0[...] += jnp.sum(dpre0, 0)
  dpre0_c = dpre0.astype(cdt)
  aw0[...] += mmT(deter, dpre0_c)
  ddeter = ddeter + mmBT(dpre0_c, p['w0'])

  dy1 = dx0 * _dsilu(y1)
  as1[...] += jnp.sum(dy1 * n1, 0)
  dpre1 = _rms_bwd(dy1 * p['s1'].astype(f32), n1, rstd1)
  ab1[...] += jnp.sum(dpre1, 0)
  dpre1_c = dpre1.astype(cdt)
  aw1[...] += mmT(stoch, dpre1_c)
  dstoch_in = mmBT(dpre1_c, p['w1'])

  dact_ref[0] = (dact * mask).astype(cdt)
  cd[...] = ddeter * mask
  cs[...] = dstoch_in * mask

  @pl.when(i == pl.num_programs(0) - 1)
  def _():
    ddeter0_ref[:] = cd[...].astype(ddeter0_ref.dtype)
    dstoch0_ref[:] = cs[...].astype(dstoch0_ref.dtype)
    for out, acc in zip(dw_out, wacc):
      out[...] = acc[...].astype(out.dtype)


@functools.partial(
    jax.jit, static_argnames=('g', 'eps', 'unimix', 'S', 'C', 'interpret'))
def fused_observe_seq_bwd(deter_prev, stoch_prev, actfeat, tokens,
                          keepmask, params, ddeter, dstoch, dlogit,
                          g, S, C, eps=1e-4, unimix=0.01, interpret=False):
  """Backward over the window (time-major inputs). deter_prev/stoch_prev
  are the states ENTERING each step (outputs shifted right, initial carry
  first). Returns (ddeter0, dstoch0, dactfeat, dtokens, dparams)."""
  p = dict(zip(FIELDS, params))
  T, B, A = actfeat.shape
  K = tokens.shape[2]
  D = deter_prev.shape[2]
  L = S * C
  rev = lambda dim: pl.BlockSpec(
      (1, B, dim), lambda i: (T - 1 - i, 0, 0), memory_space=pltpu.VMEM)
  full = lambda arr: pl.BlockSpec(
      arr.shape, (lambda i: (0,) * arr.ndim), memory_space=pltpu.VMEM)
  weight_bytes = sum(
      int(np.prod(x.shape)) * jnp.dtype(x.dtype).itemsize for x in params)
  kernel = functools.partial(
      _seq_bwd_kernel, g=g, eps=eps, unimix=unimix, S=S, C=C, T=T)
  in_specs = (
      [rev(A), rev(K),
       pl.BlockSpec((T, B), lambda i: (0, 0),
                    memory_space=pltpu.VMEM),
       rev(D), rev(L), rev(D), rev(L), rev(L)] +
      [full(p[k]) for k in FIELDS])
  out_shapes = (
      [jax.ShapeDtypeStruct((T, B, A), actfeat.dtype),
       jax.ShapeDtypeStruct((T, B, K), tokens.dtype),
       jax.ShapeDtypeStruct((B, D), deter_prev.dtype),
       jax.ShapeDtypeStruct((B, L), stoch_prev.dtype)] +
      [jax.ShapeDtypeStruct(p[k].shape, p[k].dtype) for k in FIELDS])
  out_specs = (
      [rev(A), rev(K), full(out_shapes[2]), full(out_shapes[3])] +
      [full(p[k]) for k in FIELDS])
  scratch = ([pltpu.VMEM((B, D), f32), pltpu.VMEM((B, L), f32)] +
             [pltpu.VMEM(p[k].shape, f32) for k in FIELDS])
  grads = pl.pallas_call(
      kernel,
      grid=(T,),
      out_shape=tuple(out_shapes),
      in_specs=in_specs,
      out_specs=tuple(out_specs),
      scratch_shapes=scratch,
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=int(5 * weight_bytes + (1 << 25))),
      interpret=interpret,
  )(actfeat, tokens, keepmask, deter_prev, stoch_prev,
    ddeter, dstoch, dlogit, *params)
  # Kernel output order is (dact, dtok, ddeter0, dstoch0, *dweights).
  return grads[2], grads[3], grads[0], grads[1], tuple(grads[4:])


# --- XLA reference (tests + sampling parity) -------------------------------


def reference_observe_seq(deter0, stoch0, actfeat, tokens, keepmask,
                          params, hard_seq, C, unimix=0.01, eps=1e-4):
  """Replays the kernel's sampled one-hots `hard_seq` (T, B, L) through
  the XLA step math with the straight-through probability attachment, so
  autodiff of this function is the numerical reference for the backward
  kernel. Returns time-major (deter_seq, stoch_seq, logit_seq)."""
  B, L = stoch0.shape
  cdt = deter0.dtype

  def step(carry, inp):
    deter, stoch = carry
    act, tok, mask, hard = inp
    m = mask[:, None]
    deter = (deter.astype(f32) * m).astype(cdt)
    stoch = (stoch.astype(f32) * m).astype(cdt)
    act = (act.astype(f32) * m).astype(cdt)
    new, logit = observelib.reference_obs_step(
        deter, stoch, act, tok, params, eps)
    z3 = logit.astype(f32).reshape(B, -1, C)
    probs, _ = _sample_probs(z3, unimix)
    hard3 = hard.astype(f32).reshape(B, -1, C)
    sample = probs + jax.lax.stop_gradient(hard3 - probs)
    sample_flat = sample.reshape(B, L).astype(cdt)
    return (new, sample_flat), (new, sample_flat, logit)

  _, (dseq, sseq, lseq) = jax.lax.scan(
      step, (deter0, stoch0), (actfeat, tokens, keepmask, hard_seq))
  return dseq, sseq, lseq


# --- Custom-VJP entry point ------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def observe_seq(deter0, stoch0, actfeat, tokens, keepmask, gumbels, params,
                g, S, C, unimix=0.01):
  """Fused whole-window observe. Time-major (T, B, .) inputs; `gumbels`
  is (T, B, S*C) f32 Gumbel noise from jax.random. Returns time-major
  (deter_seq, stoch_seq, logit_seq); stoch_seq carries straight-through
  gradients of the class probabilities."""
  return fused_observe_seq(
      deter0, stoch0, actfeat, tokens, keepmask, gumbels, tuple(params),
      g=g, S=S, C=C, unimix=unimix)


def _seq_fwd(deter0, stoch0, actfeat, tokens, keepmask, gumbels, params,
             g, S, C, unimix):
  out = observe_seq(
      deter0, stoch0, actfeat, tokens, keepmask, gumbels, params,
      g, S, C, unimix)
  deter_seq, stoch_seq, logit_seq = out
  return out, (deter0, stoch0, actfeat, tokens, keepmask,
               deter_seq, stoch_seq, params)


def _seq_bwd(g, S, C, unimix, residuals, grads):
  (deter0, stoch0, actfeat, tokens, keepmask,
   deter_seq, stoch_seq, params) = residuals
  ddeter, dstoch, dlogit = grads
  deter_prev = jnp.concatenate([deter0[None], deter_seq[:-1]], 0)
  stoch_prev = jnp.concatenate([stoch0[None], stoch_seq[:-1]], 0)
  dd0, ds0, dact, dtok, dparams = fused_observe_seq_bwd(
      deter_prev, stoch_prev, actfeat, tokens, keepmask, tuple(params),
      ddeter, dstoch, dlogit, g=g, S=S, C=C, unimix=unimix)
  return (dd0, ds0, dact, dtok, jnp.zeros_like(keepmask),
          jnp.zeros(stoch_seq.shape, f32), dparams)


observe_seq.defvjp(_seq_fwd, _seq_bwd)
