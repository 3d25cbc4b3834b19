"""Fused RSSM observe step (core + posterior head) as one Pallas kernel.

Extends the fused block-GRU core (ops/blockgru.py) with the posterior
tail that follows it inside the observe scan (models/dreamerv3/rssm.py
_observe): the hidden projection of [new_deter, tokens], its RMS norm and
SiLU, and the logit projection. Per BPTT step the scan body then launches
ONE kernel for all of the step's matmul work; only the categorical
sampling (straight-through gradients, awkward group-softmax shapes for
Mosaic) remains an XLA fusion.

The concat [deter, tokens] @ wo is computed as two matmuls summed
(deter @ wo_top + tokens @ wo_bot), so the kernel never materializes the
concatenation and the backward splits dx into the deter / token parts by
slicing wo's sublane (row) dimension, which only needs 8/16-row alignment.

Weight layout: the 12 core FIELDS of ops/blockgru.py followed by
  wo (D + K, H), bo (H), so (H)   obs0 + rms scale   (posterior hidden)
  wl (H, L),     bl (L)           obslogit           (L = stoch * classes)

`obs_step` carries the analytic custom VJP; off-TPU both directions run
the XLA reference (numerics validated in tests/test_ops.py style).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import blockgru
from .blockgru import _dsilu, _rms, _rms_bwd, _rms_parts, _silu

f32 = jnp.float32

FIELDS = blockgru.FIELDS + ('wo', 'bo', 'so', 'wl', 'bl')


def reference_obs_step(deter, stoch_flat, actfeat, tokens, params,
                       eps=1e-4):
  """Pure XLA: fused core step plus the posterior obs head."""
  p = dict(zip(FIELDS, params))
  cdt = deter.dtype
  D = deter.shape[-1]
  out = blockgru.reference_step(
      deter, stoch_flat, actfeat, params[:len(blockgru.FIELDS)], eps)
  x = out @ p['wo'][:D] + tokens @ p['wo'][D:] + p['bo']
  x = _silu(_rms(x, p['so'], eps)).astype(cdt)
  logit = (x @ p['wl'] + p['bl']).astype(cdt)
  return out, logit


def _obs_kernel(deter_ref, stoch_ref, act_ref, tok_ref,
                w0_ref, b0_ref, s0_ref, w1_ref, b1_ref, s1_ref,
                wblk_ref, bblk_ref, win_ref, sh_ref, wg_ref, bg_ref,
                wo_ref, bo_ref, so_ref, wl_ref, bl_ref,
                out_ref, logit_ref, *, g, eps):
  B, D = deter_ref.shape
  dg = D // g
  deter = deter_ref[:]
  cdt = deter.dtype
  mm = lambda a, b: jnp.dot(a, b, preferred_element_type=f32)

  # --- Core step (mirrors blockgru._kernel) -------------------------------
  xd = _silu(_rms(
      mm(deter, w0_ref[:]) + b0_ref[:], s0_ref[:], eps)).astype(cdt)
  x0 = _silu(_rms(
      mm(stoch_ref[:], w1_ref[:]) + b1_ref[:], s1_ref[:], eps)).astype(cdt)
  x = jnp.concatenate([xd, x0, act_ref[:]], -1)
  hs = []
  for b in range(g):
    hs.append(mm(deter[:, b * dg:(b + 1) * dg], wblk_ref[b]))
  h = jnp.concatenate(hs, -1) + bblk_ref[:]
  h = h + mm(x, win_ref[:])
  h = _silu(_rms(h, sh_ref[:], eps)).astype(cdt)
  gs = []
  for b in range(g):
    gs.append(mm(h[:, b * dg:(b + 1) * dg], wg_ref[b]))
  gates = jnp.concatenate(gs, -1) + bg_ref[:].astype(f32)
  outs = []
  for b in range(g):
    off = b * 3 * dg
    reset = jax.nn.sigmoid(gates[:, off:off + dg])
    cand = jnp.tanh(reset * gates[:, off + dg:off + 2 * dg])
    update = jax.nn.sigmoid(gates[:, off + 2 * dg:off + 3 * dg] - 1)
    prev = deter[:, b * dg:(b + 1) * dg].astype(f32)
    outs.append(update * cand + (1 - update) * prev)
  new = jnp.concatenate(outs, -1).astype(cdt)
  out_ref[:] = new

  # --- Posterior head: [new, tokens] @ wo as a split matmul ---------------
  pre = mm(new, wo_ref[:D]) + mm(tok_ref[:], wo_ref[D:]) + bo_ref[:]
  xo = _silu(_rms(pre, so_ref[:], eps)).astype(cdt)
  logit_ref[:] = (mm(xo, wl_ref[:]) + bl_ref[:]).astype(cdt)


@functools.partial(jax.jit, static_argnames=('eps', 'interpret'))
def fused_obs_step(deter, stoch_flat, actfeat, tokens, params, eps=1e-4,
                   interpret=False):
  p = dict(zip(FIELDS, params))
  g = p['wblk'].shape[0]
  B, D = deter.shape
  L = p['bl'].shape[0]
  S = stoch_flat.shape[1]
  A = actfeat.shape[1]
  K = tokens.shape[1]
  # Chunk the batch rows over the grid: the f32 gate intermediates alone
  # are 3*D*4 bytes/row, so a monolithic block OOMs scoped VMEM for the
  # large row counts the imagination path produces (B*K rows).
  bk = blockgru._chunk(B)
  row = lambda dim: pl.BlockSpec(
      (bk, dim), lambda i: (i, 0), memory_space=pltpu.VMEM)
  full = lambda arr: pl.BlockSpec(
      arr.shape, (lambda i: (0,) * arr.ndim), memory_space=pltpu.VMEM)
  kernel = functools.partial(_obs_kernel, g=g, eps=eps)
  weight_bytes = sum(
      int(np.prod(x.shape)) * jnp.dtype(x.dtype).itemsize for x in params)
  return pl.pallas_call(
      kernel,
      grid=(B // bk,),
      out_shape=(jax.ShapeDtypeStruct((B, D), deter.dtype),
                 jax.ShapeDtypeStruct((B, L), deter.dtype)),
      in_specs=([row(D), row(S), row(A), row(K)] +
                [full(p[k]) for k in FIELDS]),
      out_specs=(row(D), row(L)),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=int(weight_bytes + (1 << 24))),
      interpret=interpret,
  )(deter, stoch_flat, actfeat, tokens, *params)


def _obs_bwd_kernel(deter_ref, stoch_ref, act_ref, tok_ref,
                    dout_ref, dlogit_ref,
                    w0_ref, b0_ref, s0_ref, w1_ref, b1_ref, s1_ref,
                    wblk_ref, bblk_ref, win_ref, sh_ref, wg_ref, bg_ref,
                    wo_ref, bo_ref, so_ref, wl_ref, bl_ref,
                    ddeter_ref, dstoch_ref, dact_ref, dtok_ref,
                    dw0_ref, db0_ref, ds0_ref, dw1_ref, db1_ref, ds1_ref,
                    dwblk_ref, dbblk_ref, dwin_ref, dsh_ref, dwg_ref,
                    dbg_ref, dwo_ref, dbo_ref, dso_ref, dwl_ref, dbl_ref,
                    aw0, ab0, as0, aw1, ab1, as1,
                    awblk, abblk, awin, ash, awg, abg,
                    awo, abo, aso, awl, abl,
                    *, g, eps):
  """Analytic backward: recomputes the forward in VMEM, then runs the
  posterior-head backward followed by the core backward. One batch chunk
  per grid step; weight grads accumulate in f32 scratch."""
  i = pl.program_id(0)
  n_i = pl.num_programs(0)
  scratches = (aw0, ab0, as0, aw1, ab1, as1, awblk, abblk, awin, ash,
               awg, abg, awo, abo, aso, awl, abl)

  @pl.when(i == 0)
  def _():
    for ref in scratches:
      ref[...] = jnp.zeros_like(ref)

  deter = deter_ref[:]
  cdt = deter.dtype
  B, D = deter.shape
  dg = D // g
  H = b0_ref.shape[0]
  mm = lambda a, b: jnp.dot(a, b, preferred_element_type=f32)
  mmT = lambda a, b: jax.lax.dot_general(
      a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32)
  mmBT = lambda a, b: jax.lax.dot_general(
      a, b, (((1,), (1,)), ((), ())), preferred_element_type=f32)

  # --- Forward recompute --------------------------------------------------
  pre0 = mm(deter, w0_ref[:]) + b0_ref[:].astype(f32)
  n0, rstd0 = _rms_parts(pre0, eps)
  y0 = n0 * s0_ref[:].astype(f32)
  xd = _silu(y0)
  pre1 = mm(stoch_ref[:], w1_ref[:]) + b1_ref[:].astype(f32)
  n1, rstd1 = _rms_parts(pre1, eps)
  y1 = n1 * s1_ref[:].astype(f32)
  x0 = _silu(y1)
  x = jnp.concatenate(
      [xd.astype(cdt), x0.astype(cdt), act_ref[:]], -1)
  hbs = []
  for b in range(g):
    hbs.append(mm(deter[:, b * dg:(b + 1) * dg], wblk_ref[b]))
  hpre = jnp.concatenate(hbs, -1) + bblk_ref[:].astype(f32)
  hpre = hpre + mm(x, win_ref[:])
  nh, rstdh = _rms_parts(hpre, eps)
  yh = nh * sh_ref[:].astype(f32)
  h = _silu(yh)
  hc = h.astype(cdt)
  deter32 = deter.astype(f32)

  # Gate forward values (per block) are needed both to form the new deter
  # (input to the obs head) and for the gate backward below.
  rs, cs, us = [], [], []
  news = []
  for b in range(g):
    sl = slice(b * dg, (b + 1) * dg)
    gates = mm(hc[:, sl], wg_ref[b]) + bg_ref[
        b * 3 * dg:(b + 1) * 3 * dg].astype(f32)
    r = jax.nn.sigmoid(gates[:, :dg])
    c = jnp.tanh(r * gates[:, dg:2 * dg])
    u = jax.nn.sigmoid(gates[:, 2 * dg:] - 1)
    rs.append(r)
    cs.append((c, gates[:, dg:2 * dg]))
    us.append(u)
    news.append(u * c + (1 - u) * deter32[:, sl])
  new32 = jnp.concatenate(news, -1)
  newc = new32.astype(cdt)

  # --- Posterior head recompute + backward --------------------------------
  preo = mm(newc, wo_ref[:D]) + mm(tok_ref[:], wo_ref[D:]) + (
      bo_ref[:].astype(f32))
  no, rstdo = _rms_parts(preo, eps)
  yo = no * so_ref[:].astype(f32)
  xo = _silu(yo)
  xoc = xo.astype(cdt)

  dlogit = dlogit_ref[:].astype(f32)
  abl[...] += jnp.sum(dlogit, 0)
  dlogit_c = dlogit.astype(cdt)
  awl[...] += mmT(xoc, dlogit_c)
  dxo = mmBT(dlogit_c, wl_ref[:])
  dyo = dxo * _dsilu(yo)
  aso[...] += jnp.sum(dyo * no, 0)
  dpreo = _rms_bwd(dyo * so_ref[:].astype(f32), no, rstdo)
  abo[...] += jnp.sum(dpreo, 0)
  dpreo_c = dpreo.astype(cdt)
  awo[:D] += mmT(newc, dpreo_c)
  awo[D:] += mmT(tok_ref[:], dpreo_c)
  dtok_ref[:] = mmBT(dpreo_c, wo_ref[D:]).astype(cdt)
  # Total gradient flowing into the new deter state: the caller's dout
  # (recurrent + direct uses) plus the obs head's contribution.
  dout = dout_ref[:].astype(f32) + mmBT(dpreo_c, wo_ref[:D])

  # --- Gate backward ------------------------------------------------------
  dh_parts, ddeter_parts = [], []
  for b in range(g):
    sl = slice(b * dg, (b + 1) * dg)
    r = rs[b]
    c, gc = cs[b]
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
    dh_parts.append(mmBT(dgates_c, wg_ref[b]))
  dh = jnp.concatenate(dh_parts, -1)
  ddeter = jnp.concatenate(ddeter_parts, -1)

  # --- Hidden layer backward ----------------------------------------------
  dyh = dh * _dsilu(yh)
  ash[...] += jnp.sum(dyh * nh, 0)
  dhpre = _rms_bwd(dyh * sh_ref[:].astype(f32), nh, rstdh)
  abblk[...] += jnp.sum(dhpre, 0)
  dhpre_c = dhpre.astype(cdt)
  dblk_parts = []
  for b in range(g):
    sl = slice(b * dg, (b + 1) * dg)
    awblk[b] += mmT(deter[:, sl], dhpre_c[:, sl])
    dblk_parts.append(mmBT(dhpre_c[:, sl], wblk_ref[b]))
  ddeter = ddeter + jnp.concatenate(dblk_parts, -1)
  awin[...] += mmT(x, dhpre_c)
  dx = mmBT(dhpre_c, win_ref[:])

  # --- Input projection backwards -----------------------------------------
  dxd, dx0, dact = dx[:, :H], dx[:, H:2 * H], dx[:, 2 * H:]
  dy0 = dxd * _dsilu(y0)
  as0[...] += jnp.sum(dy0 * n0, 0)
  dpre0 = _rms_bwd(dy0 * s0_ref[:].astype(f32), n0, rstd0)
  ab0[...] += jnp.sum(dpre0, 0)
  dpre0_c = dpre0.astype(cdt)
  aw0[...] += mmT(deter, dpre0_c)
  ddeter = ddeter + mmBT(dpre0_c, w0_ref[:])

  dy1 = dx0 * _dsilu(y1)
  as1[...] += jnp.sum(dy1 * n1, 0)
  dpre1 = _rms_bwd(dy1 * s1_ref[:].astype(f32), n1, rstd1)
  ab1[...] += jnp.sum(dpre1, 0)
  dpre1_c = dpre1.astype(cdt)
  aw1[...] += mmT(stoch_ref[:], dpre1_c)
  dstoch = mmBT(dpre1_c, w1_ref[:])

  ddeter_ref[:] = ddeter.astype(cdt)
  dstoch_ref[:] = dstoch.astype(cdt)
  dact_ref[:] = dact.astype(cdt)

  @pl.when(i == n_i - 1)
  def _():
    outs = (dw0_ref, db0_ref, ds0_ref, dw1_ref, db1_ref, ds1_ref,
            dwblk_ref, dbblk_ref, dwin_ref, dsh_ref, dwg_ref, dbg_ref,
            dwo_ref, dbo_ref, dso_ref, dwl_ref, dbl_ref)
    for out, acc in zip(outs, scratches):
      out[...] = acc[...].astype(out.dtype)


@functools.partial(jax.jit, static_argnames=('eps', 'interpret'))
def fused_obs_bwd(deter, stoch_flat, actfeat, tokens, params, dout, dlogit,
                  eps=1e-4, interpret=False):
  """Returns (ddeter, dstoch, dactfeat, dtokens, dparams)."""
  p = dict(zip(FIELDS, params))
  g = p['wblk'].shape[0]
  B, D = deter.shape
  bk = blockgru._chunk(B)
  kernel = functools.partial(_obs_bwd_kernel, g=g, eps=eps)
  row = lambda dim: pl.BlockSpec(
      (bk, dim), lambda i: (i, 0), memory_space=pltpu.VMEM)
  full = lambda arr: pl.BlockSpec(
      arr.shape, (lambda i: (0,) * arr.ndim), memory_space=pltpu.VMEM)
  S = stoch_flat.shape[1]
  A = actfeat.shape[1]
  K = tokens.shape[1]
  L = p['bl'].shape[0]
  in_specs = ([row(D), row(S), row(A), row(K), row(D), row(L)] +
              [full(p[k]) for k in FIELDS])
  out_shapes = (
      [jax.ShapeDtypeStruct((B, D), deter.dtype),
       jax.ShapeDtypeStruct((B, S), stoch_flat.dtype),
       jax.ShapeDtypeStruct((B, A), actfeat.dtype),
       jax.ShapeDtypeStruct((B, K), tokens.dtype)] +
      [jax.ShapeDtypeStruct(p[k].shape, p[k].dtype) for k in FIELDS])
  out_specs = ([row(D), row(S), row(A), row(K)] +
               [full(p[k]) for k in FIELDS])
  scratch = [pltpu.VMEM(p[k].shape, f32) for k in FIELDS]
  weight_bytes = sum(
      int(np.prod(x.shape)) * jnp.dtype(x.dtype).itemsize for x in params)
  grads = pl.pallas_call(
      kernel,
      grid=(B // bk,),
      out_shape=tuple(out_shapes),
      in_specs=in_specs,
      out_specs=tuple(out_specs),
      scratch_shapes=scratch,
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=int(5 * weight_bytes + (1 << 25))),
      interpret=interpret,
  )(deter, stoch_flat, actfeat, tokens, dout, dlogit, *params)
  return grads[0], grads[1], grads[2], grads[3], tuple(grads[4:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def obs_step(deter, stoch_flat, actfeat, tokens, params, use_pallas=False):
  """Fused observe step with custom VJP. Returns (new_deter, logits)."""
  if use_pallas:
    return fused_obs_step(deter, stoch_flat, actfeat, tokens, tuple(params))
  return reference_obs_step(deter, stoch_flat, actfeat, tokens, params)


def _obs_fwd(deter, stoch_flat, actfeat, tokens, params, use_pallas):
  out = obs_step(deter, stoch_flat, actfeat, tokens, params, use_pallas)
  return out, (deter, stoch_flat, actfeat, tokens, params)


def _obs_bwd(use_pallas, residuals, grads):
  deter, stoch_flat, actfeat, tokens, params = residuals
  dout, dlogit = grads
  if use_pallas:
    dd, ds, da, dt, dp = fused_obs_bwd(
        deter, stoch_flat, actfeat, tokens, tuple(params), dout, dlogit)
    return dd, ds, da, dt, dp
  _, vjp = jax.vjp(
      reference_obs_step, deter, stoch_flat, actfeat, tokens, params)
  return vjp((dout, dlogit))


obs_step.defvjp(_obs_fwd, _obs_bwd)
