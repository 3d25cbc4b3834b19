"""Fused block-diagonal GRU core step as a Pallas TPU kernel.

The RSSM core (models/dreamerv3/rssm.py _core) is the hot recurrence of
DreamerV3: per step it runs two input projections with RMS norms, a first
hidden layer that is block-diagonal on the recurrent state plus dense on
the shared features, and a block-diagonal gate layer. Under lax.scan XLA
emits each op separately per step; this kernel fuses the whole step into
one pallas_call, so per step the only HBM round trips are the state and
weights, with every intermediate staying in VMEM.

`core_step` carries an analytic custom VJP: the forward runs the Pallas
kernel (or the XLA reference off-TPU), and on TPU the backward runs a
second fused Pallas kernel (`fused_core_bwd`) that recomputes the forward
intermediates in VMEM and produces all input and weight gradients in one
launch — one kernel instead of the ~40 small XLA fusions that
differentiating the unfused step emits per BPTT iteration. Off-TPU the
backward falls back to differentiating `reference_step`, which is the
_core math verbatim; the two backwards agree up to bf16 matmul rounding
(validated in tests/test_ops.py).

Weight layout (mirrors rssm.RSSM params; all matmuls run in the compute
dtype with f32 accumulation):
  w0 (D, H),  b0 (H),  s0 (H)    dynin0 + rms scale     (deter proj)
  w1 (S, H),  b1 (H),  s1 (H)    dynin1 + rms scale     (stoch proj)
  wblk (g, Dg, Dg), bblk (D)     dynhid0blk             (block hidden)
  win (3H, D)                    dynhid0in (no bias)    (dense hidden)
  sh (D)                         dynhid0norm rms scale
  wg (g, Dg, 3*Dg), bg (3D)      dyngru                 (gates)
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32

FIELDS = ('w0', 'b0', 's0', 'w1', 'b1', 's1',
          'wblk', 'bblk', 'win', 'sh', 'wg', 'bg')


def _rms(x, scale, eps=1e-4):
  x = x.astype(f32)
  mult = jax.lax.rsqrt(jnp.square(x).mean(-1, keepdims=True) + eps)
  return x * mult * scale.astype(f32)


def _silu(x):
  return x * jax.nn.sigmoid(x)


def reference_step(deter, stoch_flat, actfeat, params, eps=1e-4):
  """Pure XLA implementation; the numerical reference for the kernel and
  the recompute path of the custom VJP. Mirrors rssm.RSSM._core."""
  p = dict(zip(FIELDS, params))
  cdt = deter.dtype
  g, dg, _ = p['wblk'].shape
  B, D = deter.shape
  xd = _silu(_rms(deter @ p['w0'] + p['b0'], p['s0'], eps)).astype(cdt)
  x0 = _silu(_rms(
      stoch_flat @ p['w1'] + p['b1'], p['s1'], eps)).astype(cdt)
  x = jnp.concatenate([xd, x0, actfeat], -1)
  h = jnp.einsum(
      'bgd,gdu->bgu', deter.reshape(B, g, dg), p['wblk']).reshape(B, D)
  h = h + p['bblk'] + x @ p['win']
  h = _silu(_rms(h, p['sh'], eps)).astype(cdt)
  gates = jnp.einsum('bgd,gdu->bgu', h.reshape(B, g, dg), p['wg'])
  gates = gates.reshape(B, 3 * D) + p['bg']
  reset, cand, update = [
      y.reshape(B, D) for y in jnp.split(gates.reshape(B, g, 3 * dg), 3, -1)]
  reset = jax.nn.sigmoid(reset)
  cand = jnp.tanh(reset * cand)
  update = jax.nn.sigmoid(update - 1)
  return (update * cand + (1 - update) * deter).astype(cdt)


def _kernel(deter_ref, stoch_ref, act_ref, w0_ref, b0_ref, s0_ref,
            w1_ref, b1_ref, s1_ref, wblk_ref, bblk_ref, win_ref, sh_ref,
            wg_ref, bg_ref, out_ref, *, g, eps):
  B, D = deter_ref.shape
  dg = D // g
  deter = deter_ref[:]
  cdt = deter.dtype
  xd = _silu(_rms(
      jnp.dot(deter, w0_ref[:], preferred_element_type=f32) + b0_ref[:],
      s0_ref[:], eps)).astype(cdt)
  x0 = _silu(_rms(
      jnp.dot(stoch_ref[:], w1_ref[:], preferred_element_type=f32)
      + b1_ref[:], s1_ref[:], eps)).astype(cdt)
  x = jnp.concatenate([xd, x0, act_ref[:]], -1)

  # Hidden: block-diagonal on deter (g static, unrolled at trace time)
  # plus one dense matmul on the shared features.
  hs = []
  for b in range(g):
    hs.append(jnp.dot(
        deter[:, b * dg:(b + 1) * dg], wblk_ref[b],
        preferred_element_type=f32))
  h = jnp.concatenate(hs, -1) + bblk_ref[:]
  h = h + jnp.dot(x, win_ref[:], preferred_element_type=f32)
  h = _silu(_rms(h, sh_ref[:], eps)).astype(cdt)

  # Gates: per-block matmuls concatenated to (B, 3D) so the flat bias adds
  # with a plain 1-D broadcast (Mosaic cannot reshape vectors across
  # lanes), then per-block column slices for the gate nonlinearities.
  gs = []
  for b in range(g):
    gs.append(jnp.dot(
        h[:, b * dg:(b + 1) * dg], wg_ref[b], preferred_element_type=f32))
  gates = jnp.concatenate(gs, -1) + bg_ref[:].astype(f32)
  outs = []
  for b in range(g):
    off = b * 3 * dg
    reset = jax.nn.sigmoid(gates[:, off:off + dg])
    cand = jnp.tanh(reset * gates[:, off + dg:off + 2 * dg])
    update = jax.nn.sigmoid(gates[:, off + 2 * dg:off + 3 * dg] - 1)
    prev = deter[:, b * dg:(b + 1) * dg].astype(f32)
    outs.append(update * cand + (1 - update) * prev)
  out_ref[:] = jnp.concatenate(outs, -1).astype(cdt)


@functools.partial(jax.jit, static_argnames=('eps', 'interpret'))
def fused_core_step(deter, stoch_flat, actfeat, params, eps=1e-4,
                    interpret=False):
  """One fused core step via Pallas. Shapes as in reference_step."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu
  p = dict(zip(FIELDS, params))
  g = p['wblk'].shape[0]
  B, D = deter.shape
  S = stoch_flat.shape[1]
  A = actfeat.shape[1]
  # Chunk batch rows over the grid: the f32 gate intermediates are
  # 3*D*4 bytes/row, so a monolithic block OOMs scoped VMEM at the row
  # counts the imagination path produces (B*K rows).
  bk = _chunk(B)
  row = lambda dim: pl.BlockSpec(
      (bk, dim), lambda i: (i, 0), memory_space=pltpu.VMEM)
  full = lambda arr: pl.BlockSpec(
      arr.shape, (lambda i: (0,) * arr.ndim), memory_space=pltpu.VMEM)
  kernel = functools.partial(_kernel, g=g, eps=eps)
  weight_bytes = sum(
      np.prod(x.shape) * jnp.dtype(x.dtype).itemsize for x in params)
  return pl.pallas_call(
      kernel,
      grid=(B // bk,),
      out_shape=jax.ShapeDtypeStruct((B, D), deter.dtype),
      in_specs=([row(D), row(S), row(A)] + [full(p[k]) for k in FIELDS]),
      out_specs=row(D),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=int(weight_bytes + (1 << 24))),
      interpret=interpret,
  )(deter, stoch_flat, actfeat, *params)


def _dsilu(y):
  s = jax.nn.sigmoid(y)
  return s * (1 + y * (1 - s))


def _rms_parts(pre, eps):
  rstd = jax.lax.rsqrt(jnp.square(pre).mean(-1, keepdims=True) + eps)
  return pre * rstd, rstd


def _rms_bwd(dn, n, rstd):
  return rstd * (dn - n * (dn * n).mean(-1, keepdims=True))


def _bwd_kernel(deter_ref, stoch_ref, act_ref, dout_ref,
                w0_ref, b0_ref, s0_ref, w1_ref, b1_ref, s1_ref,
                wblk_ref, bblk_ref, win_ref, sh_ref, wg_ref, bg_ref,
                ddeter_ref, dstoch_ref, dact_ref,
                dw0_ref, db0_ref, ds0_ref, dw1_ref, db1_ref, ds1_ref,
                dwblk_ref, dbblk_ref, dwin_ref, dsh_ref, dwg_ref, dbg_ref,
                aw0, ab0, as0, aw1, ab1, as1,
                awblk, abblk, awin, ash, awg, abg,
                *, g, eps):
  """Analytic backward of the fused core step, one batch chunk per grid
  step. Weight gradients accumulate across chunks in f32 VMEM scratch and
  are flushed to the outputs on the last chunk."""
  i = pl.program_id(0)
  n_i = pl.num_programs(0)
  scratches = (aw0, ab0, as0, aw1, ab1, as1, awblk, abblk, awin, ash,
               awg, abg)

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
  # a^T @ b (contract the batch dim) and a @ b^T (contract the out dim).
  mmT = lambda a, b: jax.lax.dot_general(
      a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32)
  mmBT = lambda a, b: jax.lax.dot_general(
      a, b, (((1,), (1,)), ((), ())), preferred_element_type=f32)
  dout = dout_ref[:].astype(f32)

  # --- Forward recompute (intermediates stay in VMEM) ---------------------
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

  # --- Gate backward (per block, blocks-major layouts) --------------------
  dh_parts, ddeter_parts = [], []
  for b in range(g):
    sl = slice(b * dg, (b + 1) * dg)
    gates = mm(hc[:, sl], wg_ref[b]) + bg_ref[
        b * 3 * dg:(b + 1) * 3 * dg].astype(f32)
    gr, gc, gu = gates[:, :dg], gates[:, dg:2 * dg], gates[:, 2 * dg:]
    r = jax.nn.sigmoid(gr)
    c = jnp.tanh(r * gc)
    u = jax.nn.sigmoid(gu - 1)
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
            dwblk_ref, dbblk_ref, dwin_ref, dsh_ref, dwg_ref, dbg_ref)
    for out, acc in zip(outs, scratches):
      out[...] = acc[...].astype(out.dtype)


def _chunk(B, limit=128):
  for d in range(min(B, limit), 0, -1):
    if B % d == 0:
      return d
  return B


@functools.partial(jax.jit, static_argnames=('eps', 'interpret'))
def fused_core_bwd(deter, stoch_flat, actfeat, params, dout, eps=1e-4,
                   interpret=False):
  """Fused analytic backward; returns (ddeter, dstoch, dactfeat, dparams).
  Gradient dtypes mirror jax.vjp of reference_step (weight grads in the
  weight dtype, norm-scale grads f32)."""
  p = dict(zip(FIELDS, params))
  g = p['wblk'].shape[0]
  B, D = deter.shape
  bk = _chunk(B)
  kernel = functools.partial(_bwd_kernel, g=g, eps=eps)
  row = lambda dim: pl.BlockSpec(
      (bk, dim), lambda i: (i, 0), memory_space=pltpu.VMEM)
  full = lambda arr: pl.BlockSpec(
      arr.shape, (lambda i: (0,) * arr.ndim), memory_space=pltpu.VMEM)
  S = stoch_flat.shape[1]
  A = actfeat.shape[1]
  in_specs = [row(D), row(S), row(A), row(D)] + [full(p[k]) for k in FIELDS]
  out_shapes = (
      [jax.ShapeDtypeStruct((B, D), deter.dtype),
       jax.ShapeDtypeStruct((B, S), stoch_flat.dtype),
       jax.ShapeDtypeStruct((B, A), actfeat.dtype)] +
      [jax.ShapeDtypeStruct(p[k].shape, p[k].dtype) for k in FIELDS])
  out_specs = [row(D), row(S), row(A)] + [full(p[k]) for k in FIELDS]
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
  )(deter, stoch_flat, actfeat, dout, *params)
  return grads[0], grads[1], grads[2], tuple(grads[3:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def core_step(deter, stoch_flat, actfeat, params, use_pallas=False):
  """Core step with a fused custom VJP. Forward runs the fused Pallas
  kernel on TPU (`use_pallas=True`) with a fused analytic Pallas backward;
  off-TPU both directions go through the XLA reference."""
  if use_pallas:
    return fused_core_step(deter, stoch_flat, actfeat, tuple(params))
  return reference_step(deter, stoch_flat, actfeat, params)


def _core_fwd(deter, stoch_flat, actfeat, params, use_pallas):
  out = core_step(deter, stoch_flat, actfeat, params, use_pallas)
  return out, (deter, stoch_flat, actfeat, params)


def _core_bwd(use_pallas, residuals, grad):
  deter, stoch_flat, actfeat, params = residuals
  if use_pallas:
    ddeter, dstoch, dact, dparams = fused_core_bwd(
        deter, stoch_flat, actfeat, tuple(params), grad)
    return ddeter, dstoch, dact, dparams
  _, vjp = jax.vjp(reference_step, deter, stoch_flat, actfeat, params)
  return vjp(grad)


core_step.defvjp(_core_fwd, _core_bwd)


def supported(params, max_vmem_bytes=12 * 1024 * 1024):
  """Whether the weights fit comfortably in VMEM for the fused kernel."""
  weight_bytes = sum(
      int(np.prod(p.shape)) * jnp.dtype(p.dtype).itemsize for p in params)
  return weight_bytes <= max_vmem_bytes


def on_tpu():
  try:
    return jax.devices()[0].platform in ('tpu', 'axon')
  except Exception:
    return False
