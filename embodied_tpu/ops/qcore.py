"""int8 weight-streaming prototype for the RSSM observe window.

Motivation (COVERAGE.md size200m roofline): at size200m the observe scan
is bandwidth-bound — every BPTT step re-streams ~139 MB of bf16 core +
posterior weights from HBM, ~8.9 GB per 64-step window, an ~11 ms floor
at v5e HBM bandwidth before any compute. The grid-over-time window
kernel (ops/observe_seq.py) fixes this at sizes whose weights fit VMEM
by fetching them ONCE per window, but 139 MB of bf16 does not fit the
~128 MB VMEM of a v5e core. In int8 the same weights are ~70 MB — they
fit. This module prototypes that design:

  - per-output-column symmetric int8 quantization of the seven weight
    matrices (w0, w1, wblk, win, wg, wo, wl); biases and norm scales
    stay exact,
  - a forward observe-window kernel identical to observe_seq's except
    matmuls run through `qmm`: the int8 block is cast to bf16 (a cast,
    not a multiply — column scales commute with the matmul, so the
    scaling applies to the small (B, cols) OUTPUT instead of the big
    weight), in column chunks so the bf16 temp stays bounded,
  - an XLA reference over the dequantized weights for parity tests.

Forward-only by design: this is the weight-streaming direction probe the
round-4 verdict asked for, not a training path — the backward at
size200m additionally needs f32 weight-gradient accumulators (278 MB)
which must be FSDP-sharded (see tools/fsdp_bytes.py for that half of
the argument). Numbers and the resulting direction live in COVERAGE.md.

Reference anchors: /root/reference/dreamerv3/rssm.py:61-118 (observe
math); quantization scheme follows standard per-channel symmetric int8.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import observe_seq as seqlib
from .blockgru import _silu

f32 = jnp.float32
bf16 = jnp.bfloat16

FIELDS = seqlib.FIELDS  # core 12 + wo, bo, so, wl, bl
QUANT = ('w0', 'w1', 'wblk', 'win', 'wg', 'wo', 'wl')


def quantize_params(params):
  """Per-output-column symmetric int8. Returns (qparams, scales): the
  param tuple with QUANT entries replaced by int8 arrays, plus a dict of
  f32 column-scale vectors keyed by field name."""
  p = dict(zip(FIELDS, params))
  scales = {}
  out = []
  for name in FIELDS:
    w = p[name]
    if name not in QUANT:
      out.append(w)
      continue
    w = jnp.asarray(w, f32)
    absmax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)  # per out column
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out.append(q)
    scales[name] = scale.squeeze(-2).astype(f32)
  return tuple(out), scales


def dequantize_params(qparams, scales, dtype=bf16):
  """Exact dequantized weights (the numerical reference target)."""
  p = dict(zip(FIELDS, qparams))
  out = []
  for name in FIELDS:
    w = p[name]
    if name not in QUANT:
      out.append(w)
      continue
    scale = scales[name][..., None, :] if w.ndim == 3 else scales[name]
    out.append((w.astype(f32) * scale).astype(dtype))
  return tuple(out)


def _qmm(x, wq, scale, nch):
  """x @ dequant(wq) with column-chunked casting: the bf16 temp is one
  (K, N/nch) block at a time, and the column scales multiply the small
  output instead of the weight."""
  N = wq.shape[-1]
  ch = N // nch
  outs = []
  for c in range(nch):
    sl = slice(c * ch, (c + 1) * ch)
    wb = wq[:, sl].astype(bf16)
    y = jnp.dot(x, wb, preferred_element_type=f32)
    outs.append(y * scale[sl].astype(f32))
  return jnp.concatenate(outs, -1) if nch > 1 else outs[0]


def _q_step(deter, stoch, act, tok, p, s, g, eps, nch):
  """Forward core + posterior head on int8 weights. Mirrors
  observe_seq._fwd_step with _qmm in place of jnp.dot."""
  B, D = deter.shape
  dg = D // g
  cdt = deter.dtype
  rms = seqlib._rms
  xd = _silu(rms(_qmm(deter, p['w0'], s['w0'], nch) + p['b0'],
                 p['s0'], eps)).astype(cdt)
  x0 = _silu(rms(_qmm(stoch, p['w1'], s['w1'], nch) + p['b1'],
                 p['s1'], eps)).astype(cdt)
  x = jnp.concatenate([xd, x0, act], -1)
  hs = [_qmm(deter[:, b * dg:(b + 1) * dg], p['wblk'][b], s['wblk'][b], 1)
        for b in range(g)]
  h = jnp.concatenate(hs, -1) + p['bblk']
  h = h + _qmm(x, p['win'], s['win'], nch)
  h = _silu(rms(h, p['sh'], eps)).astype(cdt)
  gs = [_qmm(h[:, b * dg:(b + 1) * dg], p['wg'][b], s['wg'][b], 1)
        for b in range(g)]
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
  D_ = D
  pre = (_qmm(new, p['wo'][:D_], s['wo'], nch) +
         _qmm(tok, p['wo'][D_:], s['wo'], nch) + p['bo'])
  xo = _silu(rms(pre, p['so'], eps)).astype(cdt)
  logit = _qmm(xo, p['wl'], s['wl'], 1) + p['bl'].astype(f32)
  return new, logit


def _q_kernel(act_ref, tok_ref, mask_ref, gum_ref, deter0_ref, stoch0_ref,
              *rest, g, eps, unimix, S, C, nch, nscale):
  nw = len(FIELDS)
  wrefs = rest[:nw]
  srefs = rest[nw:nw + nscale]
  deter_out, stoch_out, logit_out = rest[nw + nscale:nw + nscale + 3]
  sd, ss = rest[nw + nscale + 3:]
  t = pl.program_id(0)

  @pl.when(t == 0)
  def _():
    sd[:] = deter0_ref[:]
    ss[:] = stoch0_ref[:]

  cdt = sd.dtype
  mask = mask_ref[t][:, None]
  deter = (sd[:].astype(f32) * mask).astype(cdt)
  stoch = (ss[:].astype(f32) * mask).astype(cdt)
  act = (act_ref[0].astype(f32) * mask).astype(cdt)
  tok = tok_ref[0]
  p = dict(zip(FIELDS, [r[:] for r in wrefs]))
  s = dict(zip(QUANT, [r[:] for r in srefs]))
  new, logit = _q_step(deter, stoch, act, tok, p, s, g, eps, nch)
  L = S * C
  pos, same = seqlib._group_ids(L, C)
  probs, _ = seqlib._seg_softmax_flat(logit, pos, same, C, unimix)
  y = jnp.log(probs) + gum_ref[0].astype(f32)
  hard = seqlib._seg_argmax_onehot(y, pos, same, C, cdt)
  deter_out[0] = new
  stoch_out[0] = hard
  logit_out[0] = logit
  sd[:] = new
  ss[:] = hard


@functools.partial(jax.jit, static_argnames=(
    'g', 'eps', 'unimix', 'S', 'C', 'nch', 'interpret'))
def qobs_window(deter0, stoch0, actfeat, tokens, keepmask, gumbels,
                qparams, scales, g, S, C, eps=1e-4, unimix=0.01, nch=4,
                interpret=False):
  """Forward observe window over int8-resident weights. Same contract as
  observe_seq.fused_observe_seq (time-major inputs/outputs); `scales`
  is the dict from quantize_params."""
  p = dict(zip(FIELDS, qparams))
  scale_list = [scales[k] for k in QUANT]
  T, B, A = actfeat.shape
  K = tokens.shape[2]
  D = deter0.shape[1]
  L = S * C
  step = lambda dim: pl.BlockSpec(
      (1, B, dim), lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
  full = lambda arr: pl.BlockSpec(
      arr.shape, (lambda t: (0,) * arr.ndim), memory_space=pltpu.VMEM)
  weight_bytes = sum(
      int(np.prod(x.shape)) * jnp.dtype(x.dtype).itemsize
      for x in list(qparams) + scale_list)
  kernel = functools.partial(
      _q_kernel, g=g, eps=eps, unimix=unimix, S=S, C=C, nch=nch,
      nscale=len(scale_list))
  return pl.pallas_call(
      kernel,
      grid=(T,),
      in_specs=([step(A), step(K),
                 pl.BlockSpec((T, B), lambda t: (0, 0),
                              memory_space=pltpu.VMEM),
                 step(L), full(deter0), full(stoch0)] +
                [full(p[k]) for k in FIELDS] +
                [full(sc) for sc in scale_list]),
      out_specs=(step(D), step(L), step(L)),
      scratch_shapes=[
          pltpu.VMEM((B, D), deter0.dtype),
          pltpu.VMEM((B, L), stoch0.dtype),
      ],
      out_shape=(jax.ShapeDtypeStruct((T, B, D), deter0.dtype),
                 jax.ShapeDtypeStruct((T, B, L), stoch0.dtype),
                 jax.ShapeDtypeStruct((T, B, L), jnp.float32)),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=int(weight_bytes + (1 << 26))),
      interpret=interpret,
  )(actfeat, tokens, keepmask, gumbels, deter0, stoch0,
    *qparams, *scale_list)
