"""Fused block-diagonal GRU core step as a Pallas TPU kernel.

The RSSM core (models/dreamerv3/rssm.py _core) is the hot recurrence of
DreamerV3: per step it runs two input projections with RMS norms, a first
hidden layer that is block-diagonal on the recurrent state plus dense on
the shared features, and a block-diagonal gate layer. Under lax.scan XLA
emits each op separately per step; this kernel fuses the whole step into
one pallas_call, so per step the only HBM round trips are the state and
weights, with every intermediate staying in VMEM.

`core_step` carries an exact custom VJP: the forward runs the Pallas
kernel (or the XLA reference off-TPU), the backward recomputes through
`reference_step` — which is the _core math verbatim — so gradients are
identical to differentiating the XLA path. This makes the kernel safe on
every call site, including the BPTT observe scan.

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
  vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
  kernel = functools.partial(_kernel, g=g, eps=eps)
  weight_bytes = sum(
      np.prod(x.shape) * jnp.dtype(x.dtype).itemsize for x in params)
  return pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct((B, D), deter.dtype),
      in_specs=[vmem() for _ in range(3 + len(FIELDS))],
      out_specs=vmem(),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=int(weight_bytes + (1 << 24))),
      interpret=interpret,
  )(deter, stoch_flat, actfeat, *params)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def core_step(deter, stoch_flat, actfeat, params, use_pallas=False):
  """Core step with an exact VJP. Forward runs the fused Pallas kernel on
  TPU (`use_pallas=True`); backward always recomputes through the XLA
  reference, so gradients match the unfused path bit-for-bit."""
  if use_pallas:
    return fused_core_step(deter, stoch_flat, actfeat, tuple(params))
  return reference_step(deter, stoch_flat, actfeat, params)


def _core_fwd(deter, stoch_flat, actfeat, params, use_pallas):
  out = core_step(deter, stoch_flat, actfeat, params, use_pallas)
  return out, (deter, stoch_flat, actfeat, params)


def _core_bwd(use_pallas, residuals, grad):
  deter, stoch_flat, actfeat, params = residuals
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
