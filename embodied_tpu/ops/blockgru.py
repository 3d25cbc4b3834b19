"""Fused block-diagonal GRU core step as a Pallas TPU kernel.

The RSSM core (models/dreamerv3/rssm.py _core) is the hot recurrence of
DreamerV3 training and acting: per step it runs two input projections with
RMS norms, a block-diagonal hidden layer, and a block-diagonal gate layer.
Under lax.scan XLA emits each op separately per step; this kernel fuses the
whole step into one pallas_call that keeps every weight resident in VMEM,
so the only HBM traffic per step is the (B, D) state in and out.

Used on the forward-only paths (policy acting and imagination rollouts,
whose outputs are stop-gradiented by the caller); training's observe scan
keeps the XLA path for autodiff. Falls back to pure XLA off-TPU.

Weight layout (all bf16 in VMEM):
  w0 (D, H), s0 (H)      deter projection + rms scale
  w1 (S, H), s1 (H)      stoch projection + rms scale
  wh (g, Din, Dg), sh (D)  block hidden, Din = D/g + 3H, Dg = D/g
  wg (g, Dg, 3*Dg)       block gates (reset, cand, update)
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

f32 = jnp.float32


def _rms(x, scale, eps=1e-4):
  x = x.astype(f32)
  mult = jax.lax.rsqrt(jnp.square(x).mean(-1, keepdims=True) + eps)
  return x * mult * scale.astype(f32)


def _silu(x):
  return x * jax.nn.sigmoid(x)


def reference_step(deter, stoch_flat, actfeat, params, eps=1e-4):
  """Pure XLA implementation (also the numerical reference for the kernel)."""
  w0, s0, w1, s1, wh, sh, wg = params
  g, din, dg = wh.shape
  B, D = deter.shape
  x0 = _silu(_rms(deter @ w0, s0, eps)).astype(deter.dtype)
  x1 = _silu(_rms(stoch_flat @ w1, s1, eps)).astype(deter.dtype)
  x = jnp.concatenate([x0, x1, actfeat], -1)
  xg = jnp.concatenate(
      [deter.reshape(B, g, dg), x[:, None, :].repeat(g, 1)], -1)
  h = jnp.einsum('bgi,gij->bgj', xg, wh)
  h = _silu(_rms(h.reshape(B, D), sh, eps)).astype(deter.dtype)
  gates = jnp.einsum('bgi,gij->bgj', h.reshape(B, g, dg), wg)
  reset, cand, update = jnp.split(gates, 3, -1)
  reset = jax.nn.sigmoid(reset.astype(f32))
  cand = jnp.tanh(reset * cand.astype(f32))
  update = jax.nn.sigmoid(update.astype(f32) - 1)
  out = update * cand.reshape(B, g, dg).astype(f32) + (
      1 - update) * deter.reshape(B, g, dg).astype(f32)
  return out.reshape(B, D).astype(deter.dtype)


def _kernel(deter_ref, stoch_ref, act_ref, w0_ref, s0_ref, w1_ref, s1_ref,
            wh_ref, sh_ref, wg_ref, out_ref, *, g, eps):
  B, D = deter_ref.shape
  dg = D // g
  deter = deter_ref[:]
  x0 = _silu(_rms(
      jnp.dot(deter, w0_ref[:], preferred_element_type=f32),
      s0_ref[:], eps))
  x1 = _silu(_rms(
      jnp.dot(stoch_ref[:], w1_ref[:], preferred_element_type=f32),
      s1_ref[:], eps))
  x = jnp.concatenate(
      [x0.astype(deter.dtype), x1.astype(deter.dtype), act_ref[:]], -1)

  # Hidden layer: per-block matmul, accumulated into one (B, D) buffer so
  # the RMS norm sees the full feature row.
  hs = []
  for b in range(g):  # g is static; unrolled at trace time.
    inb = jnp.concatenate([deter[:, b * dg:(b + 1) * dg], x], -1)
    hs.append(jnp.dot(inb, wh_ref[b], preferred_element_type=f32))
  h = jnp.concatenate(hs, -1)
  h = _silu(_rms(h, sh_ref[:], eps)).astype(deter.dtype)

  outs = []
  for b in range(g):
    gates = jnp.dot(
        h[:, b * dg:(b + 1) * dg], wg_ref[b], preferred_element_type=f32)
    reset = jax.nn.sigmoid(gates[:, :dg])
    cand = jnp.tanh(reset * gates[:, dg:2 * dg])
    update = jax.nn.sigmoid(gates[:, 2 * dg:] - 1)
    prev = deter[:, b * dg:(b + 1) * dg].astype(f32)
    outs.append(update * cand + (1 - update) * prev)
  out_ref[:] = jnp.concatenate(outs, -1).astype(deter.dtype)


@functools.partial(jax.jit, static_argnames=('eps', 'interpret'))
def fused_core_step(deter, stoch_flat, actfeat, params, eps=1e-4,
                    interpret=False):
  """One block-GRU core step via Pallas. Shapes as in reference_step."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu
  w0, s0, w1, s1, wh, sh, wg = params
  g = wh.shape[0]
  B, D = deter.shape
  vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
  kernel = functools.partial(_kernel, g=g, eps=eps)
  weight_bytes = sum(x.size * x.dtype.itemsize for x in params)
  return pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct((B, D), deter.dtype),
      in_specs=[vmem() for _ in range(10)],
      out_specs=vmem(),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=int(weight_bytes + (1 << 23))),
      interpret=interpret,
  )(deter, stoch_flat, actfeat, w0, s0, w1, s1, wh, sh, wg)


def supported(params, max_vmem_bytes=12 * 1024 * 1024):
  """Whether the weights fit comfortably in VMEM for the fused kernel."""
  weight_bytes = sum(
      np.prod(p.shape) * jnp.dtype(p.dtype).itemsize for p in params)
  return weight_bytes <= max_vmem_bytes


def on_tpu():
  try:
    return jax.devices()[0].platform in ('tpu', 'axon')
  except Exception:
    return False

