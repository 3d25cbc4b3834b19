"""Neural network layers over the functional ctx/store module system.

Capability parity: /root/reference/embodied/jax/nets.py — Embed, Linear,
BlockLinear (block-diagonal), Conv2D/Conv3D, Norm (rms/layer with eps
suffix), Attention (GQA + RoPE + qk-norm), DictConcat, DictEmbed, MLP,
Transformer (pre-norm, GLU option), GRU. All matmuls run in the compute
dtype (bf16 by default) with fp32 master params, shaped to keep the MXU
busy: feature dims stay in the last axis, batch/time dims are flattened
into a single leading axis before the matmul.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from . import core
from .core import Initializer, Module, cast, sharding_hint

f32 = jnp.float32


def _winit(spec, scale=1.0):
  return Initializer.parse(spec, scale)


class Linear(Module):

  def __init__(self, units, name, bias=True, winit='trunc_normal_in',
               binit='zeros', outscale=1.0):
    super().__init__(name)
    # Tuple output shapes are flattened for the matmul then reshaped.
    self.shape = (units,) if isinstance(units, int) else tuple(units)
    self.units = int(np.prod(self.shape))
    self.bias = bias
    self.winit = _winit(winit, outscale)
    self.binit = _winit(binit)

  def __call__(self, ctx, x):
    p = self.sub(ctx)
    x = cast(x)
    kernel = p.param('kernel', (x.shape[-1], self.units), self.winit)
    y = x @ cast(kernel)
    if self.bias:
      y = y + cast(p.param('bias', (self.units,), self.binit))
    if len(self.shape) > 1:
      y = y.reshape((*y.shape[:-1], *self.shape))
    return sharding_hint(y)


class BlockLinear(Module):
  """Block-diagonal linear map with g groups.

  Input (..., D) and output (..., U) are split into g equal blocks; block i
  of the output only sees block i of the input. The contraction runs as one
  batched matmul (g, d, u) so XLA tiles it onto the MXU in a single fusion.
  """

  def __init__(self, units, groups, name, bias=True,
               winit='trunc_normal_in', binit='zeros', outscale=1.0):
    super().__init__(name)
    assert units % groups == 0, (units, groups)
    self.units = units
    self.groups = groups
    self.bias = bias
    self.winit = _winit(winit, outscale)
    self.binit = _winit(binit)

  def __call__(self, ctx, x):
    p = self.sub(ctx)
    x = cast(x)
    g = self.groups
    din = x.shape[-1]
    assert din % g == 0, (din, g)
    kernel = p.param('kernel', (g, din // g, self.units // g), self.winit)
    lead = x.shape[:-1]
    xg = x.reshape((-1, g, din // g))
    # (B, g, d) x (g, d, u) -> (B, g, u)
    y = jnp.einsum('bgd,gdu->bgu', xg, cast(kernel))
    y = y.reshape((*lead, self.units))
    if self.bias:
      y = y + cast(p.param('bias', (self.units,), self.binit))
    return sharding_hint(y)


class Embed(Module):

  def __init__(self, classes, units, name, winit='trunc_normal_in',
               outscale=1.0):
    super().__init__(name)
    self.classes = classes
    self.units = units
    self.winit = _winit(winit, outscale)

  def __call__(self, ctx, x):
    p = self.sub(ctx)
    table = p.param('embed', (self.classes, self.units), self.winit)
    return cast(table)[x]


class Norm(Module):
  """Normalization with impl string 'none' | 'rms' | 'layer', optionally
  suffixed with an epsilon like 'rms1e-4'."""

  def __init__(self, impl, name, scale=True, shift=True):
    super().__init__(name)
    if impl and impl[-1].isdigit():
      for i, char in enumerate(impl):
        if char.isdigit() or char == '.':
          break
      impl, self.eps = impl[:i], float(impl[i:])
    else:
      self.eps = 1e-4
    self.impl = impl
    self.scale = scale
    self.shift = shift

  def __call__(self, ctx, x):
    if self.impl == 'none':
      return x
    p = self.sub(ctx)
    dtype = x.dtype
    x = f32(x)
    dim = x.shape[-1]
    if self.impl == 'rms':
      mult = jax.lax.rsqrt(jnp.square(x).mean(-1, keepdims=True) + self.eps)
      if self.scale:
        mult = mult * p.param('scale', (dim,), 1.0)
      return (x * mult).astype(dtype)
    if self.impl == 'layer':
      mean = x.mean(-1, keepdims=True)
      var = jnp.square(x - mean).mean(-1, keepdims=True)
      y = (x - mean) * jax.lax.rsqrt(var + self.eps)
      if self.scale:
        y = y * p.param('scale', (dim,), 1.0)
      if self.shift:
        y = y + p.param('shift', (dim,), 0.0)
      return y.astype(dtype)
    raise NotImplementedError(self.impl)


class Conv2D(Module):
  """NHWC convolution; transp=True gives a stride-2 transposed conv
  implemented via input dilation (avoids backend-specific transposed-conv
  kernels, mirroring the reference's workaround intent)."""

  def __init__(self, depth, kernel, name, stride=1, transp=False, bias=True,
               winit='trunc_normal_in', binit='zeros', outscale=1.0,
               pad='same'):
    super().__init__(name)
    self.depth = depth
    self.kernel = kernel
    self.stride = stride
    self.transp = transp
    self.bias = bias
    self.winit = _winit(winit, outscale)
    self.binit = _winit(binit)
    self.pad = pad

  def __call__(self, ctx, x):
    p = self.sub(ctx)
    x = cast(x)
    K = self.kernel
    if self.transp:
      kernel = p.param(
          'kernel', (K, K, self.depth, x.shape[-1]), self.winit)
      y = jax.lax.conv_transpose(
          x, cast(kernel), (self.stride, self.stride), self.pad.upper(),
          dimension_numbers=('NHWC', 'HWOI', 'NHWC'))
    else:
      kernel = p.param(
          'kernel', (K, K, x.shape[-1], self.depth), self.winit)
      y = jax.lax.conv_general_dilated(
          x, cast(kernel), (self.stride, self.stride), self.pad.upper(),
          dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    if self.bias:
      y = y + cast(p.param('bias', (self.depth,), self.binit))
    return sharding_hint(y)


class Conv3D(Module):

  def __init__(self, depth, kernel, name, stride=1, bias=True,
               winit='trunc_normal_in', binit='zeros', outscale=1.0):
    super().__init__(name)
    self.depth = depth
    self.kernel = kernel
    self.stride = stride
    self.bias = bias
    self.winit = _winit(winit, outscale)
    self.binit = _winit(binit)

  def __call__(self, ctx, x):
    p = self.sub(ctx)
    x = cast(x)
    K = self.kernel
    kernel = p.param(
        'kernel', (K, K, K, x.shape[-1], self.depth), self.winit)
    y = jax.lax.conv_general_dilated(
        x, cast(kernel), (self.stride,) * 3, 'SAME',
        dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
    if self.bias:
      y = y + cast(p.param('bias', (self.depth,), self.binit))
    return sharding_hint(y)


def rope(x, positions, maxlen=10000):
  """Rotary position embedding over the last axis."""
  *_, T, D = x.shape
  assert D % 2 == 0, D
  freqs = jnp.exp(
      -math.log(maxlen) * jnp.arange(0, D, 2, f32) / D)
  angles = positions[..., None].astype(f32) * freqs
  sin, cos = jnp.sin(angles), jnp.cos(angles)
  x1, x2 = jnp.split(x.astype(f32), 2, -1)
  y = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)
  return y.astype(x.dtype)


class Attention(Module):
  """Multi-head attention with grouped queries, RoPE, and qk-norm.

  impl='ring' computes sequence-parallel ring attention: the layer must
  then run inside shard_map with the time dimension sharded over mesh
  axis `ring_axis`; kv shards rotate over ICI neighbors with a
  flash-style online softmax (ops/ring_attention.py). Only causal or
  full masks are supported in ring mode.
  """

  def __init__(self, units, heads, name, kvheads=0, qknorm=True,
               pos='rope', bias=False, winit='trunc_normal_in',
               outscale=1.0, dropout=0.0, impl='dense', ring_axis='t',
               causal=False):
    super().__init__(name)
    assert impl in ('dense', 'ring'), impl
    self.impl = impl
    self.ring_axis = ring_axis
    self.causal = causal
    assert units % heads == 0
    self.units = units
    self.heads = heads
    self.kvheads = kvheads or heads
    assert heads % self.kvheads == 0
    self.qknorm = qknorm
    self.pos = pos
    kw = dict(bias=bias, winit=winit)
    self.qproj = Linear(units, 'q', **kw)
    self.kproj = Linear(units // heads * self.kvheads, 'k', **kw)
    self.vproj = Linear(units // heads * self.kvheads, 'v', **kw)
    self.out = Linear(units, 'out', **kw, outscale=outscale)
    self.qn = Norm('rms', 'qnorm', scale=False)
    self.kn = Norm('rms', 'knorm', scale=False)

  def __call__(self, ctx, x, mask=None, positions=None):
    p = self.sub(ctx)
    B, T, _ = x.shape
    D = self.units // self.heads
    q = self.qproj(p, x).reshape((B, T, self.heads, D))
    k = self.kproj(p, x).reshape((B, T, self.kvheads, D))
    v = self.vproj(p, x).reshape((B, T, self.kvheads, D))
    if self.qknorm:
      q = self.qn(p, q)
      k = self.kn(p, k)
    if self.pos == 'rope':
      if positions is None:
        if self.impl == 'ring':
          # T here is the LOCAL shard; offset by the ring position so
          # rotary phases are global.
          offset = jax.lax.axis_index(self.ring_axis) * T
          positions = (offset + jnp.arange(T))[None, :].repeat(B, 0)
        else:
          positions = jnp.arange(T)[None, :].repeat(B, 0)
      q = rope(q.swapaxes(1, 2), positions[:, None]).swapaxes(1, 2)
      k = rope(k.swapaxes(1, 2), positions[:, None]).swapaxes(1, 2)
    repeat = self.heads // self.kvheads
    if repeat > 1:
      k = jnp.repeat(k, repeat, 2)
      v = jnp.repeat(v, repeat, 2)
    if self.impl == 'ring':
      assert mask is None, 'ring attention supports causal/full masks only'
      from ..ops import ring_attention as ra
      y = ra.ring_attention(q, k, v, self.ring_axis, causal=self.causal)
      y = y.reshape((B, T, self.units))
      return self.out(p, y)
    logits = jnp.einsum('bthd,bshd->bhts', q, k) / math.sqrt(D)
    logits = f32(logits)
    if mask is not None:
      logits = jnp.where(mask, logits, -1e30)
    weights = jax.nn.softmax(logits, -1).astype(x.dtype)
    y = jnp.einsum('bhts,bshd->bthd', weights, v)
    y = y.reshape((B, T, self.units))
    return self.out(p, y)


class DictConcat(Module):
  """Concatenates dict values into one feature tensor; discrete entries are
  one-hot encoded, continuous optionally squished. Batch dims are inferred
  per key from the space shape; `fdims` event dims are kept before the
  flattened feature axis (parity: reference nets.py DictConcat)."""

  def __init__(self, spaces, fdims=1, name='dictconcat', squish=None):
    super().__init__(name)
    assert fdims >= 1, fdims
    self.spaces = spaces
    self.fdims = fdims
    self.squish = squish or (lambda x: x)

  def __call__(self, ctx, xs):
    outs = []
    for key in sorted(self.spaces.keys()):
      space = self.spaces[key]
      x = xs[key]
      bdims = x.ndim - len(space.shape)
      assert x.shape[bdims:] == space.shape, (key, space.shape, x.shape)
      if space.discrete:
        x = jax.nn.one_hot(x.astype(jnp.int32), space.classes)
      else:
        x = cast(self.squish(f32(x)))
      x = x.reshape((*x.shape[:bdims + self.fdims - 1], -1))
      outs.append(cast(x))
    return jnp.concatenate(outs, -1)


class DictEmbed(Module):
  """Embeds each dict entry with a linear map and sums the embeddings."""

  def __init__(self, spaces, units, name, squish=None, **kw):
    super().__init__(name)
    self.spaces = spaces
    self.units = units
    self.squish = squish or (lambda x: x)
    self.heads = {
        key: Linear(units, f'embed_{key}', **kw)
        for key in sorted(spaces.keys())}

  def __call__(self, ctx, xs, bshape):
    p = self.sub(ctx)
    total = 0
    for key in sorted(self.spaces.keys()):
      space = self.spaces[key]
      x = xs[key]
      if space.discrete:
        x = jax.nn.one_hot(x.astype(jnp.int32), space.classes)
      else:
        x = cast(self.squish(f32(x)))
      x = x.reshape((*bshape, -1))
      total = total + self.heads[key](p, cast(x))
    return total


class MLP(Module):

  def __init__(self, layers, units, name, act='silu', norm='rms', **kw):
    super().__init__(name)
    self.layers = [
        (Linear(units, f'linear{i}', **kw), Norm(norm, f'norm{i}'))
        for i in range(layers)]
    self.act = core.act(act)

  def __call__(self, ctx, x):
    p = self.sub(ctx)
    for linear, norm in self.layers:
      x = self.act(norm(p, linear(p, x)))
    return x


class Transformer(Module):
  """Pre-norm transformer blocks with optional GLU feedforward."""

  def __init__(self, layers, units, heads, name, ffmult=4, glu=True,
               act='silu', norm='rms', **kw):
    super().__init__(name)
    # Attention-only options (incl. impl='ring' sequence parallelism) must
    # not leak into the feedforward Linears.
    akw = {k: kw.pop(k) for k in (
        'impl', 'ring_axis', 'causal', 'kvheads', 'qknorm', 'pos',
        'dropout') if k in kw}
    self.blocks = []
    for i in range(layers):
      attn = Attention(units, heads, f'attn{i}', **kw, **akw)
      n1 = Norm(norm, f'norm{i}a')
      n2 = Norm(norm, f'norm{i}b')
      ff1 = Linear(ffmult * units, f'ff{i}a', **kw)
      ffg = Linear(ffmult * units, f'ff{i}gate', **kw) if glu else None
      ff2 = Linear(units, f'ff{i}b', **kw)
      self.blocks.append((attn, n1, n2, ff1, ffg, ff2))
    self.outnorm = Norm(norm, 'outnorm')
    self.act = core.act(act)
    self.glu = glu

  def __call__(self, ctx, x, mask=None, positions=None):
    p = self.sub(ctx)
    for attn, n1, n2, ff1, ffg, ff2 in self.blocks:
      x = x + attn(p, n1(p, x), mask, positions)
      h = n2(p, x)
      y = self.act(ff1(p, h))
      if self.glu:
        y = y * ffg(p, h)
      x = x + ff2(p, y)
    return self.outnorm(p, x)


class GRU(Module):
  """Minimal GRU over time via lax.scan; carry resets where `resets`."""

  def __init__(self, units, name, norm='rms', **kw):
    super().__init__(name)
    self.units = units
    self.core = Linear(3 * units, 'core', **kw)
    self.norm = Norm(norm, 'norm')

  def initial(self, batch_size):
    return jnp.zeros((batch_size, self.units), core.COMPUTE_DTYPE)

  def __call__(self, ctx, carry, inputs, resets, single=False):
    p = self.sub(ctx)
    if single:
      return self._step(p, carry, (inputs, resets))
    carry, feats = core.scan(
        p, self._step, carry, (inputs, resets), axis=1)
    return carry, feats

  def _step(self, p, carry, inp):
    x, reset = inp
    carry = core.mask(carry, ~reset)
    x = jnp.concatenate([cast(carry), cast(x)], -1)
    x = self.norm(p, self.core(p, x))
    reset_gate, cand, update = jnp.split(x, 3, -1)
    reset_gate = jax.nn.sigmoid(reset_gate)
    cand = jnp.tanh(reset_gate * cand)
    update = jax.nn.sigmoid(update - 1)
    out = update * cand + (1 - update) * carry
    return out, out
