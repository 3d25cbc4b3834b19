"""Training utilities: running normalizers and EMA target networks.

Capability parity: /root/reference/embodied/jax/utils.py — Normalize
(meanstd/percentile with debiasing and cross-device reduction) and
SlowModel (EMA copy of a source module's parameters).
"""

import jax
import jax.numpy as jnp

from . import opt as optlib
from .core import Module

f32 = jnp.float32
i32 = jnp.int32
sg = jax.lax.stop_gradient


class Normalize(Module):
  """Running normalizer returning (offset, scale) statistics."""

  def __init__(self, impl='meanstd', name='norm', rate=0.01, limit=1e-8,
               perclo=5.0, perchi=95.0, debias=True):
    super().__init__(name)
    assert impl in ('none', 'meanstd', 'perc'), impl
    self.impl = impl
    self.rate = rate
    self.limit = limit
    self.perclo = perclo
    self.perchi = perchi
    self.debias = debias

  def __call__(self, ctx, x, update=True):
    if update:
      self.update(ctx, x)
    return self.stats(ctx)

  def update(self, ctx, x):
    if self.impl == 'none':
      return
    p = self.sub(ctx)
    x = sg(f32(x))
    if self.impl == 'meanstd':
      self._ema(p, 'mean', self._mean(x))
      self._ema(p, 'sqrs', self._mean(jnp.square(x)))
    elif self.impl == 'perc':
      self._ema(p, 'lo', self._perc(x, self.perclo))
      self._ema(p, 'hi', self._perc(x, self.perchi))
    if self.debias:
      self._ema(p, 'corr', 1.0)

  def stats(self, ctx):
    if self.impl == 'none':
      return 0.0, 1.0
    p = self.sub(ctx)
    corr = 1.0
    if self.debias:
      corr = 1.0 / jnp.maximum(self.rate, p.state('corr', (), 0.0, f32))
    if self.impl == 'meanstd':
      mean = p.state('mean', (), 0.0, f32) * corr
      sqrs = p.state('sqrs', (), 0.0, f32) * corr
      std = jnp.sqrt(jax.nn.relu(sqrs - jnp.square(mean)))
      return mean, jnp.maximum(self.limit, std)
    if self.impl == 'perc':
      lo = p.state('lo', (), 0.0, f32) * corr
      hi = p.state('hi', (), 0.0, f32) * corr
      return sg(lo), sg(jnp.maximum(self.limit, hi - lo))

  def _ema(self, p, name, value):
    prev = p.state(name, (), 0.0, f32)
    p.write(name, (1 - self.rate) * prev + self.rate * sg(value))

  def _mean(self, x):
    x = x.mean()
    axes = optlib.get_data_axes()
    if axes:
      x = jax.lax.pmean(x, axes)
    return x

  def _perc(self, x, q):
    axes = optlib.get_data_axes()
    if axes:
      x = jax.lax.all_gather(x, axes)
    return jnp.percentile(x, q)


class SlowModel:
  """EMA shadow of a source module, usable wherever the source is.

  The shadow module must have the same architecture as the source but its
  own name; its parameters are initialized as copies of the source's and
  pulled toward them by `update()` at `rate` every `every` calls. The
  shadow's params live outside the optimizer scopes, so they are never
  trained directly.
  """

  def __init__(self, model, source, rate=0.02, every=1):
    assert rate == 1 or rate < 0.5, rate
    self.model = model
    self.source = source
    self.rate = rate
    self.every = every

  def __call__(self, ctx, *args, **kwargs):
    out = self.model(ctx, *args, **kwargs)
    if ctx.create:
      self._copy_from_source(ctx)
    return out

  def _copy_from_source(self, ctx):
    src_prefix = ctx.path(self.source.name) + '/'
    dst_prefix = ctx.path(self.model.name) + '/'
    merged = {**ctx.store, **ctx.updates}
    src = {k: v for k, v in merged.items() if k.startswith(src_prefix)}
    for sk, sv in src.items():
      dk = dst_prefix + sk[len(src_prefix):]
      assert dk in merged, (
          f'Slow model entry {dk!r} missing; architectures must match')
      ctx.store[dk] = sv
      # Shadow params must not be trained; mark as state.
      ctx.meta[dk] = 'state'
      ctx.record_copy(dk, sk)

  def update(self, ctx):
    p = ctx(self.model.name + '_ema')
    count = p.state('count', (), 0, i32)
    if ctx.create:
      p.write('count', count)
      return
    mix = jnp.where(count % self.every == 0, self.rate, 0.0)
    src_prefix = ctx.path(self.source.name) + '/'
    dst_prefix = ctx.path(self.model.name) + '/'
    merged = {**ctx.store, **ctx.updates}
    for sk in [k for k in merged if k.startswith(src_prefix)]:
      dk = dst_prefix + sk[len(src_prefix):]
      if dk not in merged:
        continue
      ctx.write_path(dk, mix * merged[sk] + (1 - mix) * merged[dk])
    p.write('count', count + 1)
