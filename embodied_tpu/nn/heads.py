"""Output heads producing distribution objects.

Capability parity: /root/reference/embodied/jax/heads.py — MLPHead (trunk +
head), DictHead (one head per space), Head with implementations binary /
categorical / onehot / mse / huber / symlog_mse / symexp_twohot /
bounded_normal / normal_logstd.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import Space
from . import dists
from .core import Module, symlog
from .layers import MLP, Linear

f32 = jnp.float32


class MLPHead(Module):

  def __init__(self, space, output=None, name='head', layers=3, units=1024,
               act='silu', norm='rms', bias=True, winit='trunc_normal_in',
               binit='zeros', **hkw):
    super().__init__(name)
    shared = dict(bias=bias, winit=winit, binit=binit)
    self.mlp = MLP(layers, units, 'mlp', act=act, norm=norm, **shared)
    if isinstance(space, dict):
      self.head = DictHead(space, output, 'out', **shared, **hkw)
    else:
      self.head = Head(space, output, 'out', **shared, **hkw)

  def __call__(self, ctx, x, bdims=2):
    p = self.sub(ctx)
    bshape = jax.tree.leaves(x)[0].shape[:bdims]
    x = x.reshape((*bshape, -1))
    x = self.mlp(p, x)
    return self.head(p, x)


class DictHead(Module):

  def __init__(self, spaces, outputs, name='head', **kw):
    super().__init__(name)
    assert spaces, spaces
    if not isinstance(outputs, dict):
      outputs = {k: outputs for k in spaces}
    assert spaces.keys() == outputs.keys(), (spaces, outputs)
    self.heads = {
        key: Head(spaces[key], outputs[key], f'head_{key}', **kw)
        for key in sorted(spaces.keys())}

  def __call__(self, ctx, x):
    p = self.sub(ctx)
    return {key: head(p, x) for key, head in self.heads.items()}


class Head(Module):

  def __init__(self, space, output, name='head', minstd=1.0, maxstd=1.0,
               unimix=0.0, bins=255, outscale=1.0, **kw):
    super().__init__(name)
    if isinstance(space, tuple):
      space = Space(np.float32, space)
    if output == 'onehot':
      # Discrete space modeled as straight-through one-hot vectors.
      space = Space(np.float32, (*space.shape, space.classes), 0.0, 1.0)
    self.space = space
    self.impl = output
    self.minstd = minstd
    self.maxstd = maxstd
    self.unimix = unimix
    self.bins = bins
    self.kw = {**kw, 'outscale': outscale}
    self._build()

  def _build(self):
    shape = self.space.shape
    kw = self.kw
    if self.impl == 'binary':
      self.layer = Linear(shape or 1, 'logit', **kw)
    elif self.impl == 'categorical':
      self.layer = Linear((*shape, self.space.classes), 'logits', **kw)
    elif self.impl == 'onehot':
      self.layer = Linear(shape, 'logits', **kw)
    elif self.impl in ('mse', 'huber', 'symlog_mse'):
      self.layer = Linear(shape or 1, 'pred', **kw)
    elif self.impl == 'symexp_twohot':
      self.layer = Linear((*shape, self.bins), 'logits', **kw)
      self.binvals = dists.symexp_bins(self.bins)
    elif self.impl in ('bounded_normal', 'normal_logstd'):
      self.mean_layer = Linear(shape or 1, 'mean', **kw)
      self.std_layer = Linear(shape or 1, 'stddev', **kw)
    else:
      raise NotImplementedError(self.impl)

  def __call__(self, ctx, x):
    p = self.sub(ctx)
    output = getattr(self, '_' + self.impl)(p, x)
    # OneHot distributions already consume the trailing class axis, so one
    # fewer event dim remains to aggregate.
    dims = len(self.space.shape) - (1 if self.impl == 'onehot' else 0)
    if dims > 0:
      output = dists.Agg(output, dims, jnp.sum)
    assert output.pred().shape[x.ndim - 1:] == self.space.shape, (
        self.space, self.impl, x.shape, output.pred().shape)
    return output

  def _squeeze(self, y):
    return y[..., 0] if not self.space.shape else y

  def _binary(self, p, x):
    assert self.space.classes == 2, self.space
    return dists.Binary(self._squeeze(self.layer(p, x)))

  def _categorical(self, p, x):
    assert self.space.discrete
    logits = self.layer(p, x)
    output = dists.Categorical(logits)
    output.minent = 0.0
    output.maxent = float(np.log(logits.shape[-1]))
    return output

  def _onehot(self, p, x):
    return dists.OneHot(self.layer(p, x), self.unimix)

  def _mse(self, p, x):
    return dists.MSE(self._squeeze(self.layer(p, x)))

  def _huber(self, p, x):
    return dists.Huber(self._squeeze(self.layer(p, x)))

  def _symlog_mse(self, p, x):
    return dists.MSE(self._squeeze(self.layer(p, x)), symlog)

  def _symexp_twohot(self, p, x):
    logits = self.layer(p, x)
    from .core import symexp
    return dists.TwoHot(logits, self.binvals, symlog, symexp)

  def _bounded_normal(self, p, x):
    mean = self._squeeze(self.mean_layer(p, x))
    stddev = self._squeeze(self.std_layer(p, x))
    lo, hi = self.minstd, self.maxstd
    stddev = (hi - lo) * jax.nn.sigmoid(f32(stddev) + 2.0) + lo
    output = dists.Normal(jnp.tanh(f32(mean)), stddev)
    entropy = lambda s: float(0.5 * np.log(2 * np.pi * s * s) + 0.5)
    output.minent = entropy(lo)
    output.maxent = entropy(hi)
    return output

  def _normal_logstd(self, p, x):
    mean = self._squeeze(self.mean_layer(p, x))
    stddev = self._squeeze(self.std_layer(p, x))
    return dists.Normal(f32(mean), jnp.exp(f32(stddev)))
