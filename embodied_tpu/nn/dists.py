"""Output distributions with pred/sample/logp/entropy/kl/loss.

Capability parity: /root/reference/embodied/jax/outs.py — Agg, Frozen,
Concat, MSE, Huber, Normal, Binary, Categorical, OneHot (straight-through),
TwoHot (symexp bins with an exactly-zero prediction at uniform init).

Sampling takes an explicit PRNG key (no hidden seed plumbing).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

f32 = jnp.float32
i32 = jnp.int32
sg = jax.lax.stop_gradient


class Output:

  def __repr__(self):
    pred = self.pred()
    return f'{type(self).__name__}({pred.dtype}, shape={pred.shape})'

  def pred(self):
    raise NotImplementedError

  def loss(self, target):
    return -self.logp(sg(target))

  def sample(self, seed, shape=()):
    raise NotImplementedError

  def logp(self, event):
    raise NotImplementedError

  def prob(self, event):
    return jnp.exp(self.logp(event))

  def entropy(self):
    raise NotImplementedError

  def kl(self, other):
    raise NotImplementedError


class Agg(Output):
  """Aggregates an elementwise output over trailing event dims."""

  def __init__(self, output, dims, agg=jnp.sum):
    self.output = output
    self.axes = tuple(-i for i in range(1, dims + 1))
    self.agg = agg

  def pred(self):
    return self.output.pred()

  def loss(self, target):
    return self.agg(self.output.loss(target), self.axes)

  def sample(self, seed, shape=()):
    return self.output.sample(seed, shape)

  def logp(self, event):
    return self.output.logp(event).sum(self.axes)

  def prob(self, event):
    return self.output.prob(event).sum(self.axes)

  def entropy(self):
    return self.agg(self.output.entropy(), self.axes)

  def kl(self, other):
    assert isinstance(other, Agg), other
    return self.agg(self.output.kl(other.output), self.axes)


class Frozen:
  """Wraps an output so every method result is stop-gradiented."""

  def __init__(self, output):
    self.output = output

  def __getattr__(self, name):
    if name.startswith('__'):
      raise AttributeError(name)
    fn = getattr(self.output, name)
    return functools.partial(self._wrapper, fn)

  def _wrapper(self, fn, *args, **kwargs):
    return sg(fn(*args, **kwargs))


class Concat:
  """Concatenation of several outputs along an axis of the event."""

  def __init__(self, outputs, midpoints, axis):
    assert len(midpoints) == len(outputs) - 1
    self.outputs = outputs
    self.midpoints = tuple(midpoints)
    self.axis = axis

  def __getattr__(self, name):
    if name.startswith('__'):
      raise AttributeError(name)
    fns = [getattr(x, name) for x in self.outputs]
    return functools.partial(self._wrapper, fns)

  def _wrapper(self, fns, *args, **kwargs):
    los = (None,) + self.midpoints
    his = self.midpoints + (None,)
    results = []
    for fn, lo, hi in zip(fns, los, his):
      index = [slice(None)] * (self.axis + 1)
      index[self.axis] = slice(lo, hi)
      index = tuple(index)
      a, kw = jax.tree.map(lambda x: x[index], (args, kwargs))
      results.append(fn(*a, **kw))
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, self.axis), *results)


class MSE(Output):

  def __init__(self, mean, squash=None):
    self.mean = f32(mean)
    self.squash = squash or (lambda x: x)

  def pred(self):
    return self.mean

  def loss(self, target):
    assert jnp.issubdtype(target.dtype, jnp.floating), target.dtype
    assert self.mean.shape == target.shape, (self.mean.shape, target.shape)
    return jnp.square(self.mean - sg(self.squash(f32(target))))


class Huber(Output):
  """Charbonnier (soft Huber) regression loss."""

  def __init__(self, mean, eps=1.0):
    self.mean = f32(mean)
    self.eps = eps

  def pred(self):
    return self.mean

  def loss(self, target):
    assert jnp.issubdtype(target.dtype, jnp.floating), target.dtype
    dist = self.mean - sg(f32(target))
    return jnp.sqrt(jnp.square(dist) + jnp.square(self.eps)) - self.eps


class Normal(Output):

  def __init__(self, mean, stddev=1.0):
    self.mean = f32(mean)
    self.stddev = jnp.broadcast_to(f32(stddev), self.mean.shape)

  def pred(self):
    return self.mean

  def sample(self, seed, shape=()):
    noise = jax.random.normal(seed, shape + self.mean.shape, f32)
    return noise * self.stddev + self.mean

  def logp(self, event):
    assert jnp.issubdtype(event.dtype, jnp.floating), event.dtype
    z = (f32(event) - self.mean) / self.stddev
    return -0.5 * jnp.square(z) - jnp.log(self.stddev) - np.float32(
        0.5 * np.log(2 * np.pi))

  def entropy(self):
    return 0.5 * jnp.log(2 * jnp.pi * jnp.square(self.stddev)) + 0.5

  def kl(self, other):
    assert isinstance(other, type(self)), (self, other)
    ratio = jnp.square(self.stddev / other.stddev)
    return 0.5 * (
        ratio + jnp.square(other.mean - self.mean) /
        jnp.square(other.stddev) - 1 - jnp.log(ratio))


class Binary(Output):

  def __init__(self, logit):
    self.logit = f32(logit)

  def pred(self):
    return self.logit > 0

  def logp(self, event):
    event = f32(event)
    return (event * jax.nn.log_sigmoid(self.logit) +
            (1 - event) * jax.nn.log_sigmoid(-self.logit))

  def sample(self, seed, shape=()):
    prob = jax.nn.sigmoid(self.logit)
    return jax.random.bernoulli(seed, prob, shape + self.logit.shape)

  def entropy(self):
    p = jax.nn.sigmoid(self.logit)
    return -(p * jax.nn.log_sigmoid(self.logit) +
             (1 - p) * jax.nn.log_sigmoid(-self.logit))


class Categorical(Output):

  def __init__(self, logits, unimix=0.0):
    logits = f32(logits)
    if unimix:
      probs = jax.nn.softmax(logits, -1)
      probs = (1 - unimix) * probs + unimix / probs.shape[-1]
      logits = jnp.log(probs)
    self.logits = logits

  def pred(self):
    return jnp.argmax(self.logits, -1)

  def sample(self, seed, shape=()):
    return jax.random.categorical(
        seed, self.logits, -1, shape + self.logits.shape[:-1])

  def logp(self, event):
    logprobs = jax.nn.log_softmax(self.logits, -1)
    return jnp.take_along_axis(
        logprobs, event[..., None].astype(i32), -1)[..., 0]

  def entropy(self):
    logprob = jax.nn.log_softmax(self.logits, -1)
    return -(jnp.exp(logprob) * logprob).sum(-1)

  def kl(self, other):
    logprob = jax.nn.log_softmax(self.logits, -1)
    logother = jax.nn.log_softmax(other.logits, -1)
    return (jnp.exp(logprob) * (logprob - logother)).sum(-1)


class OneHot(Output):
  """Categorical over one-hot events with straight-through gradients."""

  def __init__(self, logits, unimix=0.0):
    self.dist = Categorical(logits, unimix)

  @property
  def logits(self):
    return self.dist.logits

  def pred(self):
    return self._onehot_st(self.dist.pred())

  def sample(self, seed, shape=()):
    return self._onehot_st(self.dist.sample(seed, shape))

  def logp(self, event):
    return (jax.nn.log_softmax(self.dist.logits, -1) * event).sum(-1)

  def entropy(self):
    return self.dist.entropy()

  def kl(self, other):
    return self.dist.kl(other.dist)

  def _onehot_st(self, index):
    value = jax.nn.one_hot(index, self.dist.logits.shape[-1], dtype=f32)
    probs = jax.nn.softmax(self.dist.logits, -1)
    return sg(value) + (probs - sg(probs))


class TwoHot(Output):
  """Distributional regression over two-hot encoded bin targets.

  pred() pairs symmetric bins before accumulating so that symmetric bins
  with uniform probabilities give exactly zero (the reference achieves the
  same via a mirrored split-sum, /root/reference/embodied/jax/outs.py:285).
  """

  def __init__(self, logits, bins, squash=None, unsquash=None):
    logits = f32(logits)
    assert logits.shape[-1] == len(bins), (logits.shape, len(bins))
    self.logits = logits
    self.probs = jax.nn.softmax(logits, -1)
    self.bins = jnp.asarray(bins, f32)
    self.squash = squash or (lambda x: x)
    self.unsquash = unsquash or (lambda x: x)

  def pred(self):
    terms = self.probs * self.bins
    # Pairing terms[i] with terms[n-1-i] cancels numerical error exactly
    # when bins are symmetric and probabilities uniform.
    paired = 0.5 * (terms + terms[..., ::-1])
    return self.unsquash(paired.sum(-1))

  def loss(self, target):
    assert jnp.issubdtype(target.dtype, jnp.floating), target.dtype
    target = sg(self.squash(f32(target)))
    nbins = len(self.bins)
    below = jnp.clip(
        (self.bins <= target[..., None]).astype(i32).sum(-1) - 1,
        0, nbins - 1)
    above = jnp.clip(
        nbins - (self.bins > target[..., None]).astype(i32).sum(-1),
        0, nbins - 1)
    equal = below == above
    dist_below = jnp.where(equal, 1, jnp.abs(self.bins[below] - target))
    dist_above = jnp.where(equal, 1, jnp.abs(self.bins[above] - target))
    total = dist_below + dist_above
    weight_below = dist_above / total
    weight_above = dist_below / total
    twohot = (
        jax.nn.one_hot(below, nbins) * weight_below[..., None] +
        jax.nn.one_hot(above, nbins) * weight_above[..., None])
    log_pred = jax.nn.log_softmax(self.logits, -1)
    return -(twohot * log_pred).sum(-1)


def symexp_bins(num):
  """Symmetric exponentially-spaced bins used by symexp_twohot heads."""
  npsymexp = lambda x: np.sign(x) * np.expm1(np.abs(x))
  if num % 2 == 1:
    half = npsymexp(np.linspace(-20, 0, (num - 1) // 2 + 1, dtype=np.float32))
    return np.concatenate([half, -half[:-1][::-1]], 0).astype(np.float32)
  half = npsymexp(np.linspace(-20, 0, num // 2, dtype=np.float32))
  return np.concatenate([half, -half[::-1]], 0).astype(np.float32)
