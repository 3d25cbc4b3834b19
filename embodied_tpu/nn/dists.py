"""Output distributions with pred/sample/logp/entropy/kl/loss.

Capability match for /root/reference/embodied/jax/outs.py (Agg, Frozen,
Concat, MSE, Huber, Normal, Binary, Categorical, OneHot straight-through,
TwoHot with an exactly-zero prediction at uniform init), re-derived:
categorical families normalize once and store log-probabilities, the
two-hot target uses searchsorted bracketing, and sampling takes an
explicit PRNG key (no hidden seed plumbing).
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
  """Reduces an elementwise output over its trailing `dims` event dims."""

  def __init__(self, output, dims, agg=jnp.sum):
    self.output = output
    self.axes = tuple(range(-dims, 0))
    self.agg = agg

  def pred(self):
    return self.output.pred()

  def sample(self, seed, shape=()):
    return self.output.sample(seed, shape)

  def loss(self, target):
    return self.agg(self.output.loss(target), self.axes)

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
  """Stop-gradients every method result of the wrapped output."""

  def __init__(self, output):
    self.output = output

  def __getattr__(self, name):
    if name.startswith('__'):
      raise AttributeError(name)
    inner = getattr(self.output, name)
    if not callable(inner):
      return sg(inner)
    return functools.partial(self._frozen_call, inner)

  @staticmethod
  def _frozen_call(inner, *args, **kwargs):
    return sg(inner(*args, **kwargs))


class Concat:
  """Several outputs side by side along one event axis. Method calls are
  dispatched with the matching slice of every array argument and the
  results concatenated back."""

  def __init__(self, outputs, midpoints, axis):
    assert len(midpoints) == len(outputs) - 1
    self.outputs = outputs
    self.edges = [None, *midpoints, None]
    self.axis = axis

  def __getattr__(self, name):
    if name.startswith('__'):
      raise AttributeError(name)
    fns = [getattr(x, name) for x in self.outputs]
    return functools.partial(self._dispatch, fns)

  def _dispatch(self, fns, *args, **kwargs):
    pieces = []
    for i, fn in enumerate(fns):
      sel = (slice(None),) * self.axis + (
          slice(self.edges[i], self.edges[i + 1]),)
      a, kw = jax.tree.map(lambda x: x[sel], (args, kwargs))
      pieces.append(fn(*a, **kw))
    return jax.tree.map(
        lambda *xs: jnp.concatenate(xs, self.axis), *pieces)


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
  """Charbonnier (smooth Huber) regression loss."""

  def __init__(self, mean, eps=1.0):
    self.mean = f32(mean)
    self.eps = eps

  def pred(self):
    return self.mean

  def loss(self, target):
    assert jnp.issubdtype(target.dtype, jnp.floating), target.dtype
    err2 = jnp.square(self.mean - sg(f32(target)))
    return jnp.sqrt(err2 + self.eps ** 2) - self.eps


_LOG_SQRT_2PI = float(0.5 * np.log(2 * np.pi))


class Normal(Output):

  def __init__(self, mean, stddev=1.0):
    self.mean = f32(mean)
    self.stddev = jnp.broadcast_to(f32(stddev), self.mean.shape)
    self.logstd = jnp.log(self.stddev)

  def pred(self):
    return self.mean

  def sample(self, seed, shape=()):
    unit = jax.random.normal(seed, shape + self.mean.shape, f32)
    return self.mean + self.stddev * unit

  def logp(self, event):
    assert jnp.issubdtype(event.dtype, jnp.floating), event.dtype
    z = (f32(event) - self.mean) / self.stddev
    return -0.5 * jnp.square(z) - self.logstd - _LOG_SQRT_2PI

  def entropy(self):
    return self.logstd + _LOG_SQRT_2PI + 0.5

  def kl(self, other):
    assert isinstance(other, type(self)), (self, other)
    var_ratio = jnp.square(self.stddev) / jnp.square(other.stddev)
    gap = jnp.square(self.mean - other.mean) / jnp.square(other.stddev)
    return 0.5 * (var_ratio + gap - 1 - jnp.log(var_ratio))


class Binary(Output):

  def __init__(self, logit):
    self.logit = f32(logit)
    # log p(1) and log p(0), each computed stably from the logit.
    self.logp1 = jax.nn.log_sigmoid(self.logit)
    self.logp0 = jax.nn.log_sigmoid(-self.logit)

  def pred(self):
    return self.logit > 0

  def sample(self, seed, shape=()):
    prob = jnp.exp(self.logp1)
    return jax.random.bernoulli(seed, prob, shape + self.logit.shape)

  def logp(self, event):
    event = f32(event)
    return event * self.logp1 + (1 - event) * self.logp0

  def entropy(self):
    p1 = jnp.exp(self.logp1)
    return -(p1 * self.logp1 + (1 - p1) * self.logp0)


class Categorical(Output):
  """Integer-event categorical; normalizes once and stores logprobs."""

  def __init__(self, logits, unimix=0.0):
    logprobs = jax.nn.log_softmax(f32(logits), -1)
    if unimix:
      probs = jnp.exp(logprobs)
      k = probs.shape[-1]
      logprobs = jnp.log((1 - unimix) * probs + unimix / k)
    self.logprobs = logprobs

  @property
  def logits(self):
    return self.logprobs

  def pred(self):
    return jnp.argmax(self.logprobs, -1)

  def sample(self, seed, shape=()):
    return jax.random.categorical(
        seed, self.logprobs, -1, shape + self.logprobs.shape[:-1])

  def logp(self, event):
    index = event[..., None].astype(i32)
    return jnp.take_along_axis(self.logprobs, index, -1)[..., 0]

  def entropy(self):
    return -(jnp.exp(self.logprobs) * self.logprobs).sum(-1)

  def kl(self, other):
    diff = self.logprobs - other.logprobs
    return (jnp.exp(self.logprobs) * diff).sum(-1)


class OneHot(Output):
  """Categorical over one-hot events; samples carry straight-through
  gradients of the class probabilities."""

  def __init__(self, logits, unimix=0.0):
    self.dist = Categorical(logits, unimix)

  @property
  def logits(self):
    return self.dist.logprobs

  def pred(self):
    return self._straight_through(self.dist.pred())

  def sample(self, seed, shape=()):
    return self._straight_through(self.dist.sample(seed, shape))

  def logp(self, event):
    return (self.dist.logprobs * event).sum(-1)

  def entropy(self):
    return self.dist.entropy()

  def kl(self, other):
    return self.dist.kl(other.dist)

  def _straight_through(self, index):
    k = self.dist.logprobs.shape[-1]
    hard = jax.nn.one_hot(index, k, dtype=f32)
    soft = jnp.exp(self.dist.logprobs)
    return sg(hard - soft) + soft


class TwoHot(Output):
  """Distributional regression over two-hot encoded bin targets.

  pred() sums symmetric bin pairs first, so symmetric bins with uniform
  probabilities give exactly zero — the property the reference engineers
  via a mirrored split-sum (/root/reference/embodied/jax/outs.py:285)."""

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
    folded = 0.5 * (terms + terms[..., ::-1])
    return self.unsquash(folded.sum(-1))

  def loss(self, target):
    assert jnp.issubdtype(target.dtype, jnp.floating), target.dtype
    target = sg(self.squash(f32(target)))
    n = len(self.bins)
    # Bracket the target between adjacent bins via binary search; clipping
    # collapses out-of-range targets onto the boundary bin (hi == lo).
    right = jnp.searchsorted(self.bins, target, side='right')
    lo = jnp.clip(right - 1, 0, n - 1)
    hi = jnp.clip(right, 0, n - 1)
    at_edge = lo == hi
    d_lo = jnp.where(at_edge, 1, jnp.abs(self.bins[lo] - target))
    d_hi = jnp.where(at_edge, 1, jnp.abs(self.bins[hi] - target))
    span = d_lo + d_hi
    twohot = (
        jax.nn.one_hot(lo, n) * (d_hi / span)[..., None] +
        jax.nn.one_hot(hi, n) * (d_lo / span)[..., None])
    return -(twohot * jax.nn.log_softmax(self.logits, -1)).sum(-1)


def symexp_bins(num):
  """Symmetric exponentially-spaced bins used by symexp_twohot heads."""
  npsymexp = lambda x: np.sign(x) * np.expm1(np.abs(x))
  if num % 2 == 1:
    half = npsymexp(np.linspace(-20, 0, (num - 1) // 2 + 1, dtype=np.float32))
    return np.concatenate([half, -half[:-1][::-1]], 0).astype(np.float32)
  half = npsymexp(np.linspace(-20, 0, num // 2, dtype=np.float32))
  return np.concatenate([half, -half[::-1]], 0).astype(np.float32)
