"""Output distributions with pred/sample/logp/entropy/kl/loss.

Capability match for /root/reference/embodied/jax/outs.py (Agg, Frozen,
Concat, MSE, Huber, Normal, Binary, Categorical, OneHot straight-through,
TwoHot with an exactly-zero prediction at uniform init), re-derived for
this stack: categorical families normalize once and keep log-probabilities
as their canonical parameter, regression losses share a pointwise base,
the two-hot target is bracketed with searchsorted, and sampling takes an
explicit PRNG key (no hidden seed plumbing).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

f32 = jnp.float32
sg = jax.lax.stop_gradient
_HALF_LOG_2PI = float(0.5 * np.log(2.0 * np.pi))


def _identity(x):
  return x


def _as_float(value):
  assert jnp.issubdtype(value.dtype, jnp.floating), value.dtype
  return f32(value)


class Dist:
  """Common interface; subclasses override what they support."""

  # Methods a subclass does not override raise NotImplementedError through
  # this single trampoline, so the base class stays free of stub bodies.
  def _unsupported(self, what):
    raise NotImplementedError(f'{type(self).__name__} has no {what}()')

  def pred(self):
    self._unsupported('pred')

  def sample(self, key, shape=()):
    self._unsupported('sample')

  def logp(self, value):
    self._unsupported('logp')

  def prob(self, value):
    return jnp.exp(self.logp(value))

  def loss(self, target):
    return -self.logp(sg(target))

  def entropy(self):
    self._unsupported('entropy')

  def kl(self, other):
    self._unsupported('kl')

  def __repr__(self):
    mean = self.pred()
    return f'{type(self).__name__}(shape={mean.shape}, {mean.dtype})'


class Pointwise(Dist):
  """Deterministic regression: loss is a pointwise penalty of the error."""

  def __init__(self, mean, squash=None):
    self._mean = f32(mean)
    self._squash = squash or _identity

  def pred(self):
    return self._mean

  def loss(self, target):
    target = sg(self._squash(_as_float(target)))
    assert target.shape == self._mean.shape, (target.shape, self._mean.shape)
    return self._penalty(self._mean - target)

  def _penalty(self, err):
    raise NotImplementedError


class MSE(Pointwise):

  def _penalty(self, err):
    return jnp.square(err)


class Huber(Pointwise):
  """Charbonnier (smooth Huber) penalty."""

  def __init__(self, mean, eps=1.0, squash=None):
    super().__init__(mean, squash)
    self._eps = eps

  def _penalty(self, err):
    return jnp.sqrt(jnp.square(err) + self._eps ** 2) - self._eps


class Agg(Dist):
  """Reduces an elementwise distribution over trailing event dims."""

  def __init__(self, inner, dims, agg=jnp.sum):
    self._inner = inner
    self._axes = tuple(range(-dims, 0))
    self._agg = agg

  def _reduce(self, elem):
    return self._agg(elem, self._axes)

  def pred(self):
    return self._inner.pred()

  def sample(self, key, shape=()):
    return self._inner.sample(key, shape)

  def logp(self, value):
    return self._inner.logp(value).sum(self._axes)

  def prob(self, value):
    return self._inner.prob(value).sum(self._axes)

  def loss(self, target):
    return self._reduce(self._inner.loss(target))

  def entropy(self):
    return self._reduce(self._inner.entropy())

  def kl(self, other):
    assert isinstance(other, Agg), other
    return self._reduce(self._inner.kl(other._inner))


class Frozen:
  """Stop-gradients every method result of the wrapped distribution."""

  def __init__(self, inner):
    self._inner = inner

  def __getattr__(self, name):
    if name.startswith('__'):
      raise AttributeError(name)
    member = getattr(self._inner, name)
    if not callable(member):
      return sg(member)
    return functools.partial(Frozen._call, member)

  @staticmethod
  def _call(member, *args, **kwargs):
    return sg(member(*args, **kwargs))


class Concat:
  """Several distributions side by side along one event axis.

  Any method call slices its array arguments at the stored edges, invokes
  each part, and concatenates the per-part results back together.
  """

  def __init__(self, outputs, midpoints, axis):
    assert len(midpoints) + 1 == len(outputs), (len(outputs), len(midpoints))
    self._parts = tuple(outputs)
    self._edges = (None,) + tuple(midpoints) + (None,)
    self._axis = axis

  def _segment(self, i, tree):
    index = (slice(None),) * self._axis + (
        slice(self._edges[i], self._edges[i + 1]),)
    return jax.tree.map(lambda x: x[index], tree)

  def __getattr__(self, name):
    if name.startswith('__'):
      raise AttributeError(name)
    members = tuple(getattr(part, name) for part in self._parts)
    def call(*args, **kwargs):
      results = [
          fn(*self._segment(i, args), **self._segment(i, kwargs))
          for i, fn in enumerate(members)]
      concat = lambda *xs: jnp.concatenate(xs, self._axis)
      return jax.tree.map(concat, *results)
    return call


class Normal(Dist):

  def __init__(self, mean, stddev=1.0):
    self._mean = f32(mean)
    self._std = jnp.broadcast_to(f32(stddev), self._mean.shape)
    self._logstd = jnp.log(self._std)

  def pred(self):
    return self._mean

  @property
  def mean(self):
    return self._mean

  @property
  def stddev(self):
    return self._std

  def sample(self, key, shape=()):
    noise = jax.random.normal(key, shape + self._mean.shape, f32)
    return self._mean + self._std * noise

  def logp(self, value):
    z = (_as_float(value) - self._mean) / self._std
    return -(0.5 * jnp.square(z) + self._logstd + _HALF_LOG_2PI)

  def entropy(self):
    return self._logstd + _HALF_LOG_2PI + 0.5

  def kl(self, other):
    assert isinstance(other, Normal), other
    ratio = jnp.square(self._std / other._std)
    shift = jnp.square((self._mean - other._mean) / other._std)
    return 0.5 * (ratio + shift - 1.0 - jnp.log(ratio))


class Binary(Dist):

  def __init__(self, logit):
    self._logit = f32(logit)
    # log p(1) and log p(0), each computed stably from the logit.
    self._lp1 = jax.nn.log_sigmoid(self._logit)
    self._lp0 = jax.nn.log_sigmoid(-self._logit)

  @property
  def logit(self):
    return self._logit

  def pred(self):
    return self._logit > 0

  def sample(self, key, shape=()):
    return jax.random.bernoulli(
        key, jnp.exp(self._lp1), shape + self._logit.shape)

  def logp(self, value):
    on = f32(value)
    return on * self._lp1 + (1.0 - on) * self._lp0

  def entropy(self):
    p1 = jnp.exp(self._lp1)
    return -(p1 * self._lp1 + (1.0 - p1) * self._lp0)


def _mix_uniform(logprobs, amount):
  """Blend a categorical (given as logprobs) with the uniform distribution."""
  if not amount:
    return logprobs
  count = logprobs.shape[-1]
  return jnp.log((1.0 - amount) * jnp.exp(logprobs) + amount / count)


class Categorical(Dist):
  """Integer-event categorical, parameterized by normalized logprobs."""

  def __init__(self, logits, unimix=0.0):
    self.logprobs = _mix_uniform(jax.nn.log_softmax(f32(logits), -1), unimix)

  @property
  def logits(self):
    return self.logprobs

  def pred(self):
    return jnp.argmax(self.logprobs, -1)

  def sample(self, key, shape=()):
    batch = shape + self.logprobs.shape[:-1]
    return jax.random.categorical(key, self.logprobs, -1, batch)

  def logp(self, value):
    picked = jnp.take_along_axis(
        self.logprobs, value[..., None].astype(jnp.int32), -1)
    return picked[..., 0]

  def entropy(self):
    return -(jnp.exp(self.logprobs) * self.logprobs).sum(-1)

  def kl(self, other):
    gap = self.logprobs - other.logprobs
    return (jnp.exp(self.logprobs) * gap).sum(-1)


class OneHot(Dist):
  """Categorical over one-hot events; samples carry straight-through
  gradients of the class probabilities."""

  def __init__(self, logits, unimix=0.0):
    self.dist = Categorical(logits, unimix)

  @property
  def logits(self):
    return self.dist.logprobs

  def _attach_probs(self, index):
    width = self.logits.shape[-1]
    hard = jax.nn.one_hot(index, width, dtype=f32)
    soft = jnp.exp(self.logits)
    return soft + sg(hard - soft)

  def pred(self):
    return self._attach_probs(self.dist.pred())

  def sample(self, key, shape=()):
    return self._attach_probs(self.dist.sample(key, shape))

  def logp(self, value):
    return (self.logits * value).sum(-1)

  def entropy(self):
    return self.dist.entropy()

  def kl(self, other):
    return self.dist.kl(other.dist)


class TwoHot(Dist):
  """Distributional regression over two-hot encoded bin targets.

  pred() folds symmetric bin pairs before summing, so symmetric bins with
  uniform probabilities give exactly zero — the property the reference
  engineers via a mirrored split-sum (/root/reference/embodied/jax/outs.py:285).
  """

  def __init__(self, logits, bins, squash=None, unsquash=None):
    self.logits = f32(logits)
    self.bins = jnp.asarray(bins, f32)
    assert self.logits.shape[-1] == len(bins), (self.logits.shape, len(bins))
    self.probs = jax.nn.softmax(self.logits, -1)
    self._squash = squash or _identity
    self._unsquash = unsquash or _identity

  def pred(self):
    weighted = self.probs * self.bins
    folded = 0.5 * (weighted + weighted[..., ::-1])
    return self._unsquash(folded.sum(-1))

  def loss(self, target):
    return -(self._encode(target) * jax.nn.log_softmax(self.logits, -1)).sum(-1)

  def _encode(self, target):
    """Two-hot encode: split unit mass between the bracketing bins."""
    target = sg(self._squash(_as_float(target)))
    count = len(self.bins)
    # searchsorted gives the right bracket; clipping the *unclipped*
    # bracket endpoints independently collapses out-of-range targets onto
    # the boundary bin on both sides (below == above there), so a target
    # past the top bin puts all mass on the top bin rather than splitting.
    right = jnp.searchsorted(self.bins, target, side='right')
    below = jnp.clip(right - 1, 0, count - 1)
    above = jnp.clip(right, 0, count - 1)
    degenerate = below == above
    dist_below = jnp.where(degenerate, 1, jnp.abs(self.bins[below] - target))
    dist_above = jnp.where(degenerate, 1, jnp.abs(self.bins[above] - target))
    total = dist_below + dist_above
    weight_below = dist_above / total
    weight_above = dist_below / total
    return (
        jax.nn.one_hot(below, count) * weight_below[..., None] +
        jax.nn.one_hot(above, count) * weight_above[..., None])


def symexp_bins(num):
  """Symmetric exponentially-spaced bins used by symexp_twohot heads."""
  expand = lambda x: np.sign(x) * np.expm1(np.abs(x))
  if num % 2:
    neg = expand(np.linspace(-20, 0, (num - 1) // 2 + 1, dtype=np.float32))
    return np.concatenate([neg, -neg[:-1][::-1]], 0).astype(np.float32)
  neg = expand(np.linspace(-20, 0, num // 2, dtype=np.float32))
  return np.concatenate([neg, -neg[::-1]], 0).astype(np.float32)


# The regression outputs historically exposed `.mean`; keep the attribute
# for callers that introspect it.
MSE.mean = property(lambda self: self._mean)
Huber.mean = property(lambda self: self._mean)
