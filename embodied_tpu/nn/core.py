"""Functional module system: explicit scoped views over a flat param store.

This replaces the reference's ninjax dependency (thread-local context +
metaclass scoping, /root/reference/director/ninjax.py) with an explicit
design that is jit/scan/shard-friendly by construction:

- All parameters and mutable state live in ONE flat dict {path: array}.
- A `Ctx` view is passed explicitly through module calls. `ctx('name')`
  returns a child view with an extended scope; `ctx.param(...)` creates (in
  init mode) or reads (in apply mode) an entry at scope/name.
- Mutable state (normalizer stats, EMA weights, optimizer slots) is written
  through `ctx.write`, which records into an updates dict that pure callers
  merge and return — no hidden side channel, so functions stay pure and
  donation-safe under jit.
- RNG: param init keys are derived by folding the base key with a stable
  hash of the path (order-independent). Sampling keys come from
  `ctx.rng()`, a per-trace counter fold (deterministic under tracing).
  Inside `lax.scan` bodies, keys must be threaded explicitly (see `scan`).

Kinds: 'param' entries are trainable; 'state' entries are buffers. The
optimizer differentiates w.r.t. 'param' entries under given scope prefixes.
"""

import zlib

import jax
import jax.numpy as jnp
import numpy as np

COMPUTE_DTYPE = jnp.bfloat16
PARAM_DTYPE = jnp.float32

# Hook invoked on layer outputs so the device layer can inject
# with_sharding_constraint without the model knowing about meshes.
LAYER_CALLBACK = [None]


def set_compute_dtype(dtype):
  global COMPUTE_DTYPE
  COMPUTE_DTYPE = dtype


def sharding_hint(x, kind='activation'):
  hook = LAYER_CALLBACK[0]
  return hook(x, kind) if hook else x


class Ctx:
  """Scoped view over a flat store. Cheap to fork; shares mutable dicts."""

  __slots__ = ('store', 'create', 'key', 'scope', 'meta', 'updates',
               '_counter', 'frozen', 'recipes')

  def __init__(self, store, create=False, key=None, scope='', meta=None,
               updates=None, counter=None, frozen=False, recipes=None):
    self.store = store
    self.create = create
    self.key = key
    self.scope = scope
    self.meta = meta if meta is not None else {}
    self.updates = updates if updates is not None else {}
    self._counter = counter if counter is not None else [0]
    self.frozen = frozen
    # In create mode, records how each entry is built so callers can
    # re-materialize the store cheaply without tracing the model graph:
    # path -> ('init', init, shape, dtype) | ('copy', src_path).
    self.recipes = recipes if recipes is not None else {}

  def __call__(self, name):
    scope = f'{self.scope}/{name}' if self.scope else str(name)
    return Ctx(self.store, self.create, self.key, scope, self.meta,
               self.updates, self._counter, self.frozen, self.recipes)

  def path(self, name):
    return f'{self.scope}/{name}' if self.scope else str(name)

  def param(self, name, shape, init, dtype=None):
    """Create (init mode) or fetch a trainable parameter. Returns fp32."""
    return self._entry(name, shape, init, dtype or PARAM_DTYPE, 'param')

  def state(self, name, shape, init, dtype=None):
    """Create or fetch a non-trainable buffer."""
    return self._entry(name, shape, init, dtype or PARAM_DTYPE, 'state')

  def _entry(self, name, shape, init, dtype, kind):
    path = self.path(name)
    if path in self.updates:
      return self.updates[path]
    if path in self.store:
      return self.store[path]
    if not self.create:
      raise KeyError(
          f'Entry {path!r} missing from store in apply mode. '
          f'Known: {sorted(self.store.keys())[:8]}...')
    shape = tuple(shape) if hasattr(shape, '__len__') else (shape,)
    if callable(init):
      value = init(self._path_key(path), shape, dtype)
    else:
      value = jnp.full(shape, init, dtype)
    assert value.shape == shape, (path, value.shape, shape)
    self.store[path] = value
    self.meta[path] = kind
    self.recipes[path] = ('init', init, shape, dtype)
    return value

  def write(self, name, value):
    """Record an update to an existing state entry (or param, for EMA)."""
    assert not self.frozen, 'Cannot write through a frozen ctx'
    path = self.path(name)
    if not self.create:
      prev = self.updates.get(path, self.store.get(path))
      assert prev is not None, f'Writing to unknown entry {path!r}'
      assert prev.shape == value.shape, (path, prev.shape, value.shape)
      value = value.astype(prev.dtype)
    self.updates[path] = value

  def write_path(self, path, value):
    """Record an update at an absolute path (used by Optimizer/SlowModel)."""
    assert not self.frozen
    self.updates[path] = value

  def read_path(self, path):
    if path in self.updates:
      return self.updates[path]
    return self.store[path]

  def record_copy(self, dst_path, src_path):
    self.recipes[dst_path] = ('copy', src_path)

  def rng(self, n=None):
    """Fresh PRNG key(s); deterministic per trace via a Python counter."""
    assert self.key is not None, 'Ctx has no RNG key'
    self._counter[0] += 1
    key = jax.random.fold_in(self.key, self._counter[0])
    if n is None:
      return key
    return jax.random.split(key, n)

  def _path_key(self, path):
    assert self.key is not None, 'Ctx has no RNG key for param init'
    return jax.random.fold_in(self.key, zlib.crc32(path.encode()))

  def prefixed(self, prefix):
    """All store paths under a scope prefix (after applying updates)."""
    merged = {**self.store, **self.updates}
    return {k: v for k, v in merged.items() if k.startswith(prefix)}


class Module:
  """Base for layers: holds configuration and a name, never arrays."""

  def __init__(self, name):
    assert isinstance(name, str) and name, name
    self.name = name

  def sub(self, ctx):
    return ctx(self.name)


def scan(ctx, fn, carry, xs=(), length=None, axis=1, unroll=1):
  """Scan `fn(ctx, carry, x) -> carry, out` over time axis `axis` of xs.

  In create mode the body runs once eagerly to materialize parameters, then
  the real lax.scan executes with the populated store. The ctx passed to the
  body is write-frozen: state updates inside scans are disallowed (matching
  the reference design where nj.scan threads explicit carries instead,
  /root/reference/director/ninjax.py:259-280).
  """
  leaves = jax.tree.leaves(xs)
  if length is None:
    assert leaves, 'Provide length when scanning without inputs'
    length = leaves[0].shape[axis]
  frozen = Ctx(ctx.store, ctx.create, ctx.key, ctx.scope, ctx.meta,
               ctx.updates, ctx._counter, frozen=True)
  if ctx.create:
    first = jax.tree.map(
        lambda x: jax.lax.index_in_dim(x, 0, axis, keepdims=False), xs)
    fn(ctx, carry, first)  # Creates params; outputs discarded.
    frozen = Ctx(ctx.store, False, ctx.key, ctx.scope, ctx.meta,
                 ctx.updates, ctx._counter, frozen=True)

  swapped = jax.tree.map(lambda x: jnp.moveaxis(x, axis, 0), xs)

  def body(carry, x):
    new_carry, out = fn(frozen, carry, x)
    return new_carry, out

  carry, outs = jax.lax.scan(body, carry, swapped, length=length,
                             unroll=unroll)
  outs = jax.tree.map(lambda x: jnp.moveaxis(x, 0, axis), outs)
  return carry, outs


def pure(fn, meta=None):
  """Wrap a ctx-taking function into (store, key, *args) -> (updates, out).

  The returned function is pure: it never mutates the input store and
  returns the updates dict separately so callers control merging/donation.
  `meta` is the param/state kind map produced by `init`; pass it when the
  function needs to distinguish trainable params (e.g. uses an Optimizer).
  """
  def wrapper(store, key, *args, **kwargs):
    ctx = Ctx(dict(store), create=False, key=key, meta=dict(meta or {}))
    out = fn(ctx, *args, **kwargs)
    return ctx.updates, out
  return wrapper


def init(fn):
  """Wrap a ctx-taking function into (key, *args) -> (store, meta)."""
  def wrapper(key, *args, **kwargs):
    ctx = Ctx({}, create=True, key=key)
    fn(ctx, *args, **kwargs)
    store = {**ctx.store}
    for path, value in ctx.updates.items():
      store[path] = value
    return store, dict(ctx.meta)
  return wrapper


def cast(xs, force=False):
  """Cast floating arrays to the compute dtype (uint8 etc. untouched)."""
  def fn(x):
    if x is None:
      return x
    x = jnp.asarray(x)
    if force and jnp.issubdtype(x.dtype, jnp.integer):
      return x.astype(COMPUTE_DTYPE)
    if jnp.issubdtype(x.dtype, jnp.floating):
      return x.astype(COMPUTE_DTYPE)
    return x
  return jax.tree.map(fn, xs)


def f32(xs):
  return jax.tree.map(lambda x: jnp.asarray(x).astype(jnp.float32), xs)


def act(name):
  if name == 'none':
    return lambda x: x
  if name == 'mish':
    return lambda x: x * jnp.tanh(jax.nn.softplus(x))
  return getattr(jax.nn, name)


def symlog(x):
  return jnp.sign(x) * jnp.log1p(jnp.abs(x))


def symexp(x):
  return jnp.sign(x) * jnp.expm1(jnp.abs(x))


def where(condition, xs, ys):
  assert condition.ndim == 1, condition.shape
  def fn(x, y):
    c = condition
    while c.ndim < x.ndim:
      c = c[..., None]
    return jnp.where(c, x, y)
  return jax.tree.map(fn, xs, ys)


def mask(xs, m):
  def fn(x):
    mm = m
    while mm.ndim < x.ndim:
      mm = mm[..., None]
    return x * mm.astype(x.dtype)
  return jax.tree.map(fn, xs)


def available(*xs):
  return all(x is not None for x in xs)


class Initializer:
  """Weight initializers with fan modes.

  Parity: /root/reference/embodied/jax/nets.py:144-197 behaviors
  (trunc_normal, normal, uniform, zeros, with fan in/out/avg scaling).
  """

  def __init__(self, dist='trunc_normal', fan='in', scale=1.0):
    self.dist = dist
    self.fan = fan
    self.scale = scale

  @classmethod
  def parse(cls, spec, scale=1.0):
    # e.g. 'trunc_normal_in', 'normal_avg', 'uniform_out', 'zeros'
    if isinstance(spec, cls):
      return cls(spec.dist, spec.fan, spec.scale * scale)
    parts = spec.split('_')
    if parts[-1] in ('in', 'out', 'avg'):
      fan = parts[-1]
      dist = '_'.join(parts[:-1])
    else:
      fan = 'in'
      dist = spec
    return cls(dist, fan, scale)

  def __call__(self, key, shape, dtype=PARAM_DTYPE):
    shape = tuple(shape)
    if self.dist == 'zeros' or self.scale == 0.0:
      return jnp.zeros(shape, dtype)
    fan_in, fan_out = self._fans(shape)
    fan = {'in': fan_in, 'out': fan_out,
           'avg': (fan_in + fan_out) / 2}[self.fan]
    std = np.sqrt(self.scale / max(1.0, fan))
    if self.dist == 'trunc_normal':
      # Compensate truncation to keep the requested std.
      value = std / 0.87962566 * jax.random.truncated_normal(
          key, -2.0, 2.0, shape, jnp.float32)
    elif self.dist == 'normal':
      value = std * jax.random.normal(key, shape, jnp.float32)
    elif self.dist == 'uniform':
      limit = np.sqrt(3.0) * std
      value = jax.random.uniform(
          key, shape, jnp.float32, -limit, limit)
    elif self.dist == 'normed':
      value = jax.random.uniform(key, shape, jnp.float32, -1, 1)
      value *= self.scale / jnp.linalg.norm(
          value.reshape((-1, shape[-1])), 2, 0)
    else:
      raise NotImplementedError(self.dist)
    return value.astype(dtype)

  def _fans(self, shape):
    if len(shape) == 0:
      return 1, 1
    if len(shape) == 1:
      return shape[0], shape[0]
    if len(shape) == 2:
      return shape[0], shape[1]
    # Conv kernels: (..., spatial, in, out)
    receptive = int(np.prod(shape[:-2]))
    return shape[-2] * receptive, shape[-1] * receptive
