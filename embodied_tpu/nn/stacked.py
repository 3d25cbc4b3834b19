"""Scan-over-layers: a stack of identical layers compiled once.

Capability parity: /root/reference/embodied/jax/utils.py LayerScan — N
layers with separate weights share ONE compiled body; parameters get a
leading layer dimension and the forward pass runs as a lax.scan over it.
This keeps compile time O(1) in depth for deep residual stacks.

The wrapped layer must be a pure function of (ctx, x) -> x (same shapes in
and out, e.g. a pre-norm transformer block).
"""

import jax
import jax.numpy as jnp

from .core import Ctx, Module


class StackedLayers(Module):

  def __init__(self, layer, count, name):
    super().__init__(name)
    self.layer = layer
    self.count = count

  def __call__(self, ctx, x):
    p = self.sub(ctx)
    if ctx.create:
      self._create(p, x)
    paths = sorted(
        k for k in {**p.store, **p.updates}
        if k.startswith(p.scope + '/'))
    stacked = {path: p.read_path(path) for path in paths}
    rel = {path: path[len(p.scope) + 1:] for path in paths}
    meta = ctx.meta

    def body(carry, layer_params):
      lctx = Ctx(dict(layer_params), create=False, key=p.key, meta=meta,
                 frozen=True)
      out = self.layer(lctx, carry)
      return out, None

    xs = {rel[path]: stacked[path] for path in paths}
    out, _ = jax.lax.scan(body, x, xs, length=self.count)
    return out

  def _create(self, p, x):
    # Trace one layer to collect its parameter recipes, then materialize
    # stacked (L, ...) parameters with per-layer init keys.
    scratch = Ctx({}, create=True, key=p.rng())
    self.layer(scratch, x)
    for path, recipe in scratch.recipes.items():
      kind, init, shape, dtype = recipe
      assert kind == 'init', (path, kind)
      meta_kind = scratch.meta[path]
      if callable(init):
        def stacked_init(key, full_shape, dtype, _init=init,
                         _shape=tuple(shape)):
          keys = jax.random.split(key, self.count)
          return jax.vmap(lambda k: _init(k, _shape, dtype))(keys)
      else:
        stacked_init = init
      entry = p.param if meta_kind == 'param' else p.state
      entry(path, (self.count, *shape), stacked_init, dtype)
