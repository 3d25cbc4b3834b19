"""Optimizer over param-store subsets with fused AGC/RMS/momentum update.

Capability parity: /root/reference/embodied/jax/opt.py — gradient descent
w.r.t. the parameters under given module scopes, adaptive gradient clipping,
RMS scaling, momentum with bias correction, weight decay by path regex,
warmup + const/linear/cosine schedules, cross-device gradient pmean when
running under shard_map, and grad/update/param statistics.

Unlike the reference (optax chain over an opaque state pytree), slots are
named entries in the same flat store ('<opt>/rms/<param_path>' etc.), so
checkpointing and sharding rules treat them uniformly with params: each
slot shards exactly like its parameter.
"""

import re

import jax
import numpy as np
import jax.numpy as jnp

from .core import Ctx, Module

f32 = jnp.float32
i32 = jnp.int32
sg = jax.lax.stop_gradient

# Set by the transform layer when running inside shard_map: names of mesh
# axes that batch data is split over, for explicit gradient pmean.
DATA_AXES = [()]


def get_data_axes():
  return DATA_AXES[0]


class Optimizer(Module):

  def __init__(
      self, scopes, name='opt', lr=4e-5, agc=0.3, eps=1e-20, beta1=0.9,
      beta2=0.999, momentum=True, nesterov=False, wd=0.0, wdregex=r'/kernel$',
      schedule='const', warmup=1000, anneal=0, pmin=1e-3, summary_depth=2,
      fused=True):
    super().__init__(name)
    # fused=True keeps one flat slot vector per moment and runs the
    # RMS/momentum math as a handful of ops over it, instead of ~15 ops per
    # parameter tensor; this shrinks the train graph (and its compile time)
    # substantially for models with hundreds of parameters.
    self.fused = fused
    self.scopes = tuple(scopes) if isinstance(scopes, (list, tuple)) else (
        scopes,)
    self.lr = lr
    self.agc = agc
    self.eps = eps
    self.beta1 = beta1
    self.beta2 = beta2
    self.momentum = momentum
    self.nesterov = nesterov
    self.wd = wd
    self.wdpattern = re.compile(wdregex) if wd else None
    self.schedule = schedule
    self.warmup = warmup
    self.anneal = anneal
    self.pmin = pmin
    self.summary_depth = summary_depth
    self._printed = False

  def _scope_paths(self, ctx, scopes):
    merged = {**ctx.store, **ctx.updates}
    prefixes = tuple(
        s if isinstance(s, str) else s.name for s in scopes)
    # Scopes are resolved relative to the ctx the optimizer is called with.
    base = ctx.scope + '/' if ctx.scope else ''
    full = [base + p for p in prefixes]
    out = {}
    for key, value in merged.items():
      if ctx.meta.get(key) != 'param':
        continue
      if any(key == p or key.startswith(p + '/') for p in full):
        out[key] = value
    return out

  def __call__(self, ctx, lossfn, *args, has_aux=False, **kwargs):
    p = self.sub(ctx)
    metrics = {}

    if ctx.create:
      # Creation pass: run the loss once to materialize model params, then
      # allocate slots. No parameter update happens during creation.
      out = lossfn(ctx, *args, **kwargs)
      loss, aux = out if has_aux else (out, None)
      params = self._scope_paths(ctx, self.scopes)
      assert params, (
          f'No trainable params found under scopes {self.scopes}')
      self._make_slots(p, params)
      if not self._printed:
        counts = {k: v.size for k, v in params.items()}
        print(self._summarize(counts, self.summary_depth))
        self._printed = True
      metrics[f'{self.name}/loss'] = f32(loss)
      return (metrics, aux) if has_aux else metrics

    params = self._scope_paths(ctx, self.scopes)

    from . import core as nncore
    scaling = nncore.COMPUTE_DTYPE == jnp.float16
    if scaling:
      grad_scale = p.state('grad_scale', (), 1e4, f32)
      good_steps = p.state('good_steps', (), 0, i32)

    def lossfn2(params2):
      store = {**ctx.store, **ctx.updates, **params2}
      ictx = Ctx(store, create=False, key=ctx.key, scope=ctx.scope,
                 meta=ctx.meta, updates={}, counter=ctx._counter)
      out = lossfn(ictx, *args, **kwargs)
      loss, aux = out if has_aux else (out, None)
      assert loss.dtype == f32, (self.name, loss.dtype)
      assert loss.shape == (), (self.name, loss.shape)
      if scaling:
        loss = loss * sg(grad_scale)
      return loss, (aux, ictx.updates)

    (loss, (aux, inner_updates)), grads = jax.value_and_grad(
        lossfn2, has_aux=True)(params)

    axes = get_data_axes()
    if axes:
      grads = jax.tree.map(lambda x: jax.lax.pmean(x, axes), grads)

    finite = jnp.array(True)
    if scaling:
      loss = loss / grad_scale
      grads = jax.tree.map(lambda x: x / grad_scale, grads)
      gnorm = sum(jnp.square(g).sum() for g in grads.values())
      finite = jnp.isfinite(gnorm)
      # Dynamic scale: halve on overflow, double after 1000 good steps.
      keep = finite & (good_steps < 1000)
      incr = finite & (good_steps >= 1000)
      p.write('good_steps', jnp.where(finite, good_steps + 1, 0))
      p.write('grad_scale', jnp.clip(
          jnp.where(incr, grad_scale * 2,
                    jnp.where(keep, grad_scale, grad_scale / 2)),
          1e-4, 1e5))
      grads = jax.tree.map(
          lambda x: jnp.where(finite, x, jnp.zeros_like(x)), grads)

    step = p.state('step', (), 0, i32)
    lr = self._lr(step)
    if self.fused:
      new_params, stats = self._fused_update(p, params, grads, step, lr)
    else:
      new_params, stats = self._perparam_update(p, params, grads, step, lr)
    if scaling:
      # Skip the update entirely on overflow steps.
      new_params = {
          k: jnp.where(finite, v, params[k]) for k, v in new_params.items()}
      metrics['grad_scale'] = grad_scale
      metrics['grad_overflow'] = f32(~finite)
    gsq_total, usq_total, psq_total, count = stats
    p.write('step', step + jnp.where(finite, 1, 0))
    # State updates recorded inside the loss (normalizers etc.) first, then
    # the parameter updates, which must win on any overlap.
    for path, value in inner_updates.items():
      ctx.write_path(path, value)
    for path, value in new_params.items():
      ctx.write_path(path, value)

    metrics['loss'] = loss.mean()
    metrics['updates'] = f32(step + 1)
    metrics['grad_norm'] = jnp.sqrt(gsq_total)
    metrics['grad_rms'] = jnp.sqrt(gsq_total / count)
    metrics['update_rms'] = jnp.sqrt(usq_total / count)
    metrics['param_rms'] = jnp.sqrt(psq_total / count)
    metrics['param_count'] = f32(count)
    metrics['lr'] = lr
    metrics = {f'{self.name}/{k}': v for k, v in metrics.items()}
    return (metrics, aux) if has_aux else metrics

  def _perparam_update(self, p, params, grads, step, lr):
    new_params = {}
    gsq = usq = psq = 0.0
    count = 0
    for path, grad in grads.items():
      param = params[path]
      update = grad
      if self.agc:
        unorm = jnp.linalg.norm(update.ravel())
        pnorm = jnp.linalg.norm(param.ravel())
        upper = self.agc * jnp.maximum(self.pmin, pnorm)
        update = update * (1 / jnp.maximum(1.0, unorm / upper))
      slot = path.replace('/', '.')
      nu = p.state(f'rms.{slot}', param.shape, 0.0, f32)
      nu = self.beta2 * nu + (1 - self.beta2) * jnp.square(update)
      p.write(f'rms.{slot}', nu)
      nu_hat = nu / (1 - self.beta2 ** f32(step + 1))
      update = update / (jnp.sqrt(nu_hat) + self.eps)
      if self.momentum:
        mu = p.state(f'mom.{slot}', param.shape, 0.0, f32)
        mu = self.beta1 * mu + (1 - self.beta1) * update
        p.write(f'mom.{slot}', mu)
        if self.nesterov:
          mu_use = self.beta1 * mu + (1 - self.beta1) * update
        else:
          mu_use = mu
        update = mu_use / (1 - self.beta1 ** f32(step + 1))
      if self.wd and self.wdpattern.search(path):
        update = update + self.wd * param
      update = -lr * update
      new_params[path] = param + update
      gsq += jnp.square(grad).sum()
      usq += jnp.square(update).sum()
      psq += jnp.square(param).sum()
      count += param.size
    return new_params, (gsq, usq, psq, count)

  def _layout(self, params):
    paths = sorted(params.keys())
    sizes = [int(np.prod(params[p].shape)) for p in paths]
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    return paths, sizes, offsets

  def _fused_update(self, p, params, grads, step, lr):
    paths, sizes, offsets = self._layout(params)
    total = int(offsets[-1])
    assert all(params[k].dtype == jnp.float32 for k in paths), (
        'fused optimizer requires fp32 params')

    pieces = []
    wd_pieces = []
    for path in paths:
      grad, param = grads[path], params[path]
      update = grad
      if self.agc:
        unorm = jnp.linalg.norm(update.ravel())
        pnorm = jnp.linalg.norm(param.ravel())
        upper = self.agc * jnp.maximum(self.pmin, pnorm)
        update = update * (1 / jnp.maximum(1.0, unorm / upper))
      pieces.append(update.ravel())
      if self.wd:
        mask = float(bool(self.wdpattern.search(path)))
        wd_pieces.append(jnp.full((param.size,), mask, f32))
    vec = jnp.concatenate(pieces)
    pvec = jnp.concatenate([params[k].ravel() for k in paths])

    nu = p.state('rms_flat', (total,), 0.0, f32)
    nu = self.beta2 * nu + (1 - self.beta2) * jnp.square(vec)
    p.write('rms_flat', nu)
    nu_hat = nu / (1 - self.beta2 ** f32(step + 1))
    vec = vec / (jnp.sqrt(nu_hat) + self.eps)
    if self.momentum:
      mu = p.state('mom_flat', (total,), 0.0, f32)
      mu = self.beta1 * mu + (1 - self.beta1) * vec
      p.write('mom_flat', mu)
      if self.nesterov:
        mu_use = self.beta1 * mu + (1 - self.beta1) * vec
      else:
        mu_use = mu
      vec = mu_use / (1 - self.beta1 ** f32(step + 1))
    if self.wd:
      vec = vec + self.wd * jnp.concatenate(wd_pieces) * pvec
    vec = -lr * vec
    new_pvec = pvec + vec

    new_params = {}
    for path, size, offset in zip(paths, sizes, offsets[:-1]):
      new_params[path] = jax.lax.dynamic_slice_in_dim(
          new_pvec, int(offset), size).reshape(params[path].shape)
    gsq = sum(jnp.square(g).sum() for g in grads.values())
    usq = jnp.square(vec).sum()
    psq = jnp.square(pvec).sum()
    return new_params, (gsq, usq, psq, total)

  def _make_slots(self, p, params):
    p.state('step', (), 0, i32)
    from . import core as nncore
    if nncore.COMPUTE_DTYPE == jnp.float16:
      p.state('grad_scale', (), 1e4, f32)
      p.state('good_steps', (), 0, i32)
    if self.fused:
      total = int(sum(int(np.prod(v.shape)) for v in params.values()))
      p.state('rms_flat', (total,), 0.0, f32)
      if self.momentum:
        p.state('mom_flat', (total,), 0.0, f32)
      return
    for path, param in params.items():
      slot = path.replace('/', '.')
      p.state(f'rms.{slot}', param.shape, 0.0, f32)
      if self.momentum:
        p.state(f'mom.{slot}', param.shape, 0.0, f32)

  def _lr(self, step):
    step = f32(step)
    lr = jnp.asarray(self.lr, f32)
    if self.schedule == 'const':
      sched = lr
    elif self.schedule == 'linear':
      frac = jnp.clip(
          (step - self.warmup) / max(1, self.anneal - self.warmup), 0, 1)
      sched = lr * (1 - 0.9 * frac)
    elif self.schedule == 'cosine':
      frac = jnp.clip(
          (step - self.warmup) / max(1, self.anneal - self.warmup), 0, 1)
      sched = 0.1 * lr + 0.45 * lr * (1 + jnp.cos(jnp.pi * frac))
    else:
      raise NotImplementedError(self.schedule)
    if self.warmup:
      ramp = jnp.clip(step / self.warmup, 0, 1)
      sched = jnp.where(step < self.warmup, lr * ramp, sched)
    return sched

  def _summarize(self, counts, depth):
    prefixes = set()
    for key in counts:
      parts = key.split('/')
      prefixes.update(
          '/'.join(parts[:i + 1]) for i in range(min(len(parts), depth)))
    subcounts = {
        prefix: sum(v for k, v in counts.items() if k.startswith(prefix))
        for prefix in prefixes}
    lines = [f'Optimizer {self.name} has {sum(counts.values()):,} params:']
    for prefix, count in sorted(subcounts.items(), key=lambda x: -x[1]):
      lines.append(f'{count:>14,} {prefix}')
    return '\n'.join(lines)
