"""Exploration stack for Director: disagreement ensemble + flat behaviors.

Capability parity: /root/reference/director/expl.py (Disag — a
Plan2Explore-style one-step-model disagreement ensemble) and
/root/reference/director/behaviors.py (Greedy/Random/Explore behavior
selection), re-designed for TPU: the reference instantiates
`disag_models` separate MLPs and loops over them (N small matmuls); here
the whole ensemble is ONE set of batched parameters with a leading
ensemble axis, so each layer is a single `end,edu->enu` einsum that tiles
onto the MXU as one large contraction.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn
from ...utils import Space

f32 = jnp.float32
sg = jax.lax.stop_gradient


class EnsembleMLP(nn.Module):
  """E independent MLPs evaluated jointly via batched einsum layers."""

  def __init__(self, name, models, layers, units, outdim, act='silu'):
    super().__init__(name)
    self.models = models
    self.layers = layers
    self.units = units
    self.outdim = outdim
    self.act = act
    self._winit = nn.Initializer.parse('trunc_normal_in')

  def _layer(self, p, x, index, width):
    # x: (E, N, D) -> (E, N, width); one einsum for all members.
    kernel = p.param(
        f'kernel{index}', (self.models, x.shape[-1], width),
        self._ensemble_init)
    bias = p.param(f'bias{index}', (self.models, 1, width), 0.0)
    return jnp.einsum('end,edu->enu', x, nn.cast(kernel)) + nn.cast(bias)

  def _ensemble_init(self, key, shape, dtype):
    # Each member gets an independent fan-in init.
    keys = jax.random.split(key, shape[0])
    slices = [self._winit(k, shape[1:], dtype) for k in keys]
    return jnp.stack(slices, 0)

  def _norm(self, p, x, index):
    scale = p.param(f'norm{index}', (self.models, 1, x.shape[-1]), 1.0)
    x = nn.f32(x)
    rms = jnp.sqrt(jnp.square(x).mean(-1, keepdims=True) + 1e-6)
    return nn.cast(x / rms) * nn.cast(scale)

  def __call__(self, ctx, x):
    """x: (N, D) -> member predictions (E, N, outdim)."""
    p = self.sub(ctx)
    x = jnp.broadcast_to(nn.cast(x)[None], (self.models, *x.shape))
    for i in range(self.layers):
      x = self._layer(p, x, i, self.units)
      x = self._norm(p, x, i)
      x = nn.act(self.act)(x)
    return self._layer(p, x, self.layers, self.outdim)


class Disag(nn.Module):
  """One-step latent-prediction ensemble; reward = member disagreement.

  Predicts the next flattened stochastic state from (deter, stoch, action);
  the exploration reward is the per-feature std across ensemble members.
  Matches /root/reference/director/expl.py:11-38 semantics on batched
  (B, T, ...) trajectories.
  """

  def __init__(self, name, act_space, target_dim, models=8, layers=2,
               units=256, act='silu'):
    super().__init__(name)
    self.act_space = act_space
    self.target_dim = target_dim
    self.net = EnsembleMLP(
        'ens', models, layers, units, target_dim, act)

  def _inputs(self, traj, prefix='act_'):
    feats = [nn.cast(traj['deter']), nn.cast(traj['stoch_flat'])]
    for key, space in self.act_space.items():
      act = traj[f'{prefix}{key}']
      if space.discrete and not jnp.issubdtype(act.dtype, jnp.floating):
        act = jax.nn.one_hot(act, space.classes)
      act = nn.cast(nn.f32(act))
      feats.append(act.reshape((*act.shape[:2], -1)))
    return jnp.concatenate(feats, -1)

  def _predict(self, ctx, inputs):
    B, T, D = inputs.shape
    preds = self.net(self.sub(ctx), inputs.reshape((B * T, D)))
    return preds.reshape((preds.shape[0], B, T, self.target_dim))

  def reward(self, ctx, traj, prefix='act_'):
    """Disagreement intrinsic reward, shaped like (B, T)."""
    preds = self._predict(ctx, sg(self._inputs(traj, prefix)))
    return nn.f32(preds).std(0).mean(-1)

  def loss(self, ctx, traj, prefix='act_'):
    """Ensemble regression: (state_t, act_t) -> stoch_{t+1}."""
    inputs = sg(self._inputs(traj, prefix)[:, :-1])
    target = sg(nn.f32(traj['stoch_flat'][:, 1:]))
    preds = nn.f32(self._predict(ctx, inputs))
    err = jnp.square(preds - target[None]).mean((-1, -2, -3))
    return err.sum()


class RandomBehavior:
  """Uniform action sampling, for expl_behavior=random rollouts."""

  def __init__(self, act_space):
    self.act_space = act_space

  def policy(self, ctx, feat, key):
    batch = feat['deter'].shape[0]
    acts = {}
    for index, (name, space) in enumerate(sorted(self.act_space.items())):
      k = jax.random.fold_in(key, index)
      if space.discrete:
        acts[name] = jax.random.randint(
            k, (batch, *space.shape), 0, space.classes, jnp.int32)
      else:
        lo = np.where(np.isfinite(space.low), space.low, -1.0)
        hi = np.where(np.isfinite(space.high), space.high, 1.0)
        acts[name] = jax.random.uniform(
            k, (batch, *space.shape), f32, lo, hi)
    return acts
