"""Actor-critic objectives for imagination training.

Re-derived from the math in /root/reference/dreamerv3/agent.py:382-491
(imagination policy/value losses, replay value loss, TD(lambda) returns)
with a TPU-first return computation: the lambda-return recurrence
R_t = a_t + b_t * R_{t+1} is an affine linear recurrence, so it is solved
with `jax.lax.associative_scan` in O(log T) depth instead of a sequential
reverse scan — XLA maps the combine onto wide fused elementwise ops.
"""

import jax
import jax.numpy as jnp
import numpy as np

f32 = jnp.float32
sg = jax.lax.stop_gradient


def lambda_return(last, term, rew, val, boot, disc, lam):
  """TD(lambda) returns via an associative scan over the affine recurrence.

  R_t = a_t + b_t * R_{t+1} with
    a_t = r_{t+1} + (1 - lam*keep_{t+1}) * disc*alive_{t+1} * boot_{t+1}
    b_t = disc*alive_{t+1} * lam*keep_{t+1}
  and R at the horizon equal to boot[:, -1]. Composition of affine maps is
  associative, so the suffix products are computed in log depth.
  """
  shapes = {x.shape for x in (last, term, rew, val, boot)}
  assert len(shapes) == 1, shapes
  alive = disc * (1.0 - f32(term))[:, 1:]
  keep = lam * (1.0 - f32(last))[:, 1:]
  offs = rew[:, 1:] + (1.0 - keep) * alive * boot[:, 1:]
  gains = alive * keep

  def compose(later, earlier):
    # associative_scan(reverse=True) feeds the accumulated suffix first.
    a_suf, b_suf = later
    a_t, b_t = earlier
    return a_t + b_t * a_suf, b_t * b_suf

  # Suffix composition: element t ends up holding g_t о g_{t+1} о ... .
  offs, gains = jax.lax.associative_scan(
      compose, (offs, gains), reverse=True, axis=1)
  return offs + gains * boot[:, -1:]


class Targets:
  """Denormalized value/target views shared by both objectives."""

  def __init__(self, ctx, value, slowvalue, valnorm, slowtar):
    shift, spread = valnorm.stats(ctx)
    self.val = value.pred() * spread + shift
    self.slowval = slowvalue.pred() * spread + shift
    self.tarval = self.slowval if slowtar else self.val


def _value_objective(value, slowvalue, normed_target, weight, slowreg):
  """Twohot/MSE regression onto the normalized return + EMA regularizer."""
  padded = jnp.concatenate([normed_target, 0 * normed_target[:, -1:]], 1)
  regularizer = slowreg * value.loss(sg(slowvalue.pred()))
  return weight[:, :-1] * (value.loss(sg(padded)) + regularizer)[:, :-1]


def imag_loss(
    ctx, act, rew, con, policy, value, slowvalue, retnorm, valnorm, advnorm,
    update, contdisc=True, slowtar=False, horizon=333, lam=0.95,
    actent=3e-4, slowreg=1.0):
  """Policy + value objectives on imagined trajectories."""
  tg = Targets(ctx, value, slowvalue, valnorm, slowtar)
  disc = 1.0 if contdisc else 1.0 - 1.0 / horizon
  # Trajectory weight: survival probability accumulated along imagination.
  weight = jnp.cumprod(disc * con, 1) / disc
  ret = lambda_return(
      jnp.zeros_like(con), 1.0 - con, rew, tg.tarval, tg.tarval, disc, lam)

  ret_shift, ret_spread = retnorm(ctx, ret, update)
  adv = (ret - tg.tarval[:, :-1]) / ret_spread
  adv_shift, adv_spread = advnorm(ctx, adv, update)
  adv_normed = (adv - adv_shift) / adv_spread
  logpi = sum(dist.logp(sg(act[key]))[:, :-1] for key, dist in policy.items())
  ents = {key: dist.entropy()[:, :-1] for key, dist in policy.items()}
  surrogate = logpi * sg(adv_normed) + actent * sum(ents.values())

  val_shift, val_spread = valnorm(ctx, ret, update)
  tar_normed = (ret - val_shift) / val_spread
  losses = {
      'policy': sg(weight[:, :-1]) * -surrogate,
      'value': _value_objective(
          value, slowvalue, tar_normed, sg(weight), slowreg),
  }

  ret_normed = (ret - ret_shift) / ret_spread
  metrics = _diagnostics(
      adv=adv, rew=rew, con=con, weight=weight, ret=ret_normed,
      val=tg.val, slowval=tg.slowval, tar=tar_normed)
  for key, ent in ents.items():
    metrics[f'ent/{key}'] = ent.mean()
    dist = policy[key]
    if hasattr(dist, 'minent'):
      span = max(dist.maxent - dist.minent, 1e-8)
      metrics[f'rand/{key}'] = (ent.mean() - dist.minent) / span
  return losses, {'ret': ret}, metrics


def repl_loss(
    ctx, last, term, rew, boot, value, slowvalue, valnorm, update=True,
    slowreg=1.0, slowtar=False, horizon=333, lam=0.95):
  """Value regression on replayed steps, bootstrapped from imagination."""
  tg = Targets(ctx, value, slowvalue, valnorm, slowtar)
  disc = 1.0 - 1.0 / horizon
  ret = lambda_return(last, term, rew, tg.tarval, boot, disc, lam)
  shift, spread = valnorm(ctx, ret, update)
  loss = _value_objective(
      value, slowvalue, (ret - shift) / spread, f32(~last), slowreg)
  return {'repval': loss}, {'ret': ret}, {}


def _diagnostics(adv, rew, con, weight, ret, val, slowval, tar):
  """The standard scalar summary suite for the imagination objectives."""
  metrics = {
      key: value.mean()
      for key, value in dict(
          adv=adv, rew=rew, con=con, weight=weight, ret=ret, val=val,
          slowval=slowval, tar=tar).items()}
  metrics['adv_std'] = adv.std()
  metrics['adv_mag'] = jnp.abs(adv).mean()
  metrics['ret_min'] = ret.min()
  metrics['ret_max'] = ret.max()
  metrics['ret_rate'] = (jnp.abs(ret) >= 1.0).mean()
  return metrics


def openloop_video(true, obs_recon, img_recon, split):
  """Side-by-side truth/prediction/error video with phase-colored borders.

  The first `split` frames (green border) are posterior reconstructions;
  the rest (red border) are open-loop imagination.
  """
  i32 = jnp.int32
  pred = jnp.concatenate([obs_recon, img_recon], 1)
  pred = jnp.clip(pred * 255, 0, 255).astype(jnp.uint8)
  error = ((i32(pred) - i32(true) + 255) // 2).astype(np.uint8)
  panel = jnp.concatenate([true, pred, error], 2)
  frames = panel.shape[1]
  panel = jnp.pad(panel, [[0, 0], [0, 0], [2, 2], [2, 2], [0, 0]])
  interior = jnp.zeros(panel.shape, bool).at[:, :, 2:-2, 2:-2, :].set(True)
  edge = jnp.where(
      (jnp.arange(frames) < split)[:, None],
      jnp.array([0, 255, 0], jnp.uint8),
      jnp.array([255, 0, 0], jnp.uint8))
  panel = jnp.where(interior, panel, edge[None, :, None, None, :])
  B, T, H, W, C = panel.shape
  return panel.transpose((1, 2, 0, 3, 4)).reshape((T, H, B * W, C))
