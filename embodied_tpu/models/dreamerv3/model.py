"""DreamerV3: world model + imagination actor-critic.

Capability parity: /root/reference/dreamerv3/agent.py — encoder/RSSM/decoder
with reward/continue/policy/value heads, EMA slow value, return/value/adv
normalizers, replay-context truncated-carry resume (stored latents), the
imagination loss on `imag_length` rollouts from observed starts, the replay
value loss bootstrapped from imagination returns, and open-loop video
reports.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn
from ...utils import Space, tree
from . import rssm

f32 = jnp.float32
i32 = jnp.int32
sg = lambda xs, skip=False: xs if skip else jax.lax.stop_gradient(xs)
prefix_keys = lambda xs, p: {f'{p}/{k}': v for k, v in xs.items()}
concat = lambda xs, a: jax.tree.map(lambda *x: jnp.concatenate(x, a), *xs)
isimage = lambda s: s.dtype == np.uint8 and len(s.shape) == 3


class Model:
  """DreamerV3 model implementing the parallel.Agent contract."""

  def __init__(self, obs_space, act_space, config):
    self.obs_space = obs_space
    self.act_space = {k: v for k, v in act_space.items() if k != 'reset'}
    self.config = config
    acfg = config.agent
    self.acfg = acfg

    exclude = ('is_first', 'is_last', 'is_terminal', 'reward')
    spaces = {k: v for k, v in obs_space.items()
              if k not in exclude and not k.startswith('log/')}
    self.enc = {'simple': rssm.Encoder}[acfg.enc.typ](
        spaces, 'enc', **dict(acfg.enc[acfg.enc.typ]))
    self.dyn = {'rssm': rssm.RSSM}[acfg.dyn.typ](
        self.act_space, 'dyn', **dict(acfg.dyn[acfg.dyn.typ]))
    self.dec = {'simple': rssm.Decoder}[acfg.dec.typ](
        spaces, 'dec', **dict(acfg.dec[acfg.dec.typ]))

    scalar = Space(np.float32, ())
    binary = Space(bool, (), 0, 2)
    self.rew = nn.MLPHead(scalar, acfg.rewhead.output, 'rew',
                          **_strip(dict(acfg.rewhead)))
    self.con = nn.MLPHead(binary, acfg.conhead.output, 'con',
                          **_strip(dict(acfg.conhead)))
    d1, d2 = acfg.policy_dist_disc, acfg.policy_dist_cont
    pouts = {k: d1 if v.discrete else d2 for k, v in self.act_space.items()}
    self.pol = nn.MLPHead(self.act_space, pouts, 'pol', **dict(acfg.policy))
    self.val = nn.MLPHead(scalar, acfg.value.output, 'val',
                          **_strip(dict(acfg.value)))
    self.slowval = nn.SlowModel(
        nn.MLPHead(scalar, acfg.value.output, 'slowval',
                   **_strip(dict(acfg.value))),
        source=self.val, **dict(acfg.slowvalue))

    self.retnorm = nn.Normalize(**dict(acfg.retnorm), name='retnorm')
    self.valnorm = nn.Normalize(**dict(acfg.valnorm), name='valnorm')
    self.advnorm = nn.Normalize(**dict(acfg.advnorm), name='advnorm')

    self.opt = nn.Optimizer(
        ['enc', 'dyn', 'dec', 'rew', 'con', 'pol', 'val'], 'opt',
        **dict(acfg.opt))

    scales = dict(acfg.loss_scales)
    rec = scales.pop('rec')
    scales.update({k: rec for k in spaces})
    self.scales = scales

  @property
  def policy_keys(self):
    return r'^(enc|dyn|dec|pol)/'

  @property
  def partition_rules(self):
    # FSDP over 'f' on the output dim of big kernels; BlockLinear kernels
    # (g, din, dout) shard the block-local output dim.
    return [
        (r'dyn/.*(dyngru|dynhid\d*)/kernel$', (None, None, ('f', 't'))),
        (r'/(kernel|embed)$', (None, ('f', 't'))),
    ]

  @property
  def latent_keys(self):
    """Replay keys eligible for the device-resident latent table (the
    packed replay-context latents; see parallel/latents.py)."""
    if not self.config.replay_context:
      return ()
    return tuple(tree.flatdict(dict(
        enc=self.enc.entry_space,
        dyn=self.dyn.entry_space,
        dec=self.dec.entry_space)))

  @property
  def ext_space(self):
    spaces = {}
    spaces['consec'] = Space(np.int32)
    spaces['stepid'] = Space(np.uint8, 20)
    if self.config.replay_context:
      # entry_space is already the packed storage format (the latents
      # travel host<->device every step; see rssm.RSSM.entry_space).
      spaces.update(tree.flatdict(dict(
          enc=self.enc.entry_space,
          dyn=self.dyn.entry_space,
          dec=self.dec.entry_space)))
    return spaces

  # --- Carries ------------------------------------------------------------

  def init_policy(self, ctx, batch_size):
    zeros = lambda s: jnp.zeros((batch_size, *s.shape), s.dtype)
    return (
        self.enc.initial(batch_size),
        self.dyn.initial(batch_size),
        self.dec.initial(batch_size),
        {k: zeros(v) for k, v in self.act_space.items()})

  def init_train(self, ctx, batch_size):
    return self.init_policy(ctx, batch_size)

  def init_report(self, ctx, batch_size):
    return self.init_policy(ctx, batch_size)

  # --- Policy -------------------------------------------------------------

  def policy(self, ctx, carry, obs, mode='train'):
    enc_carry, dyn_carry, dec_carry, prevact = carry
    kw = dict(training=False, single=True)
    reset = obs['is_first']
    enc_carry, enc_entry, tokens = self.enc(ctx, enc_carry, obs, reset, **kw)
    dyn_carry, dyn_entry, feat = self.dyn.observe(
        ctx, dyn_carry, tokens, prevact, reset, **kw)
    dec_entry = {}
    if dec_carry:
      dec_carry, dec_entry, recons = self.dec(
          ctx, dec_carry, feat, reset, **kw)
    policy = self.pol(ctx, self._feat2tensor(feat), bdims=1)
    act = {k: v.sample(ctx.rng()) for k, v in policy.items()}
    out = {}
    # Finite-ness screening, logged per episode (log/ keys bypass replay).
    finite = tree.flatdict(jax.tree.map(
        lambda x: jnp.isfinite(nn.f32(x)).all(
            tuple(range(1, x.ndim))) if x.ndim > 1 else
        jnp.isfinite(nn.f32(x)),
        dict(tokens=tokens, act=act)))
    out.update({f'log/finite/{k}': v for k, v in finite.items()})
    carry = (enc_carry, dyn_carry, dec_carry, act)
    if self.config.replay_context:
      out.update(tree.flatdict(dict(
          enc=self.enc.entry_pack(enc_entry),
          dyn=self.dyn.entry_pack(dyn_entry),
          dec=self.dec.entry_pack(dec_entry))))
    return carry, act, out

  def _feat2tensor(self, feat):
    stoch = nn.cast(feat['stoch'])
    return jnp.concatenate([
        nn.cast(feat['deter']),
        stoch.reshape((*stoch.shape[:-2], -1))], -1)

  # --- Training -----------------------------------------------------------

  def train(self, ctx, carry, data):
    carry, obs, prevact, stepid = self._apply_replay_context(carry, data)
    mets, (carry, entries, outs, extra_mets) = self.opt(
        ctx, self.loss, carry, obs, prevact, True, has_aux=True)
    metrics = dict(mets)
    metrics.update(extra_mets)
    self.slowval.update(ctx)
    outs = {}
    if self.config.replay_context:
      updates = tree.flatdict(dict(
          stepid=stepid,
          enc=self.enc.entry_pack(entries[0]),
          dyn=self.dyn.entry_pack(entries[1]),
          dec=self.dec.entry_pack(entries[2])))
      B, T = obs['is_first'].shape
      assert all(x.shape[:2] == (B, T) for x in updates.values()), (
          (B, T), {k: v.shape for k, v in updates.items()})
      outs['replay'] = updates
    carry = (*carry, {k: data[k][:, -1] for k in self.act_space})
    return carry, outs, metrics

  def loss(self, ctx, carry, obs, prevact, training):
    enc_carry, dyn_carry, dec_carry = carry
    reset = obs['is_first']
    B, T = reset.shape
    losses = {}
    metrics = {}

    # World model.
    enc_carry, enc_entries, tokens = self.enc(
        ctx, enc_carry, obs, reset, training)
    dyn_carry, dyn_entries, los, repfeat, mets = self.dyn.loss(
        ctx, dyn_carry, tokens, prevact, reset, training)
    losses.update(los)
    metrics.update(mets)
    dec_carry, dec_entries, recons = self.dec(
        ctx, dec_carry, repfeat, reset, training)
    inp = sg(self._feat2tensor(repfeat), skip=self.acfg.reward_grad)
    losses['rew'] = self.rew(ctx, inp, 2).loss(obs['reward'])
    con = f32(~obs['is_terminal'])
    if self.acfg.contdisc:
      con *= 1 - 1 / self.acfg.horizon
    losses['con'] = self.con(
        ctx, self._feat2tensor(repfeat), 2).loss(con)
    for key, recon in recons.items():
      space, value = self.obs_space[key], obs[key]
      assert value.dtype == space.dtype, (key, space, value.dtype)
      target = f32(value) / 255 if isimage(space) else value
      losses[key] = recon.loss(sg(target))

    shapes = {k: v.shape for k, v in losses.items()}
    assert all(x == (B, T) for x in shapes.values()), ((B, T), shapes)

    # Imagination rollouts from the last K observed latents.
    K = min(self.acfg.imag_last or T, T)
    H = self.acfg.imag_length
    starts = self.dyn.starts(dyn_entries, dyn_carry, K)
    policyfn = lambda feat, key: {
        k: v.sample(key)
        for k, v in self.pol(ctx, self._feat2tensor(feat), 1).items()}
    _, imgfeat, imgprevact = self.dyn.imagine(
        ctx, starts, policyfn, H, training)
    first = jax.tree.map(
        lambda x: x[:, -K:].reshape((B * K, 1, *x.shape[2:])), repfeat)
    imgfeat = concat([sg(first, skip=self.acfg.ac_grads), sg(imgfeat)], 1)
    lastact = policyfn(jax.tree.map(lambda x: x[:, -1], imgfeat), ctx.rng())
    lastact = jax.tree.map(lambda x: x[:, None], lastact)
    imgact = concat([imgprevact, lastact], 1)
    assert all(x.shape[:2] == (B * K, H + 1)
               for x in jax.tree.leaves(imgfeat))
    inp = self._feat2tensor(imgfeat)
    los, imgloss_out, mets = imag_loss(
        ctx,
        imgact,
        self.rew(ctx, inp, 2).pred(),
        self.con(ctx, inp, 2).prob(1),
        self.pol(ctx, inp, 2),
        self.val(ctx, inp, 2),
        self.slowval(ctx, inp, 2),
        self.retnorm, self.valnorm, self.advnorm,
        update=training,
        contdisc=self.acfg.contdisc,
        horizon=self.acfg.horizon,
        **dict(self.acfg.imag_loss))
    losses.update({k: v.mean(1).reshape((B, K)) for k, v in los.items()})
    metrics.update(mets)

    # Replay value loss bootstrapped from imagination returns.
    if self.acfg.repval_loss:
      feat = sg(repfeat, skip=self.acfg.repval_grad)
      last, term, rew = [obs[k] for k in ('is_last', 'is_terminal', 'reward')]
      boot = imgloss_out['ret'][:, 0].reshape(B, K)
      feat, last, term, rew, boot = jax.tree.map(
          lambda x: x[:, -K:], (feat, last, term, rew, boot))
      inp = self._feat2tensor(feat)
      los, _, mets = repl_loss(
          ctx, last, term, rew, boot,
          self.val(ctx, inp, 2),
          self.slowval(ctx, inp, 2),
          self.valnorm,
          update=training,
          horizon=self.acfg.horizon,
          **dict(self.acfg.repl_loss))
      losses.update(los)
      metrics.update(prefix_keys(mets, 'reploss'))

    assert set(losses.keys()) == set(self.scales.keys()), (
        sorted(losses.keys()), sorted(self.scales.keys()))
    metrics.update({f'loss/{k}': v.mean() for k, v in losses.items()})
    loss = sum([nn.f32(v).mean() * self.scales[k] for k, v in losses.items()])

    carry = (enc_carry, dyn_carry, dec_carry)
    entries = (enc_entries, dyn_entries, dec_entries)
    outs = {'tokens': tokens, 'repfeat': repfeat, 'losses': losses}
    return loss, (carry, entries, outs, metrics)

  # --- Report -------------------------------------------------------------

  def report(self, ctx, carry, data):
    if not self.acfg.report:
      return carry, {}
    carry, obs, prevact, _ = self._apply_replay_context(carry, data)
    enc_carry, dyn_carry, dec_carry = carry
    B, T = obs['is_first'].shape
    RB = min(6, B)
    metrics = {}

    # Train metrics without updates.
    _, (new_carry, entries, outs, mets) = self.loss(
        ctx, carry, obs, prevact, training=False)
    metrics.update(mets)

    # Per-loss gradient norms (parity: reference dreamerv3/agent.py:263-271).
    if self.acfg.report_gradnorms:
      from ...nn.core import Ctx
      params = {k: v for k, v in ctx.store.items()
                if ctx.meta.get(k) == 'param'}
      for key in self.scales:
        def lossfn(params2, key=key):
          ictx = Ctx({**ctx.store, **params2}, create=False, key=ctx.key,
                     meta=ctx.meta)
          _, (_, _, louts, _) = self.loss(
              ictx, carry, obs, prevact, training=False)
          return nn.f32(louts['losses'][key]).mean()
        grads = jax.grad(lossfn)(params)
        norm = jnp.sqrt(sum(
            jnp.square(nn.f32(g)).sum() for g in grads.values()))
        metrics[f'gradnorm/{key}'] = norm

    # Open-loop predictions: observe the first half, imagine the second.
    firsthalf = lambda xs: jax.tree.map(lambda x: x[:RB, :T // 2], xs)
    secondhalf = lambda xs: jax.tree.map(lambda x: x[:RB, T // 2:], xs)
    dyn_carry = jax.tree.map(lambda x: x[:RB], dyn_carry)
    dec_carry = jax.tree.map(lambda x: x[:RB], dec_carry)
    dyn_carry, _, obsfeat = self.dyn.observe(
        ctx, dyn_carry, firsthalf(outs['tokens']), firsthalf(prevact),
        firsthalf(obs['is_first']), training=False)
    _, imgfeat, _ = self.dyn.imagine(
        ctx, dyn_carry, secondhalf(prevact), T - T // 2, training=False)
    dec_carry, _, obsrecons = self.dec(
        ctx, dec_carry, obsfeat, firsthalf(obs['is_first']), training=False)
    dec_carry, _, imgrecons = self.dec(
        ctx, dec_carry, imgfeat,
        jnp.zeros_like(secondhalf(obs['is_first'])), training=False)

    for key in self.dec.imgkeys:
      true = obs[key][:RB]
      pred = jnp.concatenate(
          [obsrecons[key].pred(), imgrecons[key].pred()], 1)
      pred = jnp.clip(pred * 255, 0, 255).astype(jnp.uint8)
      error = ((i32(pred) - i32(true) + 255) / 2).astype(np.uint8)
      video = jnp.concatenate([true, pred, error], 2)
      video = jnp.pad(video, [[0, 0], [0, 0], [2, 2], [2, 2], [0, 0]])
      mask = jnp.zeros(video.shape, bool).at[:, :, 2:-2, 2:-2, :].set(True)
      border = jnp.full((T, 3), jnp.array([0, 255, 0]), jnp.uint8)
      border = border.at[T // 2:].set(jnp.array([255, 0, 0], jnp.uint8))
      video = jnp.where(mask, video, border[None, :, None, None, :])
      B2, T2, H2, W2, C2 = video.shape
      grid = video.transpose((1, 2, 0, 3, 4)).reshape((T2, H2, B2 * W2, C2))
      metrics[f'openloop/{key}'] = grid

    carry = (*new_carry, {k: data[k][:, -1] for k in self.act_space})
    return carry, metrics

  # --- Replay context -----------------------------------------------------

  def _apply_replay_context(self, carry, data):
    enc_carry, dyn_carry, dec_carry, prevact = carry
    carry = (enc_carry, dyn_carry, dec_carry)
    stepid = data['stepid']
    obs = {k: data[k] for k in self.obs_space if k in data}
    prepend = lambda x, y: jnp.concatenate([x[:, None], y[:, :-1]], 1)
    prevact = {k: prepend(prevact[k], data[k]) for k in self.act_space}
    if not self.config.replay_context:
      return carry, obs, prevact, stepid

    K = self.config.replay_context
    nested = tree.nestdict(data)
    entries = [nested.get(k, {}) for k in ('enc', 'dyn', 'dec')]
    lhs = lambda xs: jax.tree.map(lambda x: x[:, :K], xs)
    rhs = lambda xs: jax.tree.map(lambda x: x[:, K:], xs)
    rep_carry = (
        self.enc.truncate(lhs(entries[0]), enc_carry),
        self.dyn.truncate(lhs(entries[1]), dyn_carry),
        self.dec.truncate(lhs(entries[2]), dec_carry))
    rep_obs = {k: rhs(data[k]) for k in self.obs_space if k in data}
    rep_prevact = {k: data[k][:, K - 1: -1] for k in self.act_space}
    rep_stepid = rhs(stepid)

    first_chunk = (data['consec'][:, 0] == 0)
    carry, obs, prevact, stepid = jax.tree.map(
        lambda normal, replay: nn.where(first_chunk, replay, normal),
        (carry, rhs(obs), rhs(prevact), rhs(stepid)),
        (rep_carry, rep_obs, rep_prevact, rep_stepid))
    return carry, obs, prevact, stepid

  def stream(self, st):
    return st


def _strip(cfg):
  cfg = dict(cfg)
  cfg.pop('output', None)
  return cfg


def imag_loss(
    ctx, act, rew, con, policy, value, slowvalue, retnorm, valnorm, advnorm,
    update, contdisc=True, slowtar=False, horizon=333, lam=0.95,
    actent=3e-4, slowreg=1.0):
  losses = {}
  metrics = {}

  voffset, vscale = valnorm.stats(ctx)
  val = value.pred() * vscale + voffset
  slowval = slowvalue.pred() * vscale + voffset
  tarval = slowval if slowtar else val
  disc = 1 if contdisc else 1 - 1 / horizon
  weight = jnp.cumprod(disc * con, 1) / disc
  last = jnp.zeros_like(con)
  term = 1 - con
  ret = lambda_return(last, term, rew, tarval, tarval, disc, lam)

  roffset, rscale = retnorm(ctx, ret, update)
  adv = (ret - tarval[:, :-1]) / rscale
  aoffset, ascale = advnorm(ctx, adv, update)
  adv_normed = (adv - aoffset) / ascale
  logpi = sum([v.logp(sg(act[k]))[:, :-1] for k, v in policy.items()])
  ents = {k: v.entropy()[:, :-1] for k, v in policy.items()}
  policy_loss = sg(weight[:, :-1]) * -(
      logpi * sg(adv_normed) + actent * sum(ents.values()))
  losses['policy'] = policy_loss

  voffset, vscale = valnorm(ctx, ret, update)
  tar_normed = (ret - voffset) / vscale
  tar_padded = jnp.concatenate([tar_normed, 0 * tar_normed[:, -1:]], 1)
  losses['value'] = sg(weight[:, :-1]) * (
      value.loss(sg(tar_padded)) +
      slowreg * value.loss(sg(slowvalue.pred())))[:, :-1]

  ret_normed = (ret - roffset) / rscale
  metrics['adv'] = adv.mean()
  metrics['adv_std'] = adv.std()
  metrics['adv_mag'] = jnp.abs(adv).mean()
  metrics['rew'] = rew.mean()
  metrics['con'] = con.mean()
  metrics['ret'] = ret_normed.mean()
  metrics['val'] = val.mean()
  metrics['tar'] = tar_normed.mean()
  metrics['weight'] = weight.mean()
  metrics['slowval'] = slowval.mean()
  metrics['ret_min'] = ret_normed.min()
  metrics['ret_max'] = ret_normed.max()
  metrics['ret_rate'] = (jnp.abs(ret_normed) >= 1.0).mean()
  for k in act:
    metrics[f'ent/{k}'] = ents[k].mean()
    if hasattr(policy[k], 'minent'):
      lo, hi = policy[k].minent, policy[k].maxent
      metrics[f'rand/{k}'] = (ents[k].mean() - lo) / max(hi - lo, 1e-8)

  outs = {'ret': ret}
  return losses, outs, metrics


def repl_loss(
    ctx, last, term, rew, boot, value, slowvalue, valnorm, update=True,
    slowreg=1.0, slowtar=False, horizon=333, lam=0.95):
  losses = {}
  voffset, vscale = valnorm.stats(ctx)
  val = value.pred() * vscale + voffset
  slowval = slowvalue.pred() * vscale + voffset
  tarval = slowval if slowtar else val
  disc = 1 - 1 / horizon
  weight = f32(~last)
  ret = lambda_return(last, term, rew, tarval, boot, disc, lam)

  voffset, vscale = valnorm(ctx, ret, update)
  ret_normed = (ret - voffset) / vscale
  ret_padded = jnp.concatenate([ret_normed, 0 * ret_normed[:, -1:]], 1)
  losses['repval'] = weight[:, :-1] * (
      value.loss(sg(ret_padded)) +
      slowreg * value.loss(sg(slowvalue.pred())))[:, :-1]
  return losses, {'ret': ret}, {}


def lambda_return(last, term, rew, val, boot, disc, lam):
  """TD(lambda) return computed with a reverse lax.scan over time."""
  shapes = {x.shape for x in (last, term, rew, val, boot)}
  assert len(shapes) == 1, shapes
  live = (1 - f32(term))[:, 1:] * disc
  cont = (1 - f32(last))[:, 1:] * lam
  interm = rew[:, 1:] + (1 - cont) * live * boot[:, 1:]

  def step(carry, x):
    interm_t, live_t, cont_t = x
    carry = interm_t + live_t * cont_t * carry
    return carry, carry

  _, rets_rev = jax.lax.scan(
      step, boot[:, -1],
      (interm.T[::-1], live.T[::-1], cont.T[::-1]))
  return rets_rev[::-1].T
