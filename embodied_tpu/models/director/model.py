"""Director: hierarchical agent with a goal VAE, manager, and worker.

Capability parity: /root/reference/director/hierarchy.py (rebuilt on the new
stack rather than ported from the old ninjax generation) — a goal
autoencoder compressing deter states into discrete skill codes, a manager
policy that picks a skill every `skill_duration` steps (trained on
abstracted imagination trajectories at the skill timescale), and a worker
policy conditioned on the decoded goal state (trained with extrinsic,
exploration, and cosine goal-similarity rewards). The world model is the
same RSSM as DreamerV3.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn
from ...nn import dists
from ...utils import Space, tree
from ..dreamerv3 import rssm
from ..dreamerv3.model import lambda_return
from . import expl

f32 = jnp.float32
sg = jax.lax.stop_gradient
isimage = lambda s: s.dtype == np.uint8 and len(s.shape) == 3


class ActorCritic(nn.Module):
  """Imagination actor-critic with one critic per reward stream.

  Parity: /root/reference/director/agent.py ImagActorCritic/VFunction —
  per-reward critics with EMA targets and return normalizers; the actor is
  trained on the weighted sum of normalized advantages.
  """

  def __init__(self, name, act_space, rewards, scales, config, inputs):
    super().__init__(name)
    self.act_space = act_space
    self.rewards = tuple(rewards)
    self.scales = dict(scales)
    self.inputs = tuple(inputs)
    self.horizon = config['horizon']
    self.lam = config['lam']
    self.actent = config['actent']
    self.slowreg = config['slowreg']
    d1, d2 = config['dist_disc'], config['dist_cont']
    outs = {k: d1 if v.discrete else d2 for k, v in act_space.items()}
    hkw = dict(layers=config['layers'], units=config['units'],
               act=config['act'], norm=config['norm'])
    self.actor = nn.MLPHead(
        act_space, outs, 'actor', unimix=config['unimix'],
        outscale=config['outscale'], minstd=config.get('minstd', 0.1),
        maxstd=config.get('maxstd', 1.0), **hkw)
    self.critics = {
        k: nn.MLPHead(Space(np.float32, ()), 'symexp_twohot', f'critic_{k}',
                      bins=config['bins'], outscale=0.0, **hkw)
        for k in self.rewards}
    self.slow = {
        k: nn.SlowModel(
            nn.MLPHead(Space(np.float32, ()), 'symexp_twohot', f'slow_{k}',
                       bins=config['bins'], outscale=0.0, **hkw),
            source=self.critics[k], rate=config['slowrate'])
        for k in self.rewards}
    self.retnorms = {
        k: nn.Normalize('perc', f'retnorm_{k}', rate=0.01, limit=1.0)
        for k in self.rewards}

  def feat(self, traj, bdims=2):
    feats = []
    for key in self.inputs:
      x = nn.cast(traj[key])
      feats.append(x.reshape((*x.shape[:bdims], -1)))
    return jnp.concatenate(feats, -1)

  def policy_dist(self, ctx, feat, bdims=1):
    return self.actor(self.sub(ctx), feat, bdims=bdims)

  def loss(self, ctx, traj, cont):
    """traj: dict with self.inputs keys, 'act_*', and 'rew_<name>',
    all shaped (B, H)."""
    p = self.sub(ctx)
    metrics = {}
    feat = self.feat(traj)
    disc = 1 - 1 / self.horizon
    weight = jnp.cumprod(disc * cont, 1) / disc
    last = jnp.zeros_like(cont)
    term = 1 - cont

    advs = []
    vlosses = []
    for key in self.rewards:
      rew = nn.f32(traj[f'rew_{key}'])
      value = self.critics[key](p, feat, 2)
      slowvalue = self.slow[key](p, feat, 2)
      val = value.pred()
      ret = lambda_return(last, term, rew, val, val, disc, self.lam)
      offset, scale = self.retnorms[key](ctx, ret, update=True)
      adv = (ret - val[:, :-1]) / scale
      advs.append(adv * self.scales.get(key, 1.0))
      tar = jnp.concatenate([ret, 0 * ret[:, -1:]], 1)
      vloss = sg(weight[:, :-1]) * (
          value.loss(sg(tar)) +
          self.slowreg * value.loss(sg(slowvalue.pred())))[:, :-1]
      vlosses.append(vloss)
      metrics[f'ret_{key}'] = ret.mean()
      metrics[f'val_{key}'] = val.mean()
    adv = sum(advs)

    policy = self.policy_dist(ctx, feat, bdims=2)
    acts = {k: traj[f'act_{k}'] for k in self.act_space}
    logpi = sum(v.logp(sg(acts[k]))[:, :-1] for k, v in policy.items())
    ents = {k: v.entropy()[:, :-1] for k, v in policy.items()}
    actor_loss = sg(weight[:, :-1]) * -(
        logpi * sg(adv) + self.actent * sum(ents.values()))
    metrics['actor_ent'] = sum(e.mean() for e in ents.values())
    losses = {'actor': actor_loss, 'critic': sum(vlosses)}
    return losses, metrics

  def update_slow(self, ctx):
    p = self.sub(ctx)
    for slow in self.slow.values():
      slow.update(p)


class Model:
  """Director model implementing the parallel.Agent contract."""

  def __init__(self, obs_space, act_space, config):
    self.obs_space = obs_space
    self.act_space = {k: v for k, v in act_space.items() if k != 'reset'}
    self.config = config
    acfg = config.agent
    self.acfg = acfg

    exclude = ('is_first', 'is_last', 'is_terminal', 'reward')
    spaces = {k: v for k, v in obs_space.items()
              if k not in exclude and not k.startswith('log/')}
    self.enc = rssm.Encoder(spaces, 'enc', **dict(acfg.enc))
    self.dyn = rssm.RSSM(self.act_space, 'dyn', **dict(acfg.rssm))
    self.dec = rssm.Decoder(spaces, 'dec', **dict(acfg.dec))

    scalar = Space(np.float32, ())
    binary = Space(bool, (), 0, 2)
    hkw = dict(layers=acfg.headlayers, units=acfg.units, act=acfg.act,
               norm=acfg.norm)
    self.rew = nn.MLPHead(scalar, 'symexp_twohot', 'rew', bins=acfg.bins,
                          outscale=0.0, **hkw)
    self.con = nn.MLPHead(binary, 'binary', 'con', **hkw)

    self.skill_shape = tuple(acfg.skill_shape)  # (codes, classes)
    S, C = self.skill_shape
    # Discrete skill space; onehot heads produce (S, C) straight-through
    # one-hot samples over it.
    self.skill_space = Space(np.int32, (S,), 0, C)
    self.deter = acfg.rssm.deter

    # Goal VAE over deter states.
    self.goal_enc = nn.MLPHead(
        self.skill_space, 'onehot', 'goal_enc', unimix=0.0, **hkw)
    self.goal_dec = nn.MLPHead(
        Space(np.float32, (self.deter,)), 'mse', 'goal_dec', **hkw)

    accfg = dict(
        horizon=acfg.horizon, lam=acfg.lam, slowreg=1.0, slowrate=0.02,
        layers=acfg.aclayers, units=acfg.units, act=acfg.act,
        norm=acfg.norm, bins=acfg.bins, unimix=0.01, outscale=0.01,
        dist_disc='categorical', dist_cont='bounded_normal')
    self.worker = ActorCritic(
        'worker', self.act_space, ('extr', 'expl', 'goal'),
        dict(acfg.worker_rews), dict(accfg, actent=acfg.worker_actent),
        inputs=('deter', 'stoch_flat', 'goal'))
    self.manager = ActorCritic(
        'manager', {'skill': self.skill_space},
        ('extr', 'expl', 'goal'), dict(acfg.manager_rews),
        dict(accfg, actent=acfg.manager_actent, dist_disc='onehot'),
        inputs=('deter', 'stoch_flat'))

    self.opt = nn.Optimizer(
        ['enc', 'dyn', 'dec', 'rew', 'con'], 'opt', **dict(acfg.opt))
    self.goal_opt = nn.Optimizer(
        ['goal_enc', 'goal_dec'], 'goal_opt', **dict(acfg.goal_opt))
    self.ac_opt = nn.Optimizer(
        ['worker/actor', 'worker/critic_extr', 'worker/critic_expl',
         'worker/critic_goal', 'manager/actor', 'manager/critic_extr',
         'manager/critic_expl', 'manager/critic_goal'],
        'ac_opt', **dict(acfg.ac_opt))

    self.skill_duration = acfg.skill_duration
    self.imag_length = acfg.imag_length
    scales = dict(acfg.loss_scales)
    rec = scales.pop('rec')
    scales.update({k: rec for k in spaces})
    self.scales = scales

    # Exploration stack (parity: /root/reference/director/expl.py and
    # behaviors.py): a disagreement ensemble feeding either the worker's
    # expl reward stream or a dedicated flat Explore behavior, plus a
    # Random behavior; all selected by config.
    self.expl_behavior = acfg.expl_behavior
    self.expl_rew = acfg.expl_rew
    assert self.expl_behavior in ('none', 'explore', 'random'), (
        self.expl_behavior)
    assert self.expl_rew in ('vae', 'disag'), self.expl_rew
    self.disag = None
    S, C = acfg.rssm.stoch, acfg.rssm.classes
    if self.expl_rew == 'disag' or self.expl_behavior == 'explore':
      self.disag = expl.Disag(
          'disag', self.act_space, target_dim=S * C, **dict(acfg.disag))
      self.disag_opt = nn.Optimizer(
          ['disag'], 'disag_opt', **dict(acfg.expl_opt))
    if self.expl_behavior == 'explore':
      self.expl_ac = ActorCritic(
          'expl', self.act_space, ('extr', 'disag'),
          dict(acfg.expl_rewards), dict(accfg, actent=acfg.worker_actent),
          inputs=('deter', 'stoch_flat'))
      self.expl_ac_opt = nn.Optimizer(
          ['expl/actor', 'expl/critic_extr', 'expl/critic_disag'],
          'expl_ac_opt', **dict(acfg.ac_opt))
    elif self.expl_behavior == 'random':
      self.random_behavior = expl.RandomBehavior(self.act_space)

  @property
  def policy_modes(self):
    return ('explore',) if self.expl_behavior != 'none' else ()

  @property
  def policy_keys(self):
    return r'^(enc|dyn|goal_dec|manager|worker|expl)/'

  @property
  def partition_rules(self):
    return [
        (r'dyn/.*(dyngru|dynhid\d*)/kernel$', (None, None, ('f', 't'))),
        (r'/(kernel|embed)$', (None, ('f', 't'))),
    ]

  @property
  def ext_space(self):
    spaces = {}
    spaces['consec'] = Space(np.int32)
    spaces['stepid'] = Space(np.uint8, 20)
    if self.config.replay_context:
      spaces.update(tree.flatdict(dict(dyn=self.dyn.entry_space)))
    return spaces

  # --- Carries ------------------------------------------------------------

  def _hier_initial(self, batch_size):
    S, C = self.skill_shape
    return {
        'step': jnp.zeros((batch_size,), jnp.int32),
        'skill': jnp.zeros((batch_size, S, C), f32),
        'goal': jnp.zeros((batch_size, self.deter), f32),
    }

  def init_policy(self, ctx, batch_size):
    zeros = lambda s: jnp.zeros((batch_size, *s.shape), s.dtype)
    return (
        self.dyn.initial(batch_size),
        self._hier_initial(batch_size),
        {k: zeros(v) for k, v in self.act_space.items()})

  def init_train(self, ctx, batch_size):
    return self.init_policy(ctx, batch_size)

  def init_report(self, ctx, batch_size):
    return self.init_policy(ctx, batch_size)

  # --- Hierarchical policy ------------------------------------------------

  def _stoch_flat(self, feat):
    stoch = nn.cast(feat['stoch'])
    return stoch.reshape((*stoch.shape[:-2], -1))

  def _hier_step(self, ctx, feat, hier, key, duration):
    """One hierarchy step on flat (B, ...) features. Returns action, new
    hierarchy carry, and the (skill, goal) actually in effect."""
    km, kw = jax.random.split(key)
    fresh = (hier['step'] % duration) == 0
    deter = nn.cast(feat['deter'])
    stoch_flat = self._stoch_flat(feat)
    mfeat = jnp.concatenate([deter, stoch_flat], -1)
    mdist = self.manager.policy_dist(ctx, mfeat, bdims=1)
    new_skill = sg(nn.f32(mdist['skill'].sample(km)))
    skill = nn.where(fresh, new_skill, hier['skill'])
    flat_skill = skill.reshape((skill.shape[0], -1))
    new_goal = sg(nn.f32(
        self.goal_dec(ctx, nn.cast(flat_skill), bdims=1).pred()))
    goal = nn.where(fresh, new_goal, hier['goal'])
    wfeat = jnp.concatenate([deter, stoch_flat, nn.cast(goal)], -1)
    wdist = self.worker.policy_dist(ctx, wfeat, bdims=1)
    act = {k: v.sample(kw) for k, v in wdist.items()}
    hier = {'step': hier['step'] + 1, 'skill': skill, 'goal': goal}
    return act, skill, goal, hier

  def policy(self, ctx, carry, obs, mode='train'):
    dyn_carry, hier, prevact = carry
    reset = obs['is_first']
    _, _, tokens = self.enc(ctx, {}, obs, reset, training=False,
                            single=True)
    dyn_carry, _, feat = self.dyn.observe(
        ctx, dyn_carry, tokens, prevact, reset, training=False, single=True)
    hier = nn.where(reset, jax.tree.map(jnp.zeros_like, hier), hier)
    if mode == 'explore' and self.expl_behavior == 'explore':
      wfeat = self._feat2tensor(feat)
      dist = self.expl_ac.policy_dist(ctx, wfeat, bdims=1)
      act = {k: v.sample(ctx.rng()) for k, v in dist.items()}
    elif mode == 'explore' and self.expl_behavior == 'random':
      act = self.random_behavior.policy(ctx, feat, ctx.rng())
      act = {k: v.astype(self.act_space[k].dtype) if self.act_space[k].discrete
             else v for k, v in act.items()}
    else:
      act, _, _, hier = self._hier_step(
          ctx, feat, hier, ctx.rng(), self.acfg.env_skill_duration)
    out = {}
    if self.config.replay_context:
      out.update(tree.flatdict(dict(dyn=self.dyn.entry_pack(
          {'deter': feat['deter'], 'stoch': feat['stoch']}))))
    carry = (dyn_carry, hier, act)
    return carry, act, out

  # --- Training -----------------------------------------------------------

  def train(self, ctx, carry, data):
    dyn_carry, hier, prevact = carry
    stepid = data['stepid']
    obs = {k: data[k] for k in self.obs_space if k in data}
    prepend = lambda x, y: jnp.concatenate([x[:, None], y[:, :-1]], 1)
    prevact = {k: prepend(prevact[k], data[k]) for k in self.act_space}
    K = self.config.replay_context
    if K:
      nested = tree.nestdict(data)
      entries = nested.get('dyn', {})
      lhs = lambda xs: jax.tree.map(lambda x: x[:, :K], xs)
      rhs = lambda xs: jax.tree.map(lambda x: x[:, K:], xs)
      rep_carry = self.dyn.truncate(lhs(entries), dyn_carry)
      rep_prevact = {k: data[k][:, K - 1: -1] for k in self.act_space}
      first_chunk = (data['consec'][:, 0] == 0)
      dyn_carry, obs, prevact, stepid = jax.tree.map(
          lambda normal, replay: nn.where(first_chunk, replay, normal),
          (dyn_carry, rhs(obs), rhs(prevact), rhs(stepid)),
          (rep_carry, rhs(obs), rep_prevact, rhs(stepid)))

    mets1, (dyn_carry, dyn_entries, repfeat) = self.opt(
        ctx, self.wm_loss, dyn_carry, obs, prevact, has_aux=True)
    mets2 = self.goal_opt(ctx, self.vae_loss, repfeat)
    mets3, extra = self.ac_opt(
        ctx, self.hier_loss, repfeat, obs, has_aux=True)
    self.worker.update_slow(ctx)
    self.manager.update_slow(ctx)
    metrics = {}
    for mets in (mets1, mets2, mets3, extra or {}):
      metrics.update(mets)
    if self.disag is not None:
      metrics.update(self.disag_opt(
          ctx, self.disag_loss, repfeat, prevact))
    if self.expl_behavior == 'explore':
      emets, eextra = self.expl_ac_opt(
          ctx, self.expl_loss, repfeat, has_aux=True)
      self.expl_ac.update_slow(ctx)
      metrics.update(emets)
      metrics.update({f'expl_{k}': v for k, v in (eextra or {}).items()})
    outs = {}
    if self.config.replay_context:
      updates = tree.flatdict(dict(dyn=self.dyn.entry_pack(dyn_entries)))
      updates['stepid'] = stepid
      outs['replay'] = updates
    carry = (dyn_carry, hier, {k: data[k][:, -1] for k in self.act_space})
    return carry, outs, metrics

  def wm_loss(self, ctx, dyn_carry, obs, prevact):
    losses = {}
    reset = obs['is_first']
    _, _, tokens = self.enc(ctx, {}, obs, reset, training=True)
    dyn_carry, entries, los, repfeat, mets = self.dyn.loss(
        ctx, dyn_carry, tokens, prevact, reset, training=True)
    losses.update(los)
    _, _, recons = self.dec(ctx, {}, repfeat, reset, training=True)
    inp = self._feat2tensor(repfeat)
    losses['rew'] = self.rew(ctx, inp, 2).loss(obs['reward'])
    con = f32(~obs['is_terminal']) * (1 - 1 / self.acfg.horizon)
    losses['con'] = self.con(ctx, inp, 2).loss(con)
    for key, recon in recons.items():
      space, value = self.obs_space[key], obs[key]
      target = f32(value) / 255 if isimage(space) else value
      losses[key] = recon.loss(sg(target))
    loss = sum(nn.f32(v).mean() * self.scales.get(k, 1.0)
               for k, v in losses.items())
    return nn.f32(loss), (dyn_carry, entries, repfeat)

  def _feat2tensor(self, feat):
    return jnp.concatenate(
        [nn.cast(feat['deter']), self._stoch_flat(feat)], -1)

  def vae_loss(self, ctx, repfeat):
    S, C = self.skill_shape
    goal = sg(nn.f32(repfeat['deter']))
    B, T = goal.shape[:2]
    flat = goal.reshape((B * T, -1))
    enc = self.goal_enc(ctx, nn.cast(flat), bdims=1)
    skill = enc.sample(ctx.rng())
    dec = self.goal_dec(
        ctx, nn.cast(skill.reshape((B * T, -1))), bdims=1)
    rec = nn.f32(dec.loss(flat))
    prior = dists.Agg(
        dists.OneHot(jnp.zeros((B * T, S, C))), 1, jnp.sum)
    kl = nn.f32(enc.kl(prior))
    kl = jnp.maximum(self.acfg.goal_kl_free, kl)
    return nn.f32((rec + self.acfg.goal_kl_scale * kl).mean())

  def _observed_traj(self, repfeat, prevact):
    """Trajectory view of a replay batch for the disagreement ensemble:
    act_* holds the action taken AT each step (prevact shifted left)."""
    acts_now = {
        f'act_{k}': jnp.concatenate([v[:, 1:], v[:, -1:]], 1)
        for k, v in prevact.items()}
    return {
        'deter': repfeat['deter'],
        'stoch_flat': self._stoch_flat(repfeat),
        **acts_now,
    }

  def disag_loss(self, ctx, repfeat, prevact):
    traj = self._observed_traj(repfeat, prevact)
    return nn.f32(self.disag.loss(ctx, traj))

  def expl_loss(self, ctx, repfeat):
    """Flat Explore behavior: imagination actor-critic on extrinsic +
    disagreement rewards (parity: reference behaviors.py Explore)."""
    B, T = repfeat['deter'].shape[:2]
    H = self.imag_length
    starts = {
        'deter': repfeat['deter'].reshape((B * T, -1)),
        'stoch': repfeat['stoch'].reshape(
            (B * T, *repfeat['stoch'].shape[2:])),
    }
    starts = jax.tree.map(lambda x: sg(nn.cast(x)), starts)

    def step(pctx, latent, key):
      wfeat = self._feat2tensor_single(latent)
      dist = self.expl_ac.policy_dist(ctx, wfeat, bdims=1)
      act = {k: sg(v.sample(key)) for k, v in dist.items()}
      latent2, (feat, _) = self.dyn.imagine_single(
          self.dyn.sub(ctx), latent, act, key)
      out = {
          'deter': feat['deter'], 'stoch': feat['stoch'],
          **{f'act_{k}': v for k, v in act.items()},
      }
      return latent2, out

    keys = jax.random.split(ctx.rng(), H).T
    _, traj = nn.scan(ctx, step, starts, keys, axis=1, length=H)
    traj = dict(traj)
    traj['stoch_flat'] = self._stoch_flat(traj)
    inp = self._feat2tensor(traj)
    traj['rew_extr'] = nn.f32(self.rew(ctx, inp, 2).pred())
    traj['rew_disag'] = self.disag.reward(ctx, traj)
    cont = nn.f32(self.con(ctx, inp, 2).prob(1))
    losses, metrics = self.expl_ac.loss(ctx, traj, cont)
    loss = sum(nn.f32(v).mean() for v in losses.values())
    metrics.update({f'loss/expl_{k}': v.mean() for k, v in losses.items()})
    return nn.f32(loss), metrics

  def _feat2tensor_single(self, feat):
    stoch = nn.cast(feat['stoch'])
    return jnp.concatenate([
        nn.cast(feat['deter']),
        stoch.reshape((stoch.shape[0], -1))], -1)

  def hier_loss(self, ctx, repfeat, obs):
    """Imagination rollout under the hierarchy; worker + manager losses."""
    B, T = obs['is_first'].shape
    H = self.imag_length
    K = self.skill_duration
    starts = {
        'deter': repfeat['deter'].reshape((B * T, -1)),
        'stoch': repfeat['stoch'].reshape(
            (B * T, *repfeat['stoch'].shape[2:])),
    }
    starts = jax.tree.map(lambda x: sg(nn.cast(x)), starts)
    nstart = B * T
    hier0 = self._hier_initial(nstart)

    def step(pctx, carry, key):
      latent, hier = carry
      act, skill, goal, hier = self._hier_step(ctx, latent, hier, key, K)
      latent2, (feat, _) = self.dyn.imagine_single(
          self.dyn.sub(ctx), latent, act, key)
      out = {
          'deter': feat['deter'], 'stoch': feat['stoch'],
          'act_skill': skill, 'goal': goal,
          **{f'act_{k}': v for k, v in act.items()},
      }
      return (latent2, hier), out

    keys = jax.random.split(ctx.rng(), H).T
    (_, _), traj = nn.scan(
        ctx, step, (starts, hier0), keys, axis=1, length=H)

    traj = dict(traj)
    traj['stoch_flat'] = self._stoch_flat(traj)
    traj['goal'] = nn.f32(traj['goal'])
    inp = self._feat2tensor(traj)
    rew_extr = nn.f32(self.rew(ctx, inp, 2).pred())
    cont = nn.f32(self.con(ctx, inp, 2).prob(1))

    feat_deter = nn.f32(traj['deter'])
    goal = sg(traj['goal'])
    gnorm = jnp.linalg.norm(goal, axis=-1, keepdims=True) + 1e-12
    fnorm = jnp.linalg.norm(feat_deter, axis=-1, keepdims=True) + 1e-12
    norm = jnp.maximum(gnorm, fnorm)
    rew_goal = ((goal / norm) * (feat_deter / norm)).sum(-1)

    if self.expl_rew == 'disag':
      # Plan2Explore: disagreement of the one-step latent ensemble.
      rew_expl = self.disag.reward(ctx, traj)
    else:
      # Goal-VAE reconstruction error (novelty signal).
      flat = feat_deter.reshape((nstart * H, -1))
      enc = self.goal_enc(ctx, nn.cast(sg(flat)), bdims=1)
      dec = self.goal_dec(
          ctx, nn.cast(enc.sample(ctx.rng()).reshape((nstart * H, -1))),
          bdims=1)
      rew_expl = nn.f32(jnp.square(dec.pred() - flat).mean(-1)).reshape(
          (nstart, H))

    traj['rew_extr'] = rew_extr
    traj['rew_expl'] = rew_expl
    traj['rew_goal'] = rew_goal

    losses = {}
    metrics = {}
    wl, wm = self.worker.loss(ctx, traj, cont)
    losses.update({f'worker_{k}': v for k, v in wl.items()})
    metrics.update({f'worker_{k}': v for k, v in wm.items()})

    # Manager operates at the skill timescale: downsample by K.
    HH = (H // K) * K

    def down(x, how):
      x = x[:, :HH]
      x = x.reshape((x.shape[0], HH // K, K, *x.shape[2:]))
      if how == 'first':
        return x[:, :, 0]
      if how == 'sum':
        return x.sum(2)
      if how == 'prod':
        return x.prod(2)
      raise NotImplementedError(how)

    mtraj = {
        'deter': down(traj['deter'], 'first'),
        'stoch_flat': down(traj['stoch_flat'], 'first'),
        'act_skill': down(traj['act_skill'], 'first'),
        'rew_extr': down(traj['rew_extr'], 'sum'),
        'rew_expl': down(traj['rew_expl'], 'sum'),
        'rew_goal': down(traj['rew_goal'], 'sum'),
    }
    mcont = down(cont, 'prod')
    ml, mm = self.manager.loss(ctx, mtraj, mcont)
    losses.update({f'manager_{k}': v for k, v in ml.items()})
    metrics.update({f'manager_{k}': v for k, v in mm.items()})

    loss = sum(nn.f32(v).mean() for v in losses.values())
    metrics.update({f'loss/{k}': v.mean() for k, v in losses.items()})
    return nn.f32(loss), metrics

  def report(self, ctx, carry, data):
    return carry, {}

  def stream(self, st):
    return st
