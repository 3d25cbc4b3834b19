"""PPO agent: Impala CNN encoder + optional GRU + clipped surrogate loss.

Capability parity: /root/reference/ppo/agent.py and ppo/nets.py — recurrent
policy with embedded previous action, stored behavior log-probs, GAE-style
lambda advantages computed with a reverse lax.scan (instead of an unrolled
Python loop), trust-region clip mask, value target clipping, and running
advantage/value normalizers.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn
from ...utils import Space

f32 = jnp.float32
sg = jax.lax.stop_gradient


class ImpalaEncoder(nn.Module):
  """Residual conv stacks for images plus an MLP for vector inputs."""

  def __init__(self, spaces, name='enc', depth=32, mults=(1, 2, 2),
               outmult=16, blocks=2, norm='none', act='relu', symlog=True,
               layers=5, units=512, winit='trunc_normal_in', **kw):
    super().__init__(name)
    assert all(len(s.shape) <= 3 for s in spaces.values()), spaces
    self.vecspaces = {k: v for k, v in spaces.items() if len(v.shape) <= 2}
    self.imgspaces = {k: v for k, v in spaces.items() if len(v.shape) == 3}
    self.depths = tuple(depth * m for m in mults)
    self.depth = depth
    self.outmult = outmult
    self.blocks = blocks
    self.normimpl = norm
    self.actfn = nn.act(act)
    kw = dict(winit=winit, **kw)
    self.kw = kw
    if self.vecspaces:
      squish = nn.symlog if symlog else None
      self.emb = nn.DictEmbed(self.vecspaces, units, 'emb', squish=squish,
                              **kw)
      self.mlp = nn.MLP(layers - 1, units, 'mlp', act=act, norm=norm, **kw)
    if self.imgspaces:
      self.convs = []
      for s, d in enumerate(self.depths):
        stage = {'in': nn.Conv2D(d, 3, f's{s}in', **kw), 'blocks': []}
        for b in range(self.blocks):
          stage['blocks'].append((
              nn.Norm(norm, f's{s}b{b}n1'),
              nn.Conv2D(d, 3, f's{s}b{b}c1', **kw),
              nn.Norm(norm, f's{s}b{b}n2'),
              nn.Conv2D(d, 3, f's{s}b{b}c2', **kw)))
        self.convs.append(stage)
      self.outn1 = nn.Norm(norm, 'outn1')
      self.outl = nn.Linear(outmult * depth, 'outl', **kw)
      self.outn2 = nn.Norm(norm, 'outn2')

  def __call__(self, ctx, data, bdims=2):
    p = self.sub(ctx)
    bshape = next(iter(data.values())).shape[:bdims]
    outs = []
    if self.vecspaces:
      x = {k: data[k] for k in self.vecspaces}
      x = self.emb(p, x, bshape)
      x = x.reshape((-1, x.shape[-1]))
      x = self.mlp(p, x)
      outs.append(x)
    if self.imgspaces:
      keys = sorted(self.imgspaces.keys())
      x = jnp.concatenate([data[k] for k in keys], -1)
      assert x.dtype == jnp.uint8, x.dtype
      x = nn.cast(x, force=True) / 255 - 0.5
      x = x.reshape((-1, *x.shape[-3:]))
      for stage in self.convs:
        x = stage['in'](p, x)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), 'SAME')
        for n1, c1, n2, c2 in stage['blocks']:
          skip = x
          x = c1(p, self.actfn(n1(p, x)))
          x = c2(p, self.actfn(n2(p, x)))
          x = x + skip
      x = x.reshape((x.shape[0], -1))
      x = self.actfn(self.outn1(p, x))
      x = self.outl(p, x)
      x = self.actfn(self.outn2(p, x))
      outs.append(x)
    x = jnp.concatenate(outs, -1)
    return x.reshape((*bshape, -1))


class Model:
  """PPO model implementing the parallel.Agent contract."""

  def __init__(self, obs_space, act_space, config):
    exclude = ('is_first', 'is_last', 'is_terminal', 'reward')
    self.obs_space = obs_space
    self.act_space = {k: v for k, v in act_space.items() if k != 'reset'}
    self.enc_space = {
        k: v for k, v in obs_space.items()
        if k not in exclude and not k.startswith('log/')}
    self.config = config
    acfg = config.agent
    self.acfg = acfg
    self.recurrent = acfg.recurrent
    self.rnnact = acfg.rnnact

    enc_kw = dict(acfg.enc[acfg.enc.typ])
    self.enc = {'impala': ImpalaEncoder}[acfg.enc.typ](
        self.enc_space, 'enc', **enc_kw)
    if self.recurrent:
      if self.rnnact:
        clip = lambda x: x / sg(jnp.maximum(1, jnp.abs(x)))
        self.actemb = nn.DictEmbed(
            self.act_space, acfg.actemb.units, 'actemb', squish=clip)
      self.rnn = nn.GRU(acfg.rnn.units, 'rnn', norm=acfg.rnn.norm,
                        winit=acfg.rnn.winit)
    d1, d2 = acfg.policy_dist_disc, acfg.policy_dist_cont
    outputs = {k: d1 if v.discrete else d2 for k, v in self.act_space.items()}
    self.policy_head = nn.MLPHead(
        self.act_space, outputs, 'policy', **dict(acfg.policy))
    vcfg = {k: v for k, v in dict(acfg.value).items() if k != 'output'}
    self.value_head = nn.MLPHead(
        Space(np.float32, ()), acfg.value.output, 'value', **vcfg)
    self.advnorm = nn.Normalize(**dict(acfg.advnorm), name='advnorm')
    self.valnorm = nn.Normalize(**dict(acfg.valnorm), name='valnorm')
    self.opt = nn.Optimizer(
        ['enc', 'actemb', 'rnn', 'policy', 'value'], 'opt',
        **self._opt_kwargs(dict(acfg.opt)))

  def _opt_kwargs(self, cfg):
    # PPO uses adam + global clip in the reference; our Optimizer exposes
    # agc instead of global-norm clip which serves the same stabilizing role.
    return dict(
        lr=cfg.get('lr', 3e-4), eps=cfg.get('eps', 1e-7),
        agc=cfg.get('agc', 0.3), wd=cfg.get('wd', 0.0),
        warmup=cfg.get('warmup', 1000))

  @property
  def policy_keys(self):
    return r'^(enc|actemb|rnn|policy)/'

  @property
  def partition_rules(self):
    return [
        (r'/(kernel|embed)$', (None, ('f', 't'))),
    ]

  @property
  def ext_space(self):
    spaces = {}
    spaces['consec'] = Space(np.int32)
    spaces['stepid'] = Space(np.uint8, 20)
    for key in self.act_space:
      spaces[f'logp/{key}'] = Space(np.float32)
    if self.recurrent and self.config.replay_context:
      spaces['memory'] = Space(np.float32, self.acfg.rnn.units)
    return spaces

  @property
  def latent_keys(self):
    """The GRU state is table-eligible (device-resident, see
    parallel/latents.py); the behavior logp columns are training data and
    must stay in replay."""
    if self.recurrent and self.config.replay_context:
      return ('memory',)
    return ()

  # --- Carries ------------------------------------------------------------

  def initial(self, batch_size):
    if self.recurrent:
      return self.rnn.initial(batch_size)
    return ()

  def init_policy(self, ctx, batch_size):
    prevact = {
        k: jnp.zeros((batch_size, *v.shape), v.dtype)
        for k, v in self.act_space.items()}
    return self.initial(batch_size), prevact

  def init_train(self, ctx, batch_size):
    return self.init_policy(ctx, batch_size)

  def init_report(self, ctx, batch_size):
    return ()

  # --- Forward ------------------------------------------------------------

  def _forward(self, ctx, carry, obs, prevact, value=True, single=False):
    bdims = 1 if single else 2
    bshape = obs['is_first'].shape[:bdims]
    embed = self.enc(ctx, obs, bdims=bdims)
    if self.recurrent:
      if self.rnnact:
        prevact = nn.mask(prevact, ~obs['is_first'])
        inputs = jnp.concatenate(
            [embed, self.actemb(ctx, prevact, bshape)], -1)
      else:
        inputs = embed
      carry, feat = self.rnn(ctx, carry, inputs, obs['is_first'],
                             single=single)
    else:
      feat = embed
    policy = self.policy_head(ctx, feat, bdims=bdims)
    val = self.value_head(ctx, feat, bdims=bdims) if value else None
    return carry, feat, policy, val

  def policy(self, ctx, carry, obs, mode='train'):
    memory, prevact = carry
    memory, feat, policy, _ = self._forward(
        ctx, memory, obs, prevact, value=False, single=True)
    act = {k: v.sample(ctx.rng()) for k, v in policy.items()}
    out = {f'logp/{k}': policy[k].logp(act[k]) for k in act}
    if self.recurrent:
      out['memory'] = nn.f32(memory)
    carry = (memory, act)
    return carry, act, out

  # --- Training -----------------------------------------------------------

  def train(self, ctx, carry, data):
    memory, prevact = carry
    if self.config.replay_context:
      K = self.config.replay_context
      prevact = {k: data[k][:, K - 1: -1] for k in self.act_space}
      if self.recurrent:
        # Resume from the state stored AFTER the last context step, i.e.
        # index K-1 of the UNSLICED window (the first trained step is K).
        memory = nn.cast(data['memory'][:, K - 1])
      data = {k: v[:, K:] for k, v in data.items() if k != 'memory'}
    else:
      prepend = lambda x, y: jnp.concatenate([x[:, None], y[:, :-1]], 1)
      prevact = {k: prepend(prevact[k], data[k]) for k in self.act_space}
    mets, (memory, extra) = self.opt(
        ctx, self.loss, memory, data, prevact, has_aux=True)
    mets.update(extra)
    prevact = {k: data[k][:, -1] for k in self.act_space}
    carry = (memory, prevact)
    return carry, {}, mets

  def loss(self, ctx, memory, data, prevact):
    memory, feat, policy, value = self._forward(
        ctx, memory, data, prevact)
    losses, metrics = ppo_loss(
        ctx, data, policy, value, self.advnorm, self.valnorm,
        self.act_space, update=True, **dict(self.acfg.ppo_loss))
    for k, v in losses.items():
      metrics[f'{k}_loss'] = v.mean()
    scales = self.acfg.loss_scales
    loss = sum(v.mean() * scales[k] for k, v in losses.items())
    return nn.f32(loss), (memory, metrics)

  def report(self, ctx, carry, data):
    return carry, {}

  def stream(self, st):
    return st


def gae_advantages(rew, live, cont, val):
  """Reverse-scan GAE: adv_t = delta_t + live_t * cont_t * adv_{t+1}."""
  delta = rew[:, 1:] + live * val[:, 1:] - val[:, :-1]
  decay = live * cont

  def step(carry, x):
    d, g = x
    carry = d + g * carry
    return carry, carry

  _, adv_rev = jax.lax.scan(
      step, jnp.zeros_like(delta[:, 0]),
      (delta.T[::-1], decay.T[::-1]))
  return adv_rev[::-1].T


def ppo_loss(
    ctx, data, policy, value, advnorm, valnorm, act_space, update,
    actent=1e-2, hor=200, lam=0.8, trclip=0.2, tarclip=10.0):
  metrics = {}
  losses = {}

  act = {k: data[k] for k in act_space}
  logpi = sum(policy[k].logp(act[k]) for k in act_space)
  logdata = sum(data['logp/' + k] for k in act_space)

  rew, last, term = data['reward'], data['is_last'], data['is_terminal']
  mask = f32(~last & ~term)
  ratio = jnp.exp(logpi - sg(logdata))
  voffset, vscale = valnorm.stats(ctx)
  val = value.pred() * vscale + voffset

  live = f32(~term)[:, 1:] * (1 - 1 / hor)
  cont = f32(~last & ~term)[:, 1:] * lam
  adv = gae_advantages(rew, live, cont, val)
  tar = adv + val[:, :-1]

  voffset, vscale = valnorm(ctx, tar, update)
  tarnormed = (tar - voffset) / vscale
  tarnormed = jnp.clip(tarnormed, -tarclip, tarclip) if tarclip else tarnormed
  tarnormed_padded = jnp.concatenate([tarnormed, 0 * tarnormed[:, :1]], 1)
  losses['value'] = value.loss(sg(tarnormed_padded)) * mask

  aoffset, ascale = advnorm(ctx, adv, update)
  advnormed = (adv - aoffset) / ascale
  reinforce = ratio[:, :-1] * sg(advnormed)
  ents = {k: policy[k].entropy() for k in act_space}
  maxent = actent * sum(ents.values())[:, :-1]

  upper = (ratio[:, :-1] < 1 + trclip) | (advnormed < 0)
  lower = (ratio[:, :-1] > 1 - trclip) | (advnormed > 0)
  tr = f32(upper & lower)
  losses['policy'] = -(reinforce + maxent) * mask[:, :-1] * tr

  for k in act_space:
    metrics[f'ent/{k}'] = ents[k].mean()
    if hasattr(policy[k], 'minent'):
      lo, hi = policy[k].minent, policy[k].maxent
      metrics[f'rand/{k}'] = (ents[k].mean() - lo) / max(hi - lo, 1e-8)

  metrics['rew'] = rew.mean()
  metrics['val'] = val.mean()
  metrics['tar'] = tar.mean()
  metrics['adv'] = adv.mean()
  metrics['advmag'] = jnp.abs(adv).mean()
  metrics['ratio'] = ratio.mean()
  metrics['clipfrac'] = (1 - tr).mean()
  metrics['td'] = jnp.abs(value.pred()[:, :-1] - tarnormed).mean()
  return losses, metrics

