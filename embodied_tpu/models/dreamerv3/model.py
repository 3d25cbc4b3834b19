"""DreamerV3: world model + imagination actor-critic.

Capability parity: /root/reference/dreamerv3/agent.py — encoder/RSSM/decoder
with reward/continue/policy/value heads, EMA slow value, return/value/adv
normalizers, replay-context truncated-carry resume (stored latents), the
imagination loss on `imag_length` rollouts from observed starts, the replay
value loss bootstrapped from imagination returns, and open-loop video
reports. The world model is managed as a named module trio (enc/dyn/dec)
so carry/entry plumbing is written once; actor-critic objectives live in
`ac.py` (associative-scan lambda returns).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn
from ...utils import Space, tree
from . import ac
from . import rssm

f32 = jnp.float32
sg = lambda xs, skip=False: xs if skip else jax.lax.stop_gradient(xs)
concat = lambda xs, a: jax.tree.map(lambda *x: jnp.concatenate(x, a), *xs)
isimage = lambda s: s.dtype == np.uint8 and len(s.shape) == 3

# Director imports the return computation from here historically.
lambda_return = ac.lambda_return


def _strip(cfg):
  cfg = dict(cfg)
  cfg.pop('output', None)
  return cfg


class Model:
  """DreamerV3 model implementing the parallel.Agent contract."""

  WM = ('enc', 'dyn', 'dec')

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

  # --- World-model trio plumbing ------------------------------------------

  def _wm(self, name):
    return getattr(self, name)

  def _entry_flat(self, entry_trio):
    """Flatten per-module entries into replay-column format (packed)."""
    packed = {
        name: self._wm(name).entry_pack(entry)
        for name, entry in zip(self.WM, entry_trio)}
    return tree.flatdict(packed)

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
    return tuple(self._entry_space_flat())

  def _entry_space_flat(self):
    return tree.flatdict({
        name: self._wm(name).entry_space for name in self.WM})

  @property
  def ext_space(self):
    spaces = {'consec': Space(np.int32), 'stepid': Space(np.uint8, 20)}
    if self.config.replay_context:
      # entry_space is already the packed storage format (the latents
      # travel host<->device every step; see rssm.RSSM.entry_space).
      spaces.update(self._entry_space_flat())
    return spaces

  # --- Carries ------------------------------------------------------------

  def init_policy(self, ctx, batch_size):
    zeros = lambda s: jnp.zeros((batch_size, *s.shape), s.dtype)
    trio = tuple(self._wm(n).initial(batch_size) for n in self.WM)
    return (*trio, {k: zeros(v) for k, v in self.act_space.items()})

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
    screen = lambda x: (
        jnp.isfinite(nn.f32(x)).all(tuple(range(1, x.ndim)))
        if x.ndim > 1 else jnp.isfinite(nn.f32(x)))
    finite = tree.flatdict(
        jax.tree.map(screen, dict(tokens=tokens, act=act)))
    out.update({f'log/finite/{k}': v for k, v in finite.items()})
    if self.config.replay_context:
      out.update(self._entry_flat((enc_entry, dyn_entry, dec_entry)))
    return (enc_carry, dyn_carry, dec_carry, act), act, out

  def _feat2tensor(self, feat):
    stoch = nn.cast(feat['stoch'])
    return jnp.concatenate([
        nn.cast(feat['deter']),
        stoch.reshape((*stoch.shape[:-2], -1))], -1)

  def _fused_policy_spec(self, ctx):
    """Policy weights + dist meta for the whole-horizon fused imagination
    rollout (ops/imagine_seq.py), or None when the policy shape is not
    supported in-kernel: requires a single-key action space with a
    categorical (scalar discrete) or bounded_normal (vector continuous)
    head and the default rms/silu MLP trunk. Head weights are padded to
    the AP=128 lane tile (zero columns; -1e9 logit bias on the padding so
    padded classes never win the in-kernel argmax)."""
    if len(self.act_space) != 1:
      return None
    (key, space), = self.act_space.items()
    pcfg = dict(self.acfg.policy)
    if pcfg.get('norm', 'rms') != 'rms' or pcfg.get('act', 'silu') != 'silu':
      return None
    disc = space.discrete
    impl = self.acfg.policy_dist_disc if disc else self.acfg.policy_dist_cont
    if disc and (impl != 'categorical' or space.shape != ()):
      return None
    if not disc and (impl != 'bounded_normal' or len(space.shape) != 1):
      return None
    AP = 128
    ain = int(space.classes) if disc else int(space.shape[0])
    if not 0 < ain <= AP:
      return None
    units, npol = int(pcfg['units']), int(pcfg['layers'])
    if npol < 1:
      return None
    dyn = self.dyn
    indim = dyn.deter + dyn.stoch * dyn.classes
    pp = self.pol.sub(ctx)
    par = lambda scope, name, shape: scope.param(name, shape, 0.0)
    params = []
    mlp = pp('mlp')
    for i in range(npol):
      dim = indim if i == 0 else units
      params.append(nn.cast(par(mlp(f'linear{i}'), 'kernel', (dim, units))))
      params.append(nn.cast(par(mlp(f'linear{i}'), 'bias', (units,))))
      params.append(par(mlp(f'norm{i}'), 'scale', (units,)))
    head = pp('out')(f'head_{key}')
    pad = lambda w: jnp.zeros((units, AP), w.dtype).at[:, :ain].set(w)
    if disc:
      wh = nn.cast(par(head('logits'), 'kernel', (units, ain)))
      bh = par(head('logits'), 'bias', (ain,))
      params.append(pad(wh))
      params.append(jnp.full((AP,), -1e9, f32).at[:ain].set(f32(bh)))
    else:
      for name in ('mean', 'stddev'):
        w = nn.cast(par(head(name), 'kernel', (units, ain)))
        b = par(head(name), 'bias', (ain,))
        params.append(pad(w))
        params.append(jnp.zeros((AP,), f32).at[:ain].set(f32(b)))
    return dict(
        key=key, disc=disc, ain=ain, npol=npol,
        minstd=float(pcfg.get('minstd', 1.0)),
        maxstd=float(pcfg.get('maxstd', 1.0)),
        params=tuple(params))

  def _fused_imag_heads(self, ctx, inp):
    """The five imagination heads (rew, con, pol, val, slowval) all read
    the SAME rolled-out feature tensor — at batch 16x64 an ~84 MB
    activation — so five separate first-layer matmuls re-stream it five
    times. This computes all five trunks with the first layers fused
    into ONE matmul on the concatenated kernels (mathematically
    identical: weight columns are independent), then finishes each
    trunk's remaining layers and output head through the normal
    modules. Returns {'rew','con','pol','val','slowval'} dists, or None
    when the trunk shapes differ from the default rms/silu stack."""
    if ctx.create:
      return None  # Init must trace the plain path to create params.
    specs = [
        ('rew', self.rew, dict(self.acfg.rewhead)),
        ('con', self.con, dict(self.acfg.conhead)),
        ('pol', self.pol, dict(self.acfg.policy)),
        ('val', self.val, dict(self.acfg.value)),
        ('slowval', self.slowval.model, dict(self.acfg.value)),
    ]
    for _, _, cfg in specs:
      if cfg.get('norm', 'rms') != 'rms' or cfg.get('act', 'silu') != 'silu':
        return None
      if not cfg.get('bias', True) or int(cfg.get('layers', 3)) < 1:
        return None
    bshape = inp.shape[:2]
    indim = inp.shape[-1]
    x = nn.cast(inp).reshape((-1, indim))
    units = [int(cfg['units']) for _, _, cfg in specs]
    par = lambda scope, name, shape, init=0.0: scope.param(
        name, shape, init)
    scoped = [(mod.sub(ctx), mod, cfg) for _, mod, cfg in specs]
    wcat = jnp.concatenate([
        nn.cast(par(pp('mlp')('linear0'), 'kernel', (indim, u)))
        for (pp, _, _), u in zip(scoped, units)], -1)
    bcat = jnp.concatenate([
        nn.cast(par(pp('mlp')('linear0'), 'bias', (u,)))
        for (pp, _, _), u in zip(scoped, units)], -1)
    y = x @ wcat + bcat
    parts = jnp.split(y, list(np.cumsum(units)[:-1]), -1)
    outs = {}
    eps = 1e-4
    for (name, _, _), (pp, mod, cfg), u, h in zip(specs, scoped, units,
                                                  parts):
      nlayers = int(cfg.get('layers', 3))
      for i in range(nlayers):
        if i:  # Layer 0 came out of the shared matmul above.
          k = nn.cast(par(pp('mlp')(f'linear{i}'), 'kernel', (u, u)))
          b = nn.cast(par(pp('mlp')(f'linear{i}'), 'bias', (u,)))
          h = h @ k + b
        h32 = f32(h)
        scale = par(pp('mlp')(f'norm{i}'), 'scale', (u,), 1.0)
        mult = jax.lax.rsqrt(
            jnp.square(h32).mean(-1, keepdims=True) + eps) * scale
        h = jax.nn.silu(nn.cast(h32 * mult))  # act in compute dtype,
        # matching nn.MLP's act(norm(linear(x))) order exactly.
      outs[name] = mod.head(pp, h.reshape((*bshape, u)))
    return outs

  # --- Training -----------------------------------------------------------

  def train(self, ctx, carry, data):
    carry, obs, prevact, stepid = self._resume_window(carry, data)
    mets, (carry, entries, outs, extra_mets) = self.opt(
        ctx, self.loss, carry, obs, prevact, True, has_aux=True)
    metrics = dict(mets, **extra_mets)
    self.slowval.update(ctx)
    outs = {}
    if self.config.replay_context:
      updates = dict(self._entry_flat(entries), stepid=stepid)
      shape = obs['is_first'].shape[:2]
      mismatched = {
          k: v.shape for k, v in updates.items() if v.shape[:2] != shape}
      assert not mismatched, (shape, mismatched)
      outs['replay'] = updates
    lastact = {k: data[k][:, -1] for k in self.act_space}
    return (*carry, lastact), outs, metrics

  def loss(self, ctx, carry, obs, prevact, training):
    losses, metrics, carry, entries, tokens, repfeat = (
        self._world_model_objectives(ctx, carry, obs, prevact, training))
    B, T = obs['is_first'].shape
    badshape = {k: v.shape for k, v in losses.items() if v.shape != (B, T)}
    assert not badshape, ((B, T), badshape)

    imag_losses, img_out, imag_mets = self._imagination_objectives(
        ctx, obs, repfeat, entries[1], carry[1], training)
    losses.update(imag_losses)
    metrics.update(imag_mets)

    if self.acfg.repval_loss:
      rv_losses, rv_mets = self._replay_value_objective(
          ctx, obs, repfeat, img_out, training)
      losses.update(rv_losses)
      metrics.update({f'reploss/{k}': v for k, v in rv_mets.items()})

    assert set(losses.keys()) == set(self.scales.keys()), (
        sorted(losses.keys()), sorted(self.scales.keys()))
    metrics.update({f'loss/{k}': v.mean() for k, v in losses.items()})
    total = sum(nn.f32(v).mean() * self.scales[k] for k, v in losses.items())
    outs = {'tokens': tokens, 'repfeat': repfeat, 'losses': losses}
    return total, (carry, entries, outs, metrics)

  def _world_model_objectives(self, ctx, carry, obs, prevact, training):
    enc_carry, dyn_carry, dec_carry = carry
    reset = obs['is_first']
    losses, metrics = {}, {}
    enc_carry, enc_entries, tokens = self.enc(
        ctx, enc_carry, obs, reset, training)
    dyn_carry, dyn_entries, dyn_losses, repfeat, dyn_mets = self.dyn.loss(
        ctx, dyn_carry, tokens, prevact, reset, training)
    losses.update(dyn_losses)
    metrics.update(dyn_mets)
    dec_carry, dec_entries, recons = self.dec(
        ctx, dec_carry, repfeat, reset, training)
    inp = sg(self._feat2tensor(repfeat), skip=self.acfg.reward_grad)
    losses['rew'] = self.rew(ctx, inp, 2).loss(obs['reward'])
    con = f32(~obs['is_terminal'])
    if self.acfg.contdisc:
      con *= 1 - 1 / self.acfg.horizon
    losses['con'] = self.con(ctx, self._feat2tensor(repfeat), 2).loss(con)
    for key, recon in recons.items():
      space = self.obs_space[key]
      value = obs[key]
      assert value.dtype == space.dtype, (key, space, value.dtype)
      target = f32(value) / 255 if isimage(space) else value
      losses[key] = recon.loss(sg(target))
    carry = (enc_carry, dyn_carry, dec_carry)
    entries = (enc_entries, dyn_entries, dec_entries)
    return losses, metrics, carry, entries, tokens, repfeat

  def _imagination_objectives(
      self, ctx, obs, repfeat, dyn_entries, dyn_carry, training):
    B, T = obs['is_first'].shape
    K = min(self.acfg.imag_last or T, T)
    H = self.acfg.imag_length
    # Roll imagination forward from the last K posterior states.
    starts = self.dyn.starts(dyn_entries, dyn_carry, K)
    policyfn = lambda feat, key: {
        k: v.sample(key)
        for k, v in self.pol(ctx, self._feat2tensor(feat), 1).items()}
    # Offer the fused whole-horizon rollout the policy weights; the RSSM
    # takes the one-launch path when both sides are eligible.
    policyfn.fused_spec = lambda: self._fused_policy_spec(ctx)
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
    fused_heads = self._fused_imag_heads(ctx, inp)
    if fused_heads is None:
      fused_heads = dict(
          rew=self.rew(ctx, inp, 2), con=self.con(ctx, inp, 2),
          pol=self.pol(ctx, inp, 2), val=self.val(ctx, inp, 2),
          slowval=self.slowval(ctx, inp, 2))
    losses, img_out, metrics = ac.imag_loss(
        ctx,
        imgact,
        fused_heads['rew'].pred(),
        fused_heads['con'].prob(1),
        fused_heads['pol'],
        fused_heads['val'],
        fused_heads['slowval'],
        self.retnorm, self.valnorm, self.advnorm,
        update=training,
        contdisc=self.acfg.contdisc,
        horizon=self.acfg.horizon,
        **dict(self.acfg.imag_loss))
    losses = {k: v.mean(1).reshape((B, K)) for k, v in losses.items()}
    img_out['K'] = K
    return losses, img_out, metrics

  def _replay_value_objective(self, ctx, obs, repfeat, img_out, training):
    B, T = obs['is_first'].shape
    K = img_out['K']
    feat = sg(repfeat, skip=self.acfg.repval_grad)
    columns = (
        feat,
        obs['is_last'], obs['is_terminal'], obs['reward'],
        img_out['ret'][:, 0].reshape(B, K))
    feat, last, term, rew, boot = jax.tree.map(
        lambda x: x[:, -K:], columns)
    inp = self._feat2tensor(feat)
    losses, _, metrics = ac.repl_loss(
        ctx, last, term, rew, boot,
        self.val(ctx, inp, 2),
        self.slowval(ctx, inp, 2),
        self.valnorm,
        update=training,
        horizon=self.acfg.horizon,
        **dict(self.acfg.repl_loss))
    return losses, metrics

  # --- Report -------------------------------------------------------------

  def report(self, ctx, carry, data):
    if not self.acfg.report:
      return carry, {}
    carry, obs, prevact, _ = self._resume_window(carry, data)
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

    # Open-loop evaluation: posterior over the first half of the window,
    # prior imagination over the second half, both decoded to pixels.
    observed = lambda xs: jax.tree.map(lambda x: x[:RB, :T // 2], xs)
    imagined = lambda xs: jax.tree.map(lambda x: x[:RB, T // 2:], xs)
    dyn_carry, dec_carry = jax.tree.map(
        lambda x: x[:RB], (dyn_carry, dec_carry))
    dyn_carry, _, obsfeat = self.dyn.observe(
        ctx, dyn_carry, observed(outs['tokens']), observed(prevact),
        observed(obs['is_first']), training=False)
    _, imgfeat, _ = self.dyn.imagine(
        ctx, dyn_carry, imagined(prevact), T - T // 2, training=False)
    dec_carry, _, obsrecons = self.dec(
        ctx, dec_carry, obsfeat, observed(obs['is_first']), training=False)
    dec_carry, _, imgrecons = self.dec(
        ctx, dec_carry, imgfeat,
        jnp.zeros_like(imagined(obs['is_first'])), training=False)
    for key in self.dec.imgkeys:
      metrics[f'openloop/{key}'] = ac.openloop_video(
          obs[key][:RB], obsrecons[key].pred(), imgrecons[key].pred(),
          split=T // 2)

    lastact = {k: data[k][:, -1] for k in self.act_space}
    return (*new_carry, lastact), metrics

  # --- Replay context -----------------------------------------------------

  def _resume_window(self, carry, data):
    """Split data into (carry, obs, prevact, stepid), resuming the carry
    from stored latents on windows that start mid-episode."""
    *wm_carry, prevact = carry
    stepid = data['stepid']
    obs = {k: data[k] for k in self.obs_space if k in data}
    shift = lambda head, rest: jnp.concatenate(
        [head[:, None], rest[:, :-1]], 1)
    prevact = {k: shift(prevact[k], data[k]) for k in self.act_space}
    K = self.config.replay_context
    if not K:
      return tuple(wm_carry), obs, prevact, stepid

    # The first K steps of each sampled window carry stored latents; use
    # them to rebuild a mid-episode carry instead of burning in.
    nested = tree.nestdict(data)
    context = lambda xs: jax.tree.map(lambda x: x[:, :K], xs)
    window = lambda xs: jax.tree.map(lambda x: x[:, K:], xs)
    resumed_carry = tuple(
        self._wm(name).truncate(context(nested.get(name, {})), prior)
        for name, prior in zip(self.WM, wm_carry))
    resumed = (
        resumed_carry,
        {k: window(data[k]) for k in self.obs_space if k in data},
        {k: data[k][:, K - 1: -1] for k in self.act_space},
        window(stepid))
    flowing = (tuple(wm_carry), window(obs), window(prevact), window(stepid))
    # Windows that continue the previous sample keep the flowing carry;
    # fresh windows graft the stored-latent carry.
    fresh = (data['consec'][:, 0] == 0)
    return jax.tree.map(
        lambda flow, stored: nn.where(fresh, stored, flow),
        flowing, resumed)

  def stream(self, st):
    return st
