"""Recurrent State-Space Model with a block-diagonal GRU core.

Capability parity: /root/reference/dreamerv3/rssm.py — categorical
stochastic state (stoch x classes) with unimix, block-diagonal recurrent
core (blocks groups), observe/imagine scans with per-step sampling, KL
losses with free nats, latent entries stored to replay for truncated-carry
resume, plus the simple CNN Encoder / Decoder with block-space projection.

TPU notes: the core's block-diagonal contractions run as single batched
matmuls (g, d, u) that tile directly onto the MXU; scans carry O(1) state
so sequence length costs no memory beyond the outputs. Per-step sampling
keys are threaded through the scan explicitly.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from ... import nn
from ...nn import dists
from ...utils import Space

f32 = jnp.float32
sg = jax.lax.stop_gradient


def flat2group(x, g):
  return x.reshape((*x.shape[:-1], g, x.shape[-1] // g))


def group2flat(x):
  return x.reshape((*x.shape[:-2], x.shape[-2] * x.shape[-1]))


def space_to_depth(x, s):
  """(B, H, W, C) -> (B, H/s, W/s, s*s*C) by folding s x s pixel patches
  into channels. On TPU this turns the early low-channel convolutions
  (C=3 inputs, tiny output depths) into matmuls with contraction and
  output dims big enough to tile the 128x128 MXU."""
  B, H, W, C = x.shape
  x = x.reshape(B, H // s, s, W // s, s, C)
  x = x.transpose(0, 1, 3, 2, 4, 5)
  return x.reshape(B, H // s, W // s, s * s * C)


def depth_to_space(x, s):
  """Inverse of space_to_depth."""
  B, H, W, C = x.shape
  x = x.reshape(B, H, W, s, s, C // (s * s))
  x = x.transpose(0, 1, 3, 2, 4, 5)
  return x.reshape(B, H * s, W * s, C // (s * s))


class RSSM(nn.Module):

  def __init__(
      self, act_space, name='dyn', deter=4096, hidden=2048, stoch=32,
      classes=32, norm='rms', act='gelu', unroll=False, unimix=0.01,
      outscale=1.0, imglayers=2, obslayers=1, dynlayers=1, absolute=False,
      blocks=8, free_nats=1.0, latents='i8', kernel='auto', **kw):
    super().__init__(name)
    assert deter % blocks == 0, (deter, blocks)
    assert latents in ('i8', 'f16', 'f32'), latents
    assert classes <= 256, (classes, 'uint8 stoch indices')
    assert kernel in ('auto', 'imag', 'fused', 'off'), kernel
    self.latents = latents
    self.kernel = kernel
    self.act_space = act_space
    self.deter = deter
    self.hidden = hidden
    self.stoch = stoch
    self.classes = classes
    self.unimix = unimix
    self.unroll = int(unroll)
    self.absolute = absolute
    self.blocks = blocks
    self.free_nats = free_nats
    self.norm = norm
    self.act = act
    self.dynlayers = dynlayers
    self.actfn = nn.act(act)
    self.kw = kw

    self.actconcat = nn.DictConcat(act_space, 1)
    g = blocks
    self.obs_layers = [
        (nn.Linear(hidden, f'obs{i}', **kw), nn.Norm(norm, f'obs{i}norm'))
        for i in range(obslayers)]
    self.obs_logit = nn.Linear(stoch * classes, 'obslogit',
                               outscale=outscale, **kw)
    self.img_layers = [
        (nn.Linear(hidden, f'prior{i}', **kw), nn.Norm(norm, f'prior{i}norm'))
        for i in range(imglayers)]
    self.img_logit = nn.Linear(stoch * classes, 'priorlogit',
                               outscale=outscale, **kw)
    self.dynin = [
        (nn.Linear(hidden, f'dynin{i}', **kw),
         nn.Norm(norm, f'dynin{i}norm'))
        for i in range(3)]
    # The first hidden layer sees [deter_block, shared_features] per block.
    # Instead of materializing g copies of the shared features (a large
    # broadcast inside the scan body), it runs as a block-diagonal matmul
    # on deter plus ONE dense matmul on the shared features, summed —
    # the identical function with MXU-friendly shapes.
    self.dynhid_blk = nn.BlockLinear(deter, g, 'dynhid0blk', **kw)
    self.dynhid_in = nn.Linear(deter, 'dynhid0in', bias=False, **kw)
    self.dynhid_norm = nn.Norm(norm, 'dynhid0norm')
    self.dynhid = [
        (nn.BlockLinear(deter, g, f'dynhid{i}', **kw),
         nn.Norm(norm, f'dynhid{i}norm'))
        for i in range(1, dynlayers)]
    self.dyngru = nn.BlockLinear(3 * deter, g, 'dyngru', **kw)

  @property
  def entry_space(self):
    """Storage format of the replay latents. These cross the host<->device
    boundary every step and live in replay RAM, so they are packed: the
    categorical stoch sample as its uint8 class indices (lossless) and
    deter quantized to int8 with a fixed 1/127 scale — the GRU's convex
    update keeps |deter| < 1 by construction, and the model refreshes
    stored latents every time it trains on them."""
    dtype = dict(i8=np.int8, f16=np.float16, f32=np.float32)[self.latents]
    return dict(
        deter=Space(dtype, self.deter),
        stoch=Space(np.uint8, (self.stoch,)))

  def entry_pack(self, entries):
    """Device-side packing of fresh float entries into the storage format."""
    deter, stoch = entries['deter'], entries['stoch']
    if self.latents == 'i8':
      deter = jnp.clip(
          jnp.round(deter.astype(f32) * 127), -127, 127).astype(jnp.int8)
    else:
      deter = deter.astype(self.entry_space['deter'].dtype)
    stoch = jnp.argmax(stoch, -1).astype(jnp.uint8)
    return dict(deter=deter, stoch=stoch)

  def entry_unpack(self, entries):
    deter, stoch = entries['deter'], entries['stoch']
    if self.latents == 'i8':
      deter = deter.astype(f32) / 127
    else:
      deter = deter.astype(f32)
    stoch = jax.nn.one_hot(stoch, self.classes, dtype=f32)
    return nn.cast(dict(deter=deter, stoch=stoch))

  def initial(self, bsize):
    return nn.cast(dict(
        deter=jnp.zeros([bsize, self.deter], f32),
        stoch=jnp.zeros([bsize, self.stoch, self.classes], f32)))

  def truncate(self, entries, carry=None):
    # Resume a carry from the last stored (packed) latent of a context
    # window.
    assert entries['deter'].ndim == 3, entries['deter'].shape
    return jax.tree.map(lambda x: x[:, -1], self.entry_unpack(entries))

  def starts(self, entries, carry, nlast):
    B = len(jax.tree.leaves(carry)[0])
    return jax.tree.map(
        lambda x: x[:, -nlast:].reshape((B * nlast, *x.shape[2:])), entries)

  # --- Observation path ---------------------------------------------------

  def observe(self, ctx, carry, tokens, action, reset, training,
              single=False):
    p = self.sub(ctx)
    carry, tokens, action = nn.cast((carry, tokens, action))
    # The fused Pallas core has a fused analytic backward kernel
    # (ops/blockgru.py fused_core_bwd), so it runs on the BPTT training
    # path as well as acting/report/imagination.
    body = lambda pp, c, i: self._observe(pp, c, i, kernel=True)
    if single:
      actfeat = self._action_feat(p, nn.mask(action, ~reset), ~reset)
      carry, (entry, feat) = body(
          p, carry, (tokens, actfeat, reset, ctx.rng()))
      return carry, entry, feat
    T = reset.shape[1]
    # The action embedding only depends on known inputs, so it is computed
    # for the whole sequence as one batched matmul OUTSIDE the scan (the
    # recurrence only carries deter/stoch); this keeps the scan body small
    # and feeds the MXU a (B*T, .) matmul instead of T tiny ones.
    actfeat = self._action_feat(p, nn.mask(action, ~reset), ~reset)
    if self._obs_seq_eligible(p):
      # Whole-window fused path: ONE pallas_call spans the BPTT loop with
      # the recurrent state in VMEM and in-kernel categorical sampling
      # (ops/observe_seq.py). Inputs go time-major for per-step grid
      # blocks; Gumbel noise is drawn once for the window.
      from ...ops import observe_seq as seqlib
      B = reset.shape[0]
      S, C = self.stoch, self.classes
      toks = nn.cast(tokens.reshape((B, T, -1))).transpose(1, 0, 2)
      acts = nn.cast(actfeat).transpose(1, 0, 2)
      keep = (~reset).astype(jnp.float32).T
      gum = jax.random.gumbel(ctx.rng(), (T, B, S * C), jnp.float32)
      deter0 = nn.cast(carry['deter'])
      stoch0 = nn.cast(carry['stoch'].reshape((B, -1)))
      dseq, sseq, lseq = seqlib.observe_seq(
          deter0, stoch0, acts, toks, keep, gum,
          self._obs_params(p, toks.shape[-1]),
          self.blocks, S, C, self.unimix)
      deter = dseq.transpose(1, 0, 2)
      stoch = sseq.transpose(1, 0, 2).reshape((B, T, S, C))
      logit = lseq.transpose(1, 0, 2).reshape((B, T, S, C)).astype(
          jnp.float32)
      carry = dict(deter=deter[:, -1], stoch=stoch[:, -1])
      entries = dict(deter=deter, stoch=stoch)
      feat = dict(deter=deter, stoch=stoch, logit=logit)
      return carry, entries, feat
    # Per-step sampling keys ride along the scan: (T, 2) transposed so the
    # time axis lines up with axis=1 of the data.
    keys = jax.random.split(ctx.rng(), T).T
    carry, (entries, feat) = nn.scan(
        p, body, carry, (tokens, actfeat, reset, keys), axis=1,
        unroll=self.unroll or 1)
    return carry, entries, feat

  def _action_feat(self, p, action, available_mask=None):
    """Embed the action dict: concat -> clip -> linear+norm+act."""
    action = self.actconcat(p, action)
    if available_mask is not None:
      action = nn.mask(action, available_mask)
    action = action / sg(jnp.maximum(1, jnp.abs(action)))
    linear, norm = self.dynin[2]
    return self.actfn(norm(p, linear(p, action)))

  def _observe(self, p, carry, inputs, kernel=False):
    tokens, actfeat, reset, key = inputs
    deter, stoch, actfeat = nn.mask(
        (carry['deter'], carry['stoch'], actfeat), ~reset)
    if kernel and self._obs_kernel_eligible(p):
      # Single launch for the whole step's matmul work (core + posterior
      # head); only sampling stays outside (ops/observe.py).
      from ...ops import observe as observelib
      toks = nn.cast(tokens.reshape((deter.shape[0], -1)))
      stoch_flat = nn.cast(stoch.reshape((stoch.shape[0], -1)))
      deter, logitflat = observelib.obs_step(
          nn.cast(deter), stoch_flat, nn.cast(actfeat), toks,
          self._obs_params(p, toks.shape[-1]), True)
      logit = logitflat.reshape(
          (*logitflat.shape[:-1], self.stoch, self.classes))
    else:
      deter = self._core(p, deter, stoch, actfeat, kernel=kernel)
      tokens = tokens.reshape((*deter.shape[:-1], -1))
      x = tokens if self.absolute else jnp.concatenate([deter, tokens], -1)
      for linear, norm in self.obs_layers:
        x = self.actfn(norm(p, linear(p, x)))
      logit = self._logit(self.obs_logit, p, x)
    stoch = nn.cast(self._dist(logit).sample(key))
    carry = dict(deter=deter, stoch=stoch)
    feat = dict(deter=deter, stoch=stoch, logit=logit)
    entry = dict(deter=deter, stoch=stoch)
    return carry, (entry, feat)

  # --- Imagination path ---------------------------------------------------

  def imagine_single(self, p, carry, policy_or_action, key):
    if callable(policy_or_action):
      # Policies take (carry, key) and sample their own actions.
      key, pkey = jax.random.split(key)
      action = policy_or_action(sg(carry), pkey)
    else:
      action = policy_or_action
    actfeat = self._action_feat(p, nn.cast(action))
    if self._imag_kernel_eligible(p):
      # One launch for core + prior head + stoch sampling (the policy
      # MLP above stays XLA — it depends on the previous sample).
      from ...ops import imagine as imaglib
      B = actfeat.shape[0]
      S, C = self.stoch, self.classes
      stoch_flat = nn.cast(carry['stoch'].reshape((B, -1)))
      gum = jax.random.gumbel(key, (B, S * C), jnp.float32)
      deter, hard, logitflat = imaglib.imag_step_vjp(
          nn.cast(carry['deter']), stoch_flat, nn.cast(actfeat), gum,
          self._imag_params(p), self.blocks, S, C, self.unimix)
      stoch = hard.reshape((B, S, C))
      logit = logitflat.reshape((B, S, C))
    else:
      deter = self._core(p, carry['deter'], carry['stoch'], actfeat,
                         kernel=True)
      logit = self._prior(p, deter)
      stoch = nn.cast(self._dist(logit).sample(key))
    carry = nn.cast(dict(deter=deter, stoch=stoch))
    feat = nn.cast(dict(deter=deter, stoch=stoch, logit=logit))
    return carry, (feat, action)

  def _imagine_fused(self, ctx, p, carry, spec, length):
    """Whole-horizon fused rollout: ONE pallas_call with the policy MLP,
    action sampling, action embed, core, prior, and stoch sampling all
    in-kernel (ops/imagine_seq.py). `spec` comes from the model's
    _fused_policy_spec and carries the policy weights + dist meta."""
    from ...ops import imagine_seq as imslib
    B = carry['deter'].shape[0]
    S, C = self.stoch, self.classes
    L = S * C
    AP = 128
    deter0 = nn.cast(carry['deter'])
    stoch0 = nn.cast(carry['stoch'].reshape((B, -1)))
    k1, k2 = jax.random.split(ctx.rng())
    gum = jax.random.gumbel(k1, (length, B, L), f32)
    sampler = jax.random.gumbel if spec['disc'] else jax.random.normal
    noise = sampler(k2, (length, B, AP), f32)
    params = (self._imag_params(p) +
              self._embed_params(p, spec['ain'], AP) + spec['params'])
    dseq, sseq, lseq, aseq = imslib.imagine_seq(
        deter0, stoch0, gum, noise, params, self.blocks, S, C,
        spec['npol'], spec['disc'], spec['minstd'], spec['maxstd'],
        self.unimix)
    deter = dseq.transpose(1, 0, 2)
    stoch = sseq.transpose(1, 0, 2).reshape((B, length, S, C))
    logit = lseq.transpose(1, 0, 2).reshape((B, length, S, C)).astype(f32)
    acts = aseq.transpose(1, 0, 2)[..., :spec['ain']]
    if spec['disc']:
      action = jnp.argmax(acts, -1).astype(jnp.int32)
    else:
      action = acts
    carry = nn.cast(dict(deter=deter[:, -1], stoch=stoch[:, -1]))
    feat = dict(deter=deter, stoch=stoch, logit=logit)
    return carry, feat, {spec['key']: action}

  def imagine(self, ctx, carry, policy, length, training, single=False):
    p = self.sub(ctx)
    if single:
      return self.imagine_single(p, nn.cast(carry), policy, ctx.rng())
    if callable(policy) and self._imag_seq_eligible(p):
      spec = getattr(policy, 'fused_spec', lambda: None)()
      if spec is not None:
        return self._imagine_fused(ctx, p, nn.cast(carry), spec, length)
    keys = jax.random.split(ctx.rng(), length).T
    if callable(policy):
      def body(pp, c, key):
        return self.imagine_single(pp, c, policy, key)
      carry, (feat, action) = nn.scan(
          p, body, nn.cast(carry), keys, axis=1, length=length,
          unroll=self.unroll or 1)
    else:
      def body(pp, c, inp):
        act, key = inp
        return self.imagine_single(pp, c, act, key)
      carry, (feat, action) = nn.scan(
          p, body, nn.cast(carry), (nn.cast(policy), keys), axis=1,
          length=length, unroll=self.unroll or 1)
    return carry, feat, action

  # --- Loss ---------------------------------------------------------------

  def loss(self, ctx, carry, tokens, acts, reset, training):
    metrics = {}
    carry, entries, feat = self.observe(
        ctx, carry, tokens, acts, reset, training)
    p = self.sub(ctx)
    prior = self._prior(p, feat['deter'])
    post = feat['logit']
    dyn = self._dist(sg(post)).kl(self._dist(prior))
    rep = self._dist(post).kl(self._dist(sg(prior)))
    if self.free_nats:
      dyn = jnp.maximum(dyn, self.free_nats)
      rep = jnp.maximum(rep, self.free_nats)
    losses = {'dyn': dyn, 'rep': rep}
    metrics['dyn_ent'] = self._dist(prior).entropy().mean()
    metrics['rep_ent'] = self._dist(post).entropy().mean()
    return carry, entries, losses, feat, metrics

  # --- Internals ----------------------------------------------------------

  def _kernel_eligible(self, p):
    """Whether the fused Pallas core step applies: TPU, default layer
    stack, rms/silu math, and weights that fit the VMEM budget."""
    if self.kernel not in ('auto', 'imag', 'fused') or p.create:
      return False
    if self.dynlayers != 1 or self.norm != 'rms' or self.act != 'silu':
      return False
    from ...ops import blockgru
    if not blockgru.on_tpu():
      return False
    D, H, g = self.deter, self.hidden, self.blocks
    S = self.stoch * self.classes
    if (D // g) % 128:
      # The kernel slices the deter lane dimension in D/g-wide blocks;
      # Mosaic requires lane offsets aligned to the 128-lane tile, so
      # narrower blocks (small presets like size1m: 512/8=64) take the
      # XLA path instead of failing to compile.
      return False
    weight_bytes = 2 * (D * H + S * H + D * (D // g) + 3 * H * D +
                        3 * D * (D // g))
    return weight_bytes <= 12 * 1024 * 1024

  def _obs_kernel_eligible(self, p):
    """Whether the wider fused observe step (core + posterior head,
    ops/observe.py) applies. On by default under kernel: auto (validated
    on-chip, ~3% whole-step win at size12m); kernel: off disables."""
    return (self.kernel in ('auto', 'imag', 'fused') and
            not self.absolute and
            len(self.obs_layers) == 1 and self._kernel_eligible(p))

  def _obs_seq_eligible(self, p):
    """Whether the grid-over-time fused observe window applies (one
    pallas_call for the whole BPTT loop, ops/observe_seq.py): same
    structural conditions as the per-step fused observe, plus lane-tile
    alignment for the in-kernel flat group softmax/argmax. `kernel:
    fused` restricts to the per-step kernels (the A/B baseline)."""
    return (self.kernel in ('auto', 'imag') and
            self._obs_kernel_eligible(p) and
            self.classes % 8 == 0 and
            (self.stoch * self.classes) % 128 == 0)

  def _imag_kernel_eligible(self, p):
    """Whether the fused imagination step (core + prior + sampling, one
    launch, ops/imagine.py) applies: same core conditions plus the
    default 2-layer prior and lane-aligned class layout."""
    # Opt-in only ('kernel: imag'): the fused step wins in isolation
    # (0.094 ms vs ~0.5 ms of XLA launches at B*K=1024) but regresses
    # the INTEGRATED train step ~1 ms at batch 16x64 — the pallas_call
    # boundary in the rollout scan blocks XLA from overlapping the
    # policy MLP with the dynamics. Kept for large-batch configurations.
    return (self.kernel == 'imag' and
            self._kernel_eligible(p) and
            len(self.img_layers) == 2 and
            self.classes % 8 == 0 and
            (self.stoch * self.classes) % 128 == 0)

  def _imag_seq_eligible(self, p):
    """Whether the whole-horizon fused imagination rollout applies
    (ops/imagine_seq.py: policy MLP + action sampling + core + prior +
    stoch sampling, one pallas_call for the full horizon). Structural
    conditions mirror the per-step fused kernels plus the lane-aligned
    class layout for in-kernel sampling; the policy-side conditions live
    in model.Model._fused_policy_spec (single-key action space with a
    categorical or bounded_normal head). On by default under
    kernel: auto; 'imag'/'fused' keep the per-step A/B baselines."""
    return (self.kernel == 'auto' and
            self._kernel_eligible(p) and
            len(self.img_layers) == 2 and
            self.classes % 8 == 0 and
            (self.stoch * self.classes) % 128 == 0)

  def _embed_params(self, p, ain, AP):
    """Action-embed (dynin2) weights with the input lane padded to AP:
    zero rows on the padding keep padded action lanes inert."""
    H = self.hidden
    par = lambda mod, name, shape: p(mod).param(name, shape, 0.0)
    wa = nn.cast(par('dynin2', 'kernel', (ain, H)))
    ba = nn.cast(par('dynin2', 'bias', (H,)))
    sa = par('dynin2norm', 'scale', (H,))
    wa = jnp.zeros((AP, H), wa.dtype).at[:ain].set(wa)
    return (wa, ba, sa)

  def _imag_params(self, p):
    D, H = self.deter, self.hidden
    L = self.stoch * self.classes
    par = lambda mod, name, shape: p(mod).param(name, shape, 0.0)
    return self._core_params(p) + (
        nn.cast(par('prior0', 'kernel', (D, H))),
        nn.cast(par('prior0', 'bias', (H,))),
        par('prior0norm', 'scale', (H,)),
        nn.cast(par('prior1', 'kernel', (H, H))),
        nn.cast(par('prior1', 'bias', (H,))),
        par('prior1norm', 'scale', (H,)),
        nn.cast(par('priorlogit', 'kernel', (H, L))),
        nn.cast(par('priorlogit', 'bias', (L,))),
    )

  def _obs_params(self, p, token_dim):
    D, H = self.deter, self.hidden
    L = self.stoch * self.classes
    par = lambda mod, name, shape: p(mod).param(name, shape, 0.0)
    return self._core_params(p) + (
        nn.cast(par('obs0', 'kernel', (D + token_dim, H))),
        nn.cast(par('obs0', 'bias', (H,))),
        par('obs0norm', 'scale', (H,)),
        nn.cast(par('obslogit', 'kernel', (H, L))),
        nn.cast(par('obslogit', 'bias', (L,))),
    )

  def _core_params(self, p):
    """Fetch the core weights (cast to compute dtype, norm scales f32) in
    the ops.blockgru.FIELDS order."""
    D, H, g = self.deter, self.hidden, self.blocks
    S = self.stoch * self.classes
    dg = D // g
    par = lambda mod, name, shape: p(mod).param(name, shape, 0.0)
    return (
        nn.cast(par('dynin0', 'kernel', (D, H))),
        nn.cast(par('dynin0', 'bias', (H,))),
        par('dynin0norm', 'scale', (H,)),
        nn.cast(par('dynin1', 'kernel', (S, H))),
        nn.cast(par('dynin1', 'bias', (H,))),
        par('dynin1norm', 'scale', (H,)),
        nn.cast(par('dynhid0blk', 'kernel', (g, dg, dg))),
        nn.cast(par('dynhid0blk', 'bias', (D,))),
        nn.cast(par('dynhid0in', 'kernel', (3 * H, D))),
        par('dynhid0norm', 'scale', (D,)),
        nn.cast(par('dyngru', 'kernel', (g, dg, 3 * dg))),
        nn.cast(par('dyngru', 'bias', (3 * D,))),
    )

  def _core(self, p, deter, stoch, actfeat, kernel=False):
    """Block-diagonal GRU core: one fused (g, d, u) batched matmul chain.
    `actfeat` is the precomputed action embedding from _action_feat."""
    g = self.blocks
    stoch = stoch.reshape((stoch.shape[0], -1))
    if kernel and self._kernel_eligible(p):
      from ...ops import blockgru
      return blockgru.core_step(
          nn.cast(deter), nn.cast(stoch), nn.cast(actfeat),
          self._core_params(p), True)
    parts = []
    for (linear, norm), value in zip(self.dynin[:2], (deter, stoch)):
      parts.append(self.actfn(norm(p, linear(p, value))))
    parts.append(actfeat)
    x = jnp.concatenate(parts, -1)
    x = self.dynhid_blk(p, deter) + self.dynhid_in(p, x)
    x = self.actfn(self.dynhid_norm(p, x))
    for blocklinear, norm in self.dynhid:
      x = self.actfn(norm(p, blocklinear(p, x)))
    x = self.dyngru(p, x)
    gates = jnp.split(flat2group(x, g), 3, -1)
    reset, cand, update = [group2flat(y) for y in gates]
    reset = jax.nn.sigmoid(reset)
    cand = jnp.tanh(reset * cand)
    update = jax.nn.sigmoid(update - 1)
    deter = update * cand + (1 - update) * deter
    return deter

  def _prior(self, p, feat):
    x = feat
    for linear, norm in self.img_layers:
      x = self.actfn(norm(p, linear(p, x)))
    return self._logit(self.img_logit, p, x)

  def _logit(self, layer, p, x):
    x = layer(p, x)
    return x.reshape((*x.shape[:-1], self.stoch, self.classes))

  def _dist(self, logits):
    out = dists.OneHot(logits, self.unimix)
    return dists.Agg(out, 1, jnp.sum)


class Encoder(nn.Module):
  """Simple CNN + MLP encoder. Parity: reference rssm.py Encoder."""

  def __init__(
      self, obs_space, name='enc', units=1024, norm='rms', act='gelu',
      depth=64, mults=(2, 3, 4, 4), layers=3, kernel=5, symlog=True,
      outer=False, strided=False, s2d=0, **kw):
    super().__init__(name)
    assert all(len(s.shape) <= 3 for s in obs_space.values()), obs_space
    self.obs_space = obs_space
    self.veckeys = [k for k, s in obs_space.items() if len(s.shape) <= 2]
    self.imgkeys = [k for k, s in obs_space.items() if len(s.shape) == 3]
    self.depths = tuple(depth * m for m in mults)
    self.symlog = symlog
    self.outer = outer
    self.strided = strided
    # Space-to-depth input layout: fold s2d x s2d pixel patches into
    # channels before the conv stack, so every convolution runs at high
    # channel counts (MXU-friendly) on a reduced grid. s2d=0 keeps the
    # reference layout (full-resolution stack, one stage per mult).
    self.s2d = int(s2d)
    if self.s2d:
      assert not outer and not strided, 's2d replaces the outer/strided modes'
      for k in self.imgkeys:
        res = obs_space[k].shape[:-1]
        assert all(r % self.s2d == 0 for r in res), (res, self.s2d)
    self.kernel = kernel
    self.actfn = nn.act(act)
    self.kw = kw
    if self.veckeys:
      vspace = {k: obs_space[k] for k in self.veckeys}
      squish = nn.symlog if symlog else None
      self.vecconcat = nn.DictConcat(vspace, 1, squish=squish)
      self.mlp_layers = [
          (nn.Linear(units, f'mlp{i}', **kw), nn.Norm(norm, f'mlp{i}norm'))
          for i in range(layers)]
    if self.imgkeys:
      self.convs = []
      for i, d in enumerate(self.depths):
        stride = 2 if (strided and not (outer and i == 0)) else 1
        self.convs.append((
            nn.Conv2D(d, kernel, f'cnn{i}', stride=stride, **kw),
            nn.Norm(norm, f'cnn{i}norm')))

  @property
  def entry_space(self):
    return {}

  def initial(self, batch_size):
    return {}

  def truncate(self, entries, carry=None):
    return {}

  def entry_pack(self, entries):
    return {}

  def entry_unpack(self, entries):
    return {}

  def __call__(self, ctx, carry, obs, reset, training, single=False):
    p = self.sub(ctx)
    bdims = 1 if single else 2
    bshape = reset.shape[:bdims]
    outs = []
    if self.veckeys:
      vecs = {k: obs[k] for k in self.veckeys}
      x = self.vecconcat(p, vecs)
      x = x.reshape((-1, *x.shape[bdims:]))
      for linear, norm in self.mlp_layers:
        x = self.actfn(norm(p, linear(p, x)))
      outs.append(x)
    if self.imgkeys:
      imgs = [obs[k] for k in sorted(self.imgkeys)]
      assert all(x.dtype == jnp.uint8 for x in imgs), [x.dtype for x in imgs]
      x = nn.cast(jnp.concatenate(imgs, -1), force=True) / 255 - 0.5
      x = x.reshape((-1, *x.shape[bdims:]))
      if self.s2d:
        x = space_to_depth(x, self.s2d)
      for i, (conv, norm) in enumerate(self.convs):
        x = conv(p, x)
        if not self.strided and not (self.outer and i == 0):
          # 2x2 max pool via reduce_window: XLA lowers its backward to a
          # native SelectAndScatter, ~100x cheaper on TPU than the
          # broadcast+eq+reduce chain the reshape+max formulation emits.
          x = jax.lax.reduce_window(
              x, -float('inf'), jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
              'VALID')
        x = self.actfn(norm(p, x))
      assert 3 <= x.shape[-3] <= 16, x.shape
      x = x.reshape((x.shape[0], -1))
      outs.append(x)
    x = jnp.concatenate(outs, -1)
    tokens = x.reshape((*bshape, *x.shape[1:]))
    return carry, {}, tokens


class Decoder(nn.Module):
  """CNN + MLP decoder with block-space projection.

  Parity: reference rssm.py Decoder including the bspace path that projects
  deter through a BlockLinear into the conv grid.
  """

  def __init__(
      self, obs_space, name='dec', units=1024, norm='rms', act='gelu',
      outscale=1.0, depth=64, mults=(2, 3, 4, 4), layers=3, kernel=5,
      symlog=True, bspace=8, outer=False, strided=False, s2d=0, **kw):
    super().__init__(name)
    self.obs_space = obs_space
    self.veckeys = [k for k, s in obs_space.items() if len(s.shape) <= 2]
    self.imgkeys = [k for k, s in obs_space.items() if len(s.shape) == 3]
    self.depths = tuple(depth * m for m in mults)
    self.imgdep = sum(obs_space[k].shape[-1] for k in self.imgkeys)
    self.imgres = self.imgkeys and obs_space[self.imgkeys[0]].shape[:-1]
    self.units = units
    self.bspace = bspace
    self.outer = outer
    self.strided = strided
    # Mirror of the encoder's space-to-depth layout: the conv stack renders
    # a reduced grid with s2d*s2d*channels outputs and the final
    # depth-to-space unfolds it to full resolution (see Encoder).
    self.s2d = int(s2d)
    if self.s2d:
      assert not outer and not strided, 's2d replaces the outer/strided modes'
      assert all(r % self.s2d == 0 for r in (self.imgres or ())), (
          self.imgres, self.s2d)
    self.kernel = kernel
    self.actfn = nn.act(act)
    self.kw = kw
    K = kernel
    if self.veckeys:
      spaces = {k: obs_space[k] for k in self.veckeys}
      o1 = 'categorical'
      o2 = 'symlog_mse' if symlog else 'mse'
      outputs = {k: o1 if v.discrete else o2 for k, v in spaces.items()}
      self.mlp = nn.MLP(layers, units, 'mlp', act=act, norm=norm, **kw)
      self.vec_head = nn.DictHead(
          spaces, outputs, 'vec', outscale=outscale, **kw)
    if self.imgkeys:
      factor = 2 ** (len(self.depths) - int(bool(outer)))
      factor *= max(1, self.s2d)
      self.minres = [int(x // factor) for x in self.imgres]
      assert 3 <= self.minres[0] <= 16, (self.minres, self.imgres)
      shape = (*self.minres, self.depths[-1])
      self.space_shape = shape
      if bspace:
        u = math.prod(shape)
        self.sp0 = nn.BlockLinear(u, bspace, 'sp0', **kw)
        self.sp1 = nn.Linear(2 * units, 'sp1', **kw)
        self.sp1norm = nn.Norm(norm, 'sp1norm')
        self.sp2 = nn.Linear(shape, 'sp2', **kw)
        self.spnorm = nn.Norm(norm, 'spnorm')
      else:
        self.space_lin = nn.Linear(shape, 'space', **kw)
        self.space_norm = nn.Norm(norm, 'spacenorm')
      self.deconvs = []
      for i, d in reversed(list(enumerate(self.depths[:-1]))):
        if strided:
          conv = nn.Conv2D(d, K, f'conv{i}', stride=2, transp=True, **kw)
        else:
          conv = nn.Conv2D(d, K, f'conv{i}', **kw)
        self.deconvs.append((i, conv, nn.Norm(norm, f'conv{i}norm')))
      okw = dict(**kw, outscale=outscale)
      outdep = self.imgdep * max(1, self.s2d) ** 2
      if outer:
        self.imgout = nn.Conv2D(outdep, K, 'imgout', **okw)
      elif strided:
        self.imgout = nn.Conv2D(
            outdep, K, 'imgout', stride=2, transp=True, **okw)
      else:
        self.imgout = nn.Conv2D(outdep, K, 'imgout', **okw)

  @property
  def entry_space(self):
    return {}

  def initial(self, batch_size):
    return {}

  def truncate(self, entries, carry=None):
    return {}

  def entry_pack(self, entries):
    return {}

  def entry_unpack(self, entries):
    return {}

  def __call__(self, ctx, carry, feat, reset, training, single=False):
    p = self.sub(ctx)
    assert feat['deter'].shape[-1] % max(self.bspace, 1) == 0
    recons = {}
    bshape = reset.shape[:(1 if single else 2)]
    inp = [nn.cast(feat[k]) for k in ('stoch', 'deter')]
    inp = [x.reshape((math.prod(bshape), -1)) for x in inp]
    inp = jnp.concatenate(inp, -1)

    if self.veckeys:
      x = self.mlp(p, inp)
      x = x.reshape((*bshape, *x.shape[1:]))
      outs = self.vec_head(p, x)
      recons.update(outs)

    if self.imgkeys:
      if self.bspace:
        g = self.bspace
        x0, x1 = nn.cast((feat['deter'], feat['stoch']))
        x1 = x1.reshape((*x1.shape[:-2], -1))
        x0 = x0.reshape((-1, x0.shape[-1]))
        x1 = x1.reshape((-1, x1.shape[-1]))
        x0 = self.sp0(p, x0)
        h, w = self.minres
        # (g h w c) -> (h, w, g*c)
        c = self.space_shape[-1] // g
        x0 = x0.reshape((-1, g, h, w, c))
        x0 = x0.transpose((0, 2, 3, 1, 4)).reshape((-1, h, w, g * c))
        x1 = self.actfn(self.sp1norm(p, self.sp1(p, x1)))
        x1 = self.sp2(p, x1)
        x = self.actfn(self.spnorm(p, x0 + x1))
      else:
        x = self.space_lin(p, inp)
        x = self.actfn(self.space_norm(p, x))
      for i, conv, norm in self.deconvs:
        if not self.strided:
          x = x.repeat(2, -2).repeat(2, -3)
        x = self.actfn(norm(p, conv(p, x)))
      if not self.outer and not self.strided:
        x = x.repeat(2, -2).repeat(2, -3)
      x = self.imgout(p, x)
      if self.s2d:
        x = depth_to_space(x, self.s2d)
      x = jax.nn.sigmoid(x)
      x = x.reshape((*bshape, *x.shape[1:]))
      split = np.cumsum(
          [self.obs_space[k].shape[-1] for k in self.imgkeys][:-1])
      for k, out in zip(self.imgkeys, jnp.split(x, split, -1)):
        recons[k] = dists.Agg(dists.MSE(out), 3, jnp.sum)

    return carry, {}, recons
