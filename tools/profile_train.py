"""Segment-level device-time profile of the DreamerV3 train step.

Times each stage of the training computation as its own jitted function
(forward, and forward+backward via jax.grad over the parameter subset),
so the whole-step wall time decomposes into actionable buckets:

  encoder / observe scan (BPTT) / dynamics loss (observe+prior+KL) /
  decoder+heads / imagination rollout / full loss fwd / full train step

This replaces an xprof op profile on hosts where the TensorBoard profile
tooling is unavailable; segment walls are measured on the real device
with block_until_ready around a fixed iteration count.

Usage:
  python tools/profile_train.py --size size12m [--iters 20] [--out f.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_agent, peak_flops  # noqa: E402


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--size', default='size12m')
  parser.add_argument('--batch', type=int, default=16)
  parser.add_argument('--length', type=int, default=64)
  parser.add_argument('--kernel', default='')
  parser.add_argument('--iters', type=int, default=20)
  parser.add_argument('--out', default='')
  args = parser.parse_args()

  agent, model, config = build_agent(
      args.size, args.batch, args.length, args.kernel)
  import jax
  import jax.numpy as jnp
  from embodied_tpu.nn.core import Ctx
  # This tool moves intermediates host<->device freely; the production
  # transfer-guard discipline does not apply here.
  jax.config.update('jax_transfer_guard', 'allow')

  B = agent.batch_size
  L = agent.batch_length + agent.replay_context
  data = agent._example_batch(B, L, spaces=model.ext_space)
  data['is_first'][:, 0] = True
  data = agent._device_batch(data)
  store = dict(agent.store)
  meta = agent.meta
  key = jax.random.PRNGKey(0)
  carry = agent.init_train(B)

  params = {k: v for k, v in store.items() if meta.get(k) == 'param'}
  rest = {k: v for k, v in store.items() if meta.get(k) != 'param'}

  def ctx_of(s):
    return Ctx(dict(s), create=False, key=key, meta=meta)

  # One forward pass up front to materialize every intermediate the
  # segments need (tokens, repfeat, entries, windowed obs/prevact).
  @jax.jit
  def prep(store, carry, data):
    ctx = ctx_of(store)
    *wm_carry, lastact = carry
    carry3, obs, prevact, stepid = model._resume_window(carry, data)
    losses, metrics, out_carry, entries, tokens, repfeat = (
        model._world_model_objectives(ctx, carry3, obs, prevact, True))
    return dict(obs=obs, prevact=prevact, tokens=tokens, repfeat=repfeat,
                carry3=carry3, dyn_entries=entries[1],
                dyn_carry=out_carry[1])

  inter = prep(store, carry, data)
  inter = jax.tree.map(jnp.asarray, inter)
  obs, prevact = inter['obs'], inter['prevact']
  reset = obs['is_first']

  def scalar(tree_):
    leaves = [v for v in jax.tree.leaves(tree_)
              if jnp.issubdtype(v.dtype, jnp.floating)]
    return sum(jnp.sum(v.astype(jnp.float32)) for v in leaves)

  segments = {}

  def enc_fwd(params):
    ctx = ctx_of({**rest, **params})
    enc_carry = inter['carry3'][0]
    _, _, tokens = model.enc(ctx, enc_carry, obs, reset, True)
    return scalar(tokens)

  def observe_fwd(params):
    ctx = ctx_of({**rest, **params})
    _, entries, feat = model.dyn.observe(
        ctx, inter['carry3'][1], inter['tokens'], prevact, reset, True)
    return scalar(feat)

  def dyn_fwd(params):
    ctx = ctx_of({**rest, **params})
    _, _, losses, feat, _ = model.dyn.loss(
        ctx, inter['carry3'][1], inter['tokens'], prevact, reset, True)
    return scalar(losses) + 0 * scalar(feat)

  def dec_heads_fwd(params):
    s = {**rest, **params}
    ctx = ctx_of(s)
    repfeat = inter['repfeat']
    _, _, recons = model.dec(ctx, inter['carry3'][2], repfeat, reset, True)
    total = sum(jnp.sum(d.loss(jnp.zeros_like(d.pred())))
                for d in recons.values())
    inp = model._feat2tensor(repfeat)
    total += jnp.sum(model.rew(ctx, inp, 2).loss(obs['reward']))
    total += jnp.sum(model.con(ctx, inp, 2).loss(
        jnp.zeros_like(obs['reward'])))
    return total

  def imag_fwd(params):
    ctx = ctx_of({**rest, **params})
    losses, img_out, mets = model._imagination_objectives(
        ctx, obs, inter['repfeat'], inter['dyn_entries'],
        inter['dyn_carry'], True)
    return scalar(losses)

  def full_fwd(params):
    ctx = ctx_of({**rest, **params})
    total, _ = model.loss(
        ctx, inter['carry3'], obs, prevact, True)
    return total

  fns = dict(
      enc=enc_fwd, observe=observe_fwd, dyn=dyn_fwd,
      dec_heads=dec_heads_fwd, imag=imag_fwd, full=full_fwd)

  def timeit(fn, *fargs):
    out = fn(*fargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
      out = fn(*fargs)
    jax.block_until_ready(out)
    return 1000 * (time.perf_counter() - t0) / args.iters

  for name, fn in fns.items():
    fwd = jax.jit(fn)
    grad = jax.jit(lambda p, fn=fn: jax.grad(fn)(p))
    try:
      segments[f'{name}/fwd_ms'] = round(timeit(fwd, params), 3)
      segments[f'{name}/fwdbwd_ms'] = round(timeit(grad, params), 3)
    except Exception as e:
      segments[f'{name}/error'] = str(e)[:200]
    print(name, {k: v for k, v in segments.items() if k.startswith(name)})

  # The full train step (optimizer included) for reference. The train
  # executable donates its carry, so rebind it every call.
  carry, _, _ = agent.train(carry, dict(data))
  jax.block_until_ready(agent.store)
  t0 = time.perf_counter()
  for _ in range(args.iters):
    carry, _, _ = agent.train(carry, dict(data))
  jax.block_until_ready(agent.store)
  segments['train_step_ms'] = round(
      1000 * (time.perf_counter() - t0) / args.iters, 3)

  cost = agent.train_cost()
  flops = float(cost.get('flops', 0) or 0)
  peak = peak_flops(jax.devices()[0])
  result = dict(
      size=args.size, batch=B, length=agent.batch_length,
      device=str(jax.devices()[0]),
      gflop_per_step=round(flops / 1e9, 1),
      mfu=round(flops / (segments['train_step_ms'] / 1e3) / peak, 4)
      if peak and flops else 0.0,
      segments=segments)
  line = json.dumps(result, indent=2)
  print(line)
  if args.out:
    with open(args.out, 'w') as f:
      f.write(line + '\n')


if __name__ == '__main__':
  main()
