"""Segment-level device-time profile of the DreamerV3 train step.

Times each stage of the training computation as its own jitted function
(forward, and forward+backward via jax.grad over the parameter subset),
so the whole-step wall time decomposes into actionable buckets:

  encoder / observe scan (BPTT) / dynamics loss (observe+prior+KL) /
  decoder+heads / imagination rollout / full loss fwd / full train step

Timing method: through the tunneled device, per-call walls are unreliable
(dispatch is async and block_until_ready can return before the remote
queue drains), so every segment is measured by the SLOPE between one jit
that runs the segment once and one that runs it N times chained inside a
lax.fori_loop (the loop carry feeds a zero-scaled perturbation into every
parameter leaf, so iterations cannot be hoisted or overlapped), with the
final scalar materialized on the host. Compile time never enters the
wall, which keeps the derived mfu honest.

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

  import numpy as np

  def slope_time(make_scalar):
    """Wall-time of one evaluation of make_scalar(params) via the slope
    between 1 and 1+iters chained fori_loop iterations. EVERY param leaf
    gets a zero-scaled perturbation from the loop carry — perturbing only
    one leaf would let XLA hoist any segment that does not consume that
    leaf out of the loop entirely. The elementwise adds put a small floor
    (~0.1 ms at size12m: one read+write pass over the params) under each
    segment. Params enter as jit ARGUMENTS (closed-over device arrays
    would be embedded as per-executable constants: wrong timing and an
    HBM copy per compiled segment)."""
    def run(ps, n):
      def body(i, acc):
        eps = acc * 0.0
        p2 = {k: v + eps.astype(v.dtype) for k, v in ps.items()}
        return acc + make_scalar(p2).astype(jnp.float32)
      return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    f1 = jax.jit(lambda ps: run(ps, 1))
    fn_ = jax.jit(lambda ps: run(ps, 1 + args.iters))
    walls = []
    for f in (f1, fn_):
      float(np.asarray(f(params)))  # compile + warm
      best = float('inf')
      for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(f(params)))
        best = min(best, time.perf_counter() - t0)
      walls.append(best)
    # Drop the two compiled loop executables so segments don't pile up
    # HBM (each holds its own workspace reservation).
    jax.clear_caches()
    return max(0.0, 1000 * (walls[1] - walls[0]) / args.iters)

  def grad_scalar(fn):
    def inner(p):
      grads = jax.grad(fn)(p)
      return sum(jnp.sum(g.astype(jnp.float32)) for g in grads.values())
    return inner

  # The full train step (optimizer included), steady-state, measured
  # FIRST — before the segment jits exist — so the executable sees the
  # same HBM conditions as production. Warm up, then min over repeated
  # fixed-count loops (bench.py methodology): compile never enters.
  for _ in range(3):
    carry, _, _ = agent.train(carry, dict(data))
  jax.block_until_ready(agent.store)
  best = float('inf')
  for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(args.iters):
      carry, _, _ = agent.train(carry, dict(data))
    jax.block_until_ready(agent.store)
    best = min(best, time.perf_counter() - t0)
  segments['train_step_ms'] = round(1000 * best / args.iters, 3)

  for name, fn in fns.items():
    try:
      segments[f'{name}/fwd_ms'] = round(slope_time(fn), 3)
      segments[f'{name}/fwdbwd_ms'] = round(slope_time(grad_scalar(fn)), 3)
    except Exception as e:
      segments[f'{name}/error'] = str(e)[:200]
    print(name, {k: v for k, v in segments.items() if k.startswith(name)})

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
