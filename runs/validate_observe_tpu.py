"""TPU validation + micro-benchmark of the fused observe kernel.

Run on the real chip (after the learning runs release the tunnel):
  PYTHONPATH=/root/repo:/root/.axon_site python runs/validate_observe_tpu.py

Checks, at size12m dims (deter 2048, hidden 256, stoch 32x16, blocks 8):
  1. fused_obs_step compiles under Mosaic and matches the XLA reference.
  2. fused_obs_bwd compiles and matches autodiff of the reference.
  3. Microbench: fused step+bwd vs XLA step+bwd wall time.
Exits nonzero on numeric mismatch.
"""

import json
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np

from embodied_tpu.ops import blockgru, observe

D, H, S, C, g = 2048, 256, 32, 16, 8
K = 512   # token dim (vector obs encoder output at size12m scale)
B = 1024  # B*T rows as seen by the BPTT step
L = S * C
dtype = jnp.bfloat16


def make(key):
  ks = jax.random.split(key, 8)
  dg = D // g
  init = lambda k, shape: (0.05 * jax.random.normal(k, shape, jnp.float32)
                           ).astype(dtype)
  params = (
      init(ks[0], (D, H)), jnp.zeros((H,), dtype), jnp.ones((H,), jnp.float32),
      init(ks[1], (S * C, H)), jnp.zeros((H,), dtype),
      jnp.ones((H,), jnp.float32),
      init(ks[2], (g, dg, dg)), jnp.zeros((D,), dtype),
      init(ks[3], (3 * H, D)), jnp.ones((D,), jnp.float32),
      init(ks[4], (g, dg, 3 * dg)), jnp.zeros((3 * D,), dtype),
      init(ks[5], (D + K, H)), jnp.zeros((H,), dtype),
      jnp.ones((H,), jnp.float32),
      init(ks[6], (H, L)), jnp.zeros((L,), dtype),
  )
  deter = (0.5 * jax.random.normal(ks[7], (B, D), jnp.float32)).astype(dtype)
  stoch = jax.nn.one_hot(
      jax.random.randint(ks[7], (B, S), 0, C), C).reshape(B, S * C
                                                          ).astype(dtype)
  act = (0.5 * jax.random.normal(ks[6], (B, H), jnp.float32)).astype(dtype)
  tok = (0.5 * jax.random.normal(ks[5], (B, K), jnp.float32)).astype(dtype)
  return params, deter, stoch, act, tok


def bench(fn, *args, n=30):
  out = fn(*args)
  jax.block_until_ready(out)
  t0 = time.perf_counter()
  for _ in range(n):
    out = fn(*args)
  jax.block_until_ready(out)
  return (time.perf_counter() - t0) / n * 1e3


def main():
  print('device:', jax.devices()[0])
  params, deter, stoch, act, tok = make(jax.random.PRNGKey(0))

  # 1. Forward parity.
  ref = observe.reference_obs_step(deter, stoch, act, tok, params)
  got = observe.fused_obs_step(deter, stoch, act, tok, params)
  for name, a, b in zip(('deter', 'logit'), ref, got):
    d = float(jnp.abs(jnp.float32(a) - jnp.float32(b)).max())
    print(f'fwd {name} maxdiff {d:.4f}')
    assert d < 0.1, (name, d)

  # 2. Backward parity.
  dout = jax.random.normal(jax.random.PRNGKey(1), (B, D), dtype)
  dlogit = jax.random.normal(jax.random.PRNGKey(2), (B, L), dtype)
  _, vjp = jax.vjp(observe.reference_obs_step, deter, stoch, act, tok,
                   params)
  want = vjp((dout, dlogit))
  got = observe.fused_obs_bwd(deter, stoch, act, tok, params, dout, dlogit)
  flat_w = list(want[:4]) + list(want[4])
  flat_g = list(got[:4]) + list(got[4])
  names = ['ddeter', 'dstoch', 'dact', 'dtok'] + list(observe.FIELDS)
  worst = 0.0
  for name, a, b in zip(names, flat_w, flat_g):
    a32, b32 = jnp.float32(a), jnp.float32(b)
    scale = float(jnp.abs(a32).max()) or 1.0
    d = float(jnp.abs(a32 - b32).max()) / scale
    worst = max(worst, d)
    if d > 0.05:
      print(f'bwd {name} RELDIFF {d:.4f} (scale {scale:.3f})')
  print(f'bwd worst reldiff {worst:.4f}')
  assert worst < 0.15, worst

  # 3. Microbench.
  def xla_fwdbwd(deter, stoch, act, tok):
    def loss(deter, stoch, act, tok, params):
      out, logit = observe.reference_obs_step(deter, stoch, act, tok,
                                              params)
      return (jnp.float32(out).sum() + jnp.float32(logit).sum())
    return jax.grad(loss, argnums=(0, 1))(deter, stoch, act, tok, params)

  def fused_fwdbwd(deter, stoch, act, tok):
    def loss(deter, stoch, act, tok, params):
      out, logit = observe.obs_step(deter, stoch, act, tok, params, True)
      return (jnp.float32(out).sum() + jnp.float32(logit).sum())
    return jax.grad(loss, argnums=(0, 1))(deter, stoch, act, tok, params)

  ms_xla = bench(jax.jit(xla_fwdbwd), deter, stoch, act, tok)
  ms_fused = bench(jax.jit(fused_fwdbwd), deter, stoch, act, tok)
  print(json.dumps({
      'xla_fwdbwd_ms': round(ms_xla, 3),
      'fused_fwdbwd_ms': round(ms_fused, 3),
      'speedup': round(ms_xla / ms_fused, 3),
  }))


if __name__ == '__main__':
  main()
