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


def make(seed):
  # Host-side numpy generation + one device_put per array: eager jax.random
  # through the tunnel's remote-compile helper costs minutes per new shape.
  rng = np.random.default_rng(seed)
  dg = D // g
  import ml_dtypes
  np_dt = {jnp.bfloat16: ml_dtypes.bfloat16,
           jnp.float32: np.float32}
  # Cast in numpy, device_put raw bytes: an on-device cast is an eager op
  # and every distinct shape is a ~30s remote compile through the tunnel.
  put = lambda x, dt=dtype: jax.device_put(np.asarray(x, np_dt[dt]))
  init = lambda shape: put(0.05 * rng.standard_normal(shape))
  params = (
      init((D, H)), put(np.zeros(H)), put(np.ones(H), jnp.float32),
      init((S * C, H)), put(np.zeros(H)), put(np.ones(H), jnp.float32),
      init((g, dg, dg)), put(np.zeros(D)),
      init((3 * H, D)), put(np.ones(D), jnp.float32),
      init((g, dg, 3 * dg)), put(np.zeros(3 * D)),
      init((D + K, H)), put(np.zeros(H)), put(np.ones(H), jnp.float32),
      init((H, L)), put(np.zeros(L)),
  )
  deter = put(0.5 * rng.standard_normal((B, D)))
  onehot = np.eye(C, dtype=np.float32)[rng.integers(0, C, (B, S))]
  stoch = put(onehot.reshape(B, S * C))
  act = put(0.5 * rng.standard_normal((B, H)))
  tok = put(0.5 * rng.standard_normal((B, K)))
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
  params, deter, stoch, act, tok = make(0)

  # 1. Forward parity. Everything rides jit: eager dispatch through the
  # tunnel's remote-compile helper is minutes per op.
  ref = jax.jit(observe.reference_obs_step)(deter, stoch, act, tok, params)
  got = observe.fused_obs_step(deter, stoch, act, tok, params)
  for name, a, b in zip(('deter', 'logit'), ref, got):
    a32 = np.asarray(a, np.float32)
    b32 = np.asarray(b, np.float32)
    d = float(np.abs(a32 - b32).max())
    print(f'fwd {name} maxdiff {d:.4f}')
    assert d < 0.1, (name, d)

  # 2. Backward parity.
  rng = np.random.default_rng(1)
  import ml_dtypes
  dout = jax.device_put(
      np.asarray(rng.standard_normal((B, D)), ml_dtypes.bfloat16))
  dlogit = jax.device_put(
      np.asarray(rng.standard_normal((B, L)), ml_dtypes.bfloat16))

  @jax.jit
  def ref_vjp(deter, stoch, act, tok, params, dout, dlogit):
    _, vjp = jax.vjp(observe.reference_obs_step, deter, stoch, act, tok,
                     params)
    return vjp((dout, dlogit))

  want = ref_vjp(deter, stoch, act, tok, params, dout, dlogit)
  got = observe.fused_obs_bwd(deter, stoch, act, tok, params, dout, dlogit)
  flat_w = list(want[:4]) + list(want[4])
  flat_g = list(got[:4]) + list(got[4])
  names = ['ddeter', 'dstoch', 'dact', 'dtok'] + list(observe.FIELDS)
  worst = 0.0
  for name, a, b in zip(names, flat_w, flat_g):
    a32 = np.asarray(a, np.float32)
    b32 = np.asarray(b, np.float32)
    scale = float(np.abs(a32).max()) or 1.0
    d = float(np.abs(a32 - b32).max()) / scale
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
