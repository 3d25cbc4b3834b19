"""TPU validation + microbench of the int8 weight-streaming observe window.

Run on the real chip (tunnel free):
  PYTHONPATH=/root/repo:/root/.axon_site python runs/validate_qcore_tpu.py [size]

At size200m dims (deter 8192, hidden 1024, stoch 32x64, blocks 8) the
bf16 core+posterior weights are ~139 MB — beyond VMEM — so the bf16
window kernel is ineligible and the XLA scan re-streams the weights
every step (~8.9 GB per 64-step window). The int8 quantized weights are
~70 MB: this script checks the int8 window kernel compiles at those
dims, matches the XLA reference over the DEQUANTIZED weights, and
measures the fwd window against that reference scan (slope method:
wall difference between 1 and N chained windows inside one jit, since
per-call walls through the tunnel are unreliable).
"""

import json
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from embodied_tpu.ops import observe_seq as seqlib
from embodied_tpu.ops import qcore

SIZES = {
    'size50m': dict(D=4096, H=512, S=32, C=32),
    'size200m': dict(D=8192, H=1024, S=32, C=64),
}
g = 8
B = 16
T = 64
K = 512
f32 = jnp.float32
bf16 = jnp.bfloat16


def make(D, H, S, C, seed=0):
  rng = np.random.default_rng(seed)
  import ml_dtypes
  dg = D // g
  L = S * C
  put = lambda x, dt=ml_dtypes.bfloat16: jax.device_put(np.asarray(x, dt))
  init = lambda shape: put(0.05 * rng.standard_normal(shape))
  params = (
      init((D, H)), put(np.zeros(H)), put(np.ones(H), np.float32),
      init((L, H)), put(np.zeros(H)), put(np.ones(H), np.float32),
      init((g, dg, dg)), put(np.zeros(D)),
      init((3 * H, D)), put(np.ones(D), np.float32),
      init((g, dg, 3 * dg)), put(np.zeros(3 * D)),
      init((D + K, H)), put(np.zeros(H)), put(np.ones(H), np.float32),
      init((H, L)), put(np.zeros(L)),
  )
  deter0 = put(0.5 * rng.standard_normal((B, D)))
  onehot = np.eye(C, dtype=np.float32)[rng.integers(0, C, (B, S))]
  stoch0 = put(onehot.reshape(B, L))
  act = put(0.5 * rng.standard_normal((T, B, H)))
  tok = put(0.5 * rng.standard_normal((T, B, K)))
  keep = jax.device_put(np.ones((T, B), np.float32))
  gum = jax.device_put(np.asarray(rng.gumbel(size=(T, B, L)), np.float32))
  return params, deter0, stoch0, act, tok, keep, gum


def slope(fn, *args, n=8, reps=4):
  """ms per call via the wall difference of 1 vs n chained calls."""
  def chain(m):
    def run(*a):
      deter0, stoch0 = a[0], a[1]
      def body(i, carry):
        d0, s0 = carry
        ds, ss, _ = fn(d0, s0, *a[2:])
        return (ds[-1], ss[-1])
      return lax.fori_loop(0, m, body, (deter0, stoch0))
    return jax.jit(run)
  f1, fn_ = chain(1), chain(1 + n)
  walls = []
  for f in (f1, fn_):
    out = f(*args)
    float(np.asarray(out[0], np.float32).sum())
    best = float('inf')
    for _ in range(reps):
      t0 = time.perf_counter()
      out = f(*args)
      float(np.asarray(out[0], np.float32).sum())
      best = min(best, time.perf_counter() - t0)
    walls.append(best)
  return 1000 * (walls[1] - walls[0]) / n


def main():
  size = sys.argv[1] if len(sys.argv) > 1 else 'size200m'
  dims = SIZES[size]
  D, H, S, C = dims['D'], dims['H'], dims['S'], dims['C']
  print('device:', jax.devices()[0], 'size:', size, dims)
  params, deter0, stoch0, act, tok, keep, gum = make(D, H, S, C)
  qparams, scales = qcore.quantize_params(params)
  qbytes = sum(int(np.prod(x.shape)) * jnp.dtype(x.dtype).itemsize
               for x in qparams)
  bbytes = sum(int(np.prod(x.shape)) * jnp.dtype(x.dtype).itemsize
               for x in params)
  print(f'weights: bf16 {bbytes / (1 << 20):.0f} MB -> int8+exact '
        f'{qbytes / (1 << 20):.0f} MB')

  qfn = lambda d0, s0, a, tk, kp, gm: qcore.qobs_window(
      d0, s0, a, tk, kp, gm, qparams, scales, g=g, S=S, C=C, nch=8)
  dseq, sseq, lseq = jax.jit(qfn)(deter0, stoch0, act, tok, keep, gum)

  deq = qcore.dequantize_params(qparams, scales)
  ref = jax.jit(lambda d0, s0, a, tk, kp, hd: seqlib.reference_observe_seq(
      d0, s0, a, tk, kp, deq, hd, C))
  rd, rs, rl = ref(deter0, stoch0, act, tok, keep, sseq)
  d = float(np.abs(np.asarray(rd, np.float32) -
                   np.asarray(dseq, np.float32)).max())
  print(f'fwd deter maxdiff vs dequantized reference: {d:.4f}')
  assert d < 0.15, d

  t_q = slope(qfn, deter0, stoch0, act, tok, keep, gum)
  reffn = lambda d0, s0, a, tk, kp, hd: ref(d0, s0, a, tk, kp, hd)
  t_ref = slope(reffn, deter0, stoch0, act, tok, keep, sseq)
  print(json.dumps({
      'size': size,
      'int8_window_ms': round(t_q, 3),
      'bf16_scan_ms': round(t_ref, 3),
      'speedup': round(t_ref / t_q, 2),
      'weight_mb_int8': round(qbytes / (1 << 20), 1),
      'weight_mb_bf16': round(bbytes / (1 << 20), 1),
  }))


if __name__ == '__main__':
  main()
