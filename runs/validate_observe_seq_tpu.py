"""TPU validation + micro-benchmark of the grid-over-time observe kernel.

Run on the real chip (after the learning runs release the tunnel):
  PYTHONPATH=/root/repo:/root/.axon_site python runs/validate_observe_seq_tpu.py

Checks, at size12m dims (deter 2048, hidden 256, stoch 32x16, blocks 8),
train window T=64 x B=16:
  1. fused_observe_seq compiles under Mosaic; its deterministic tensors
     match the XLA reference scan replaying the kernel's own samples.
  2. fused_observe_seq_bwd compiles and matches autodiff of the replayed
     reference.
  3. Microbench: whole-window fused fwd+bwd vs the per-step XLA scan
     fwd+bwd and vs the per-step fused kernel scan.
Exits nonzero on numeric mismatch.
"""

import json
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np

from embodied_tpu.ops import observe, observe_seq

D, H, S, C, g = 2048, 256, 32, 16, 8
K = 512
B = 16
T = 64
L = S * C
dtype = jnp.bfloat16
f32 = jnp.float32


def make(seed):
  rng = np.random.default_rng(seed)
  dg = D // g
  import ml_dtypes
  np_dt = {jnp.bfloat16: ml_dtypes.bfloat16, jnp.float32: np.float32}
  put = lambda x, dt=dtype: jax.device_put(np.asarray(x, np_dt[dt]))
  init = lambda shape: put(0.05 * rng.standard_normal(shape))
  params = (
      init((D, H)), put(np.zeros(H)), put(np.ones(H), f32),
      init((S * C, H)), put(np.zeros(H)), put(np.ones(H), f32),
      init((g, dg, dg)), put(np.zeros(D)),
      init((3 * H, D)), put(np.ones(D), f32),
      init((g, dg, 3 * dg)), put(np.zeros(3 * D)),
      init((D + K, H)), put(np.zeros(H)), put(np.ones(H), f32),
      init((H, L)), put(np.zeros(L)),
  )
  deter0 = put(0.5 * rng.standard_normal((B, D)))
  onehot = np.eye(C, dtype=np.float32)[rng.integers(0, C, (B, S))]
  stoch0 = put(onehot.reshape(B, S * C))
  act = put(0.5 * rng.standard_normal((T, B, H)))
  tok = put(0.5 * rng.standard_normal((T, B, K)))
  keep = np.ones((T, B), np.float32)
  keep[7, 3] = 0.0
  keep = jax.device_put(keep)
  gum = jax.device_put(
      np.asarray(rng.gumbel(size=(T, B, L)), np.float32))
  return params, deter0, stoch0, act, tok, keep, gum


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
  params, deter0, stoch0, act, tok, keep, gum = make(0)
  kw = dict(g=g, S=S, C=C)

  # 1. Forward: compile + replay parity.
  dseq, sseq, lseq = observe_seq.fused_observe_seq(
      deter0, stoch0, act, tok, keep, gum, params, **kw)
  s3 = np.asarray(sseq, np.float32).reshape(T, B, S, C)
  assert np.allclose(s3.sum(-1), 1.0), 'samples not one-hot'
  ref = jax.jit(
      lambda *a: observe_seq.reference_observe_seq(*a, C=C))(
      deter0, stoch0, act, tok, keep, params, sseq)
  for name, a, b in zip(('deter', 'stoch', 'logit'), ref,
                        (dseq, sseq, lseq)):
    a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
    d = float(np.abs(a32 - b32).max())
    print(f'fwd {name} maxdiff {d:.4f}')
    assert d < 0.15, (name, d)

  # 2. Backward parity.
  rng = np.random.default_rng(1)
  import ml_dtypes
  ddet = jax.device_put(
      np.asarray(rng.standard_normal((T, B, D)), ml_dtypes.bfloat16))
  dsto = jax.device_put(
      np.asarray(rng.standard_normal((T, B, L)), ml_dtypes.bfloat16))
  dlog = jax.device_put(
      np.asarray(rng.standard_normal((T, B, L)), ml_dtypes.bfloat16))

  @jax.jit
  def ref_vjp(deter0, stoch0, act, tok, params, ddet, dsto, dlog):
    def fn(deter0, stoch0, act, tok, params):
      rd, rs, rl = observe_seq.reference_observe_seq(
          deter0, stoch0, act, tok, keep, params, sseq, C)
      return (jnp.sum(rd.astype(f32) * ddet.astype(f32)) +
              jnp.sum(rs.astype(f32) * dsto.astype(f32)) +
              jnp.sum(rl.astype(f32) * dlog.astype(f32)))
    return jax.grad(fn, argnums=(0, 1, 2, 3, 4))(
        deter0, stoch0, act, tok, params)

  want = ref_vjp(deter0, stoch0, act, tok, params, ddet, dsto, dlog)
  dprev = jnp.concatenate([deter0[None], dseq[:-1]], 0)
  sprev = jnp.concatenate([stoch0[None], sseq[:-1]], 0)
  got = observe_seq.fused_observe_seq_bwd(
      dprev, sprev, act, tok, keep, params, ddet, dsto, dlog, **kw)
  flat_w = list(want[:4]) + list(want[4])
  flat_g = list(got[:4]) + list(got[4])
  names = ['ddeter0', 'dstoch0', 'dact', 'dtok'] + list(observe_seq.FIELDS)
  worst = 0.0
  for name, a, b in zip(names, flat_w, flat_g):
    a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
    scale = float(np.abs(a32).max()) or 1.0
    d = float(np.abs(a32 - b32).max()) / scale
    worst = max(worst, d)
    if d > 0.05:
      print(f'bwd {name} RELDIFF {d:.4f} (scale {scale:.3f})')
  print(f'bwd worst reldiff {worst:.4f}')
  assert worst < 0.15, worst

  # 3. Microbench: whole window fwd+bwd.
  def seq_fwdbwd(deter0, stoch0, act, tok, gum):
    def loss(deter0, stoch0, act, tok, params):
      rd, rs, rl = observe_seq.observe_seq(
          deter0, stoch0, act, tok, keep, gum, params, g, S, C)
      return (rd.astype(f32).sum() + rs.astype(f32).sum() +
              rl.astype(f32).sum())
    return jax.grad(loss, argnums=(0, 1, 4))(
        deter0, stoch0, act, tok, params)

  def scan_xla_fwdbwd(deter0, stoch0, act, tok):
    def loss(deter0, stoch0, act, tok, params):
      rd, rs, rl = observe_seq.reference_observe_seq(
          deter0, stoch0, act, tok, keep, params, sseq, C)
      return (rd.astype(f32).sum() + rs.astype(f32).sum() +
              rl.astype(f32).sum())
    return jax.grad(loss, argnums=(0, 1, 4))(
        deter0, stoch0, act, tok, params)

  def scan_step_kernel_fwdbwd(deter0, stoch0, act, tok):
    # Per-step fused kernel inside a lax.scan (the round-3 default path),
    # sampling replayed, so the same work modulo launch granularity.
    def step(carry, inp):
      deter, stoch = carry
      a, tk, m, hard = inp
      mm = m[:, None]
      deter = (deter.astype(f32) * mm).astype(deter.dtype)
      stoch = (stoch.astype(f32) * mm).astype(stoch.dtype)
      a = (a.astype(f32) * mm).astype(a.dtype)
      new, logit = observe.obs_step(deter, stoch, a, tk, params, True)
      z3 = logit.astype(f32).reshape(B, S, C)
      probs, _ = observe_seq._sample_probs(z3, 0.01)
      sample = probs + jax.lax.stop_gradient(
          hard.astype(f32).reshape(B, S, C) - probs)
      sample = sample.reshape(B, L).astype(new.dtype)
      return (new, sample), (new, sample, logit)

    def loss(deter0, stoch0, act, tok, params):
      _, (rd, rs, rl) = jax.lax.scan(
          step, (deter0, stoch0), (act, tok, keep, sseq))
      return (rd.astype(f32).sum() + rs.astype(f32).sum() +
              rl.astype(f32).sum())
    return jax.grad(loss, argnums=(0, 1))(deter0, stoch0, act, tok, params)

  t_seq = bench(jax.jit(seq_fwdbwd), deter0, stoch0, act, tok, gum)
  t_xla = bench(jax.jit(scan_xla_fwdbwd), deter0, stoch0, act, tok)
  t_step = bench(jax.jit(scan_step_kernel_fwdbwd), deter0, stoch0, act, tok)
  print(json.dumps({
      'seq_kernel_ms': round(t_seq, 3),
      'xla_scan_ms': round(t_xla, 3),
      'step_kernel_scan_ms': round(t_step, 3),
      'speedup_vs_xla': round(t_xla / t_seq, 2),
      'speedup_vs_step_kernel': round(t_step / t_seq, 2),
  }))


if __name__ == '__main__':
  main()
