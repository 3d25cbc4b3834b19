"""TPU validation + micro-benchmark of the whole-horizon imagination kernel.

Run on the real chip (after the learning runs release the tunnel):
  PYTHONPATH=/root/repo:/root/.axon_site python runs/validate_imagine_seq_tpu.py

Checks, at size12m dims (deter 2048, hidden 256, stoch 32x16, blocks 8,
policy 3x256) with the imagination batch B = batch_size*batch_length = 1024
and horizon H = 15:
  1. fused_imagine_seq compiles under Mosaic; deterministic tensors match
     the XLA reference scan replaying the kernel's own samples.
  2. Microbench: whole-horizon fused rollout vs the XLA per-step scan
     (the kernel:auto path before this kernel) for both continuous and
     discrete action heads.
Exits nonzero on numeric mismatch.
"""

import json
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np

from embodied_tpu.ops import imagine_seq as imslib

D, Hh, S, C, g = 2048, 256, 32, 16, 8
L = S * C
B = 1024
T = 15
AP = 128
NPOL = 3
UNITS = 256
ADIM = 6  # walker-like continuous action
NCLS = 17  # pinpad-like discrete action
MINSTD, MAXSTD = 0.1, 1.0
dtype = jnp.bfloat16
f32 = jnp.float32


def make(disc, seed=0):
  rng = np.random.default_rng(seed)
  import ml_dtypes
  np_dt = {jnp.bfloat16: ml_dtypes.bfloat16, jnp.float32: np.float32}
  put = lambda x, dt=dtype: jax.device_put(np.asarray(x, np_dt[dt]))
  init = lambda shape: put(0.05 * rng.standard_normal(shape))
  dg = D // g
  ain = NCLS if disc else ADIM
  indim = D + L
  params = [
      init((D, Hh)), put(np.zeros(Hh)), put(np.ones(Hh), f32),
      init((L, Hh)), put(np.zeros(Hh)), put(np.ones(Hh), f32),
      init((g, dg, dg)), put(np.zeros(D)),
      init((3 * Hh, D)), put(np.ones(D), f32),
      init((g, dg, 3 * dg)), put(np.zeros(3 * D)),
      # prior
      init((D, Hh)), put(np.zeros(Hh)), put(np.ones(Hh), f32),
      init((Hh, Hh)), put(np.zeros(Hh)), put(np.ones(Hh), f32),
      init((Hh, L)), put(np.zeros(L)),
  ]
  # action embed, padded rows
  wa = np.zeros((AP, Hh), np.float32)
  wa[:ain] = 0.3 * rng.standard_normal((ain, Hh))
  params += [put(wa), put(np.zeros(Hh)), put(np.ones(Hh), f32)]
  # policy mlp
  for i in range(NPOL):
    dim = indim if i == 0 else UNITS
    params += [init((dim, UNITS)), put(np.zeros(UNITS)),
               put(np.ones(UNITS), f32)]
  # head(s), padded columns
  def padded(cols_extra_bias=0.0):
    w = np.zeros((UNITS, AP), np.float32)
    w[:, :ain] = 0.1 * rng.standard_normal((UNITS, ain))
    b = np.full((AP,), cols_extra_bias, np.float32)
    b[:ain] = 0.0
    return put(w), put(b, f32)
  if disc:
    w, b = padded(-1e9)
    params += [w, b]
  else:
    wm, bm = padded()
    ws, bs = padded()
    params += [wm, bm, ws, bs]
  params = tuple(params)

  deter0 = put(0.5 * rng.standard_normal((B, D)))
  onehot = np.eye(C, dtype=np.float32)[rng.integers(0, C, (B, S))]
  stoch0 = put(onehot.reshape(B, L))
  gum = jax.device_put(np.asarray(rng.gumbel(size=(T, B, L)), np.float32))
  if disc:
    noise = np.asarray(rng.gumbel(size=(T, B, AP)), np.float32)
  else:
    noise = np.asarray(rng.standard_normal((T, B, AP)), np.float32)
  return params, deter0, stoch0, gum, jax.device_put(noise)


def bench(fn, *args, n=30):
  out = fn(*args)
  jax.block_until_ready(out)
  t0 = time.perf_counter()
  for _ in range(n):
    out = fn(*args)
  jax.block_until_ready(out)
  return (time.perf_counter() - t0) / n * 1e3


def validate(disc):
  tag = 'disc' if disc else 'cont'
  params, deter0, stoch0, gum, noise = make(disc)
  kw = dict(g=g, S=S, C=C, npol=NPOL, disc=disc,
            minstd=MINSTD, maxstd=MAXSTD)

  fused = jax.jit(lambda d0, s0, gm, nz, pa: imslib.fused_imagine_seq(
      d0, s0, gm, nz, pa, **kw))
  dseq, sseq, lseq, aseq = fused(deter0, stoch0, gum, noise, params)
  s3 = np.asarray(sseq, np.float32).reshape(T, B, S, C)
  assert np.allclose(s3.sum(-1), 1.0), 'samples not one-hot'

  ref = jax.jit(
      lambda d0, s0, gm, nz, hd, ac, pa: imslib.reference_imagine_seq(
          d0, s0, gm, nz, hd, ac, pa, NPOL, disc, C,
          minstd=MINSTD, maxstd=MAXSTD))
  rd, rs, rl, ra = ref(deter0, stoch0, gum, noise, sseq, aseq, params)
  for name, a, b, tol in (('deter', rd, dseq, 0.15),
                          ('logit', rl, lseq, 0.25),
                          ('act', ra, aseq, 0.05)):
    a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
    d = float(np.abs(a32 - b32).max())
    print(f'{tag} fwd {name} maxdiff {d:.4f}')
    assert d < tol, (tag, name, d)

  # Microbench: fused vs the XLA per-step scan replaying the same samples
  # (identical math and sample stream; the scan is what kernel:auto ran
  # before this kernel, minus the XLA-side sampling argmaxes).
  t_fused = bench(fused, deter0, stoch0, gum, noise, params)
  t_scan = bench(ref, deter0, stoch0, gum, noise, sseq, aseq, params)
  print(json.dumps({
      'mode': tag,
      'fused_rollout_ms': round(t_fused, 3),
      'xla_scan_ms': round(t_scan, 3),
      'speedup': round(t_scan / t_fused, 2),
  }))
  return t_fused, t_scan


def main():
  print('device:', jax.devices()[0])
  validate(False)
  validate(True)


if __name__ == '__main__':
  main()
