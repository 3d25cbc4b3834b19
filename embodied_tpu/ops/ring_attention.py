"""Ring attention: sequence-parallel attention over a mesh axis.

The reference handles long sequences with recurrent O(1)-state scans and
truncated-carry resume (SURVEY §5.7); it has no sequence parallelism.
This module adds the TPU-native extension: attention over a sequence that
is SHARDED across devices on a mesh axis. Keys/values rotate around the
ring with `jax.lax.ppermute` (one ICI hop per step) while each device
accumulates its queries' attention with a flash-style online softmax, so
the full (T, T) score matrix never materializes and per-device memory
stays O(T_local).

Two entry points:
- ring_attention(q, k, v, axis_name, causal): call INSIDE shard_map with
  time-sharded q/k/v of shape (B, T_local, H, D).
- ring_attention_sharded(q, k, v, mesh, axis, causal): wraps shard_map
  for callers holding global (B, T, H, D) arrays.

Differentiable: built from ppermute/einsum, so jax.grad works under
shard_map (collectives have transpose rules).
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

f32 = jnp.float32


def _block_attn(q, k, v, bias):
  """Scores and value-sum for one (q-block, kv-block) pair in f32.
  q: (B, Tq, H, D), k/v: (B, Tk, H, D), bias: (Tq, Tk) additive mask."""
  scale = q.shape[-1] ** -0.5
  scores = jnp.einsum('bqhd,bkhd->bhqk', q, k, preferred_element_type=f32)
  scores = scores * scale + bias[None, None, :, :]
  m = scores.max(-1)                                   # (B, H, Tq)
  p = jnp.exp(scores - m[..., None])
  l = p.sum(-1)                                        # (B, H, Tq)
  o = jnp.einsum('bhqk,bkhd->bqhd', p.astype(v.dtype), v)
  return m, l, o.astype(f32)


def ring_attention(q, k, v, axis_name, causal=False):
  """Sequence-parallel attention inside shard_map.

  q, k, v: (B, T_local, H, D) — the local time shard on each device of
  the `axis_name` ring. Returns (B, T_local, H, D) in q.dtype.
  """
  n = jax.lax.axis_size(axis_name)
  idx = jax.lax.axis_index(axis_name)
  B, Tl, H, D = q.shape
  neg = jnp.asarray(-1e30, f32)

  def bias_for(qblock, kblock):
    # Additive causal mask between global blocks qblock and kblock.
    if not causal:
      return jnp.zeros((Tl, Tl), f32)
    qpos = qblock * Tl + jnp.arange(Tl)[:, None]
    kpos = kblock * Tl + jnp.arange(Tl)[None, :]
    return jnp.where(qpos >= kpos, 0.0, neg)

  # Flash accumulation state: running max m, normalizer l, output o.
  # Unrolled python loop: n is static (mesh extent), and each iteration's
  # kv permute can overlap the next block's compute under XLA async
  # collectives.
  m = jnp.full((B, H, Tl), -jnp.inf, f32)
  l = jnp.zeros((B, H, Tl), f32)
  o = jnp.zeros((B, Tl, H, D), f32)
  perm = [(i, (i + 1) % n) for i in range(n)]
  carry = (m, l, o, k, v)
  for r in range(n):
    m, l, o, k_, v_ = carry
    kblock = (idx - r) % n  # Which global block this kv shard holds now.
    bm, bl, bo = _block_attn(q, k_, v_, bias_for(idx, kblock))
    new_m = jnp.maximum(m, bm)
    # Rescale both accumulators onto the new max. exp(-inf - finite) = 0
    # takes care of the empty initial state.
    c_old = jnp.exp(m - new_m)
    c_new = jnp.exp(bm - new_m)
    l = l * c_old + bl * c_new
    o = o * c_old.transpose(0, 2, 1)[..., None] + (
        bo * c_new.transpose(0, 2, 1)[..., None])
    if r + 1 < n:
      k_ = jax.lax.ppermute(k_, axis_name, perm)
      v_ = jax.lax.ppermute(v_, axis_name, perm)
    carry = (new_m, l, o, k_, v_)

  m, l, o, _, _ = carry
  l = jnp.maximum(l, 1e-30)
  out = o / l.transpose(0, 2, 1)[..., None]
  return out.astype(q.dtype)


@functools.lru_cache(maxsize=None)
def _sharded_fn(mesh, axis, causal):
  spec = P(None, axis)
  fn = functools.partial(ring_attention, axis_name=axis, causal=causal)
  return jax.jit(jax.shard_map(
      fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
      check_vma=False))


def ring_attention_sharded(q, k, v, mesh, axis='t', causal=False):
  """Run ring attention over global (B, T, H, D) arrays, sharding the
  time dimension over `axis` of `mesh`. The jitted shard_map executable
  is cached per (mesh, axis, causal), so repeated calls with the same
  shapes reuse one compile."""
  return _sharded_fn(mesh, axis, causal)(q, k, v)


def full_attention(q, k, v, causal=False):
  """Reference dense attention for testing."""
  scale = q.shape[-1] ** -0.5
  scores = jnp.einsum('bqhd,bkhd->bhqk', q, k, preferred_element_type=f32)
  scores = scores * scale
  if causal:
    T = q.shape[1]
    mask = jnp.tril(jnp.ones((T, T), bool))
    scores = jnp.where(mask[None, None], scores, -1e30)
  probs = jax.nn.softmax(scores, -1)
  out = jnp.einsum('bhqk,bkhd->bqhd', probs.astype(v.dtype), v)
  return out.astype(q.dtype)
