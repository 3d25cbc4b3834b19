"""Device-resident replay-latent table (HBM staging buffer).

TPU-native redesign of the reference's replay-context latent round trip.
The reference stores packed latents in replay RAM and ships them
host<->device with every policy output and every training batch, then
patches refreshed latents back into replay after each train step
(/root/reference/dreamerv3/agent.py:89-99,132-134 and
/root/reference/embodied/core/replay.py:129-149). That is the dominant
host<->device transfer of the learner hot loop: ~2-8 KB per frame for the
size presets, i.e. megabytes per train step in both directions.

Here the packed latents never leave the device. They live in an HBM ring
table keyed by a 4-byte slot id; the replay buffer stores only
(slot, slotgen) per step. The policy scatters fresh latents into the table
in-graph, and the train step gathers context latents / scatters refreshed
ones in-graph — HBM reads and writes instead of PCIe (or worse) traffic.
Replay RAM shrinks by the same payload.

Correctness under eviction and overwrite is by generation tags: every slot
write records the allocation generation, and a sampled step whose stored
generation no longer matches gathers an invalid latent. The train step then
resets the carry at the window start — the same semantics as a fresh
episode boundary. With the default auto capacity covering the replay
capacity, mismatches only occur for steps inserted before the last process
restart, and the table self-heals: every train step re-writes the latents
(and generations) of the steps it visited, so a step becomes valid again
after its first post-restart visit.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

GEN_INVALID = np.uint32(0xFFFFFFFF)


class LatentTable:
  """HBM ring table of packed latents plus a host-side slot allocator.

  The table arrays are sharded over the mesh batch axes ('d','f') on the
  slot dimension, so gathers/scatters from batch-sharded training data stay
  on-device (XLA inserts the collectives). Slot ids are allocated host-side
  round-robin; in multi-host runs every process owns a disjoint range so
  concurrent allocations never collide.
  """

  def __init__(self, spaces, capacity, mesh, nprocs=1, proc=0, eval_slots=0):
    assert spaces, 'LatentTable needs at least one latent key'
    self.spaces = dict(spaces)
    self.keys = tuple(self.spaces)
    nshard = int(np.prod(mesh.devices.shape[:2]))
    quantum = max(1, nshard * nprocs)
    capacity = int(-(-(int(capacity) + int(eval_slots)) // quantum) * quantum)
    self.capacity = capacity
    self.mesh = mesh
    per = capacity // nprocs
    # Eval-mode policy calls and eval-replay steps allocate from their own
    # region so they never churn the train ring: without the split, running
    # eval envs would wrap train slots faster than the train replay fills
    # and invalidate context latents early (silent carry resets).
    eval_span = min(per // 2, -(-int(eval_slots) // nprocs)) if eval_slots \
        else 0
    self.spans = {'train': per - eval_span}
    self.bases = {'train': proc * per}
    if eval_span:
      self.spans['eval'] = eval_span
      self.bases['eval'] = proc * per + (per - eval_span)
    self.counters = {k: 0 for k in self.spans}
    sharding = NamedSharding(mesh, P(('d', 'f')))

    def build():
      tables = {
          k: jnp.zeros((capacity, *s.shape), s.dtype)
          for k, s in self.spaces.items()}
      tables['_gen'] = jnp.full((capacity,), GEN_INVALID, jnp.uint32)
      return tables

    shardings = {k: sharding for k in (*self.keys, '_gen')}
    self._build = jax.jit(build, out_shardings=shardings)
    self.tables = self._build()

  def reset(self):
    """Return the table to the fresh all-invalid state (every generation
    tag back to the sentinel, allocator counters to zero)."""
    self.tables = self._build()
    self.counters = {k: 0 for k in self.counters}

  @property
  def nbytes(self):
    return sum(v.nbytes for v in self.tables.values())

  @staticmethod
  def bytes_per_slot(spaces):
    return 4 + sum(
        int(np.prod(s.shape)) * np.dtype(s.dtype).itemsize
        for s in spaces.values())

  @property
  def counter(self):
    return self.counters['train']

  @property
  def span(self):
    return self.spans['train']

  def alloc(self, n, region='train'):
    """Allocate n slots; returns (slots int32, gens uint32) numpy arrays."""
    if region not in self.spans:
      region = 'train'
    span = self.spans[region]
    idx = self.counters[region] + np.arange(n, dtype=np.int64)
    self.counters[region] += n
    slots = (self.bases[region] + idx % span).astype(np.int32)
    # Generations cycle below GEN_INVALID so an allocated tag can never
    # equal the table's never-written sentinel.
    gens = ((idx // span) % int(GEN_INVALID)).astype(np.uint32)
    return slots, gens

  def bump_generations(self):
    """Advance every region's allocator to the next generation boundary.

    Called when the agent state was restored WITHOUT allocator state (a
    pre-table checkpoint): restored replay may hold (slot, gen) pairs from
    the previous run, and fresh allocations restarting at gen 0 would mint
    identical pairs — stale replay steps would then falsely validate and
    graft another trajectory's latent as context. Starting one generation
    up makes every restored pair mismatch until its first refresh."""
    for region, span in self.spans.items():
      self.counters[region] = (self.counters[region] // span + 1) * span

  def save(self):
    return {'counters': dict(self.counters)}

  def load(self, state):
    if 'counters' in state:
      for k, v in state['counters'].items():
        if k in self.counters:
          self.counters[k] = int(v)
    else:  # Old single-counter checkpoints.
      self.counters['train'] = int(state.get('counter', 0))

  # --- Pure helpers used inside jitted steps ------------------------------

  @staticmethod
  def gather(tables, keys, slots):
    """Read latents + validity at integer slots of any batch shape."""
    slots = slots.astype(jnp.int32)
    values = {k: tables[k][slots] for k in keys}
    return values

  @staticmethod
  def valid(tables, slots, gens):
    return tables['_gen'][slots.astype(jnp.int32)] == gens

  @staticmethod
  def scatter(tables, keys, slots, gens, values):
    """Write latents + generations; returns a new tables dict."""
    flat = slots.astype(jnp.int32).reshape(-1)
    new = dict(tables)
    for k in keys:
      v = values[k]
      v = v.reshape((-1, *v.shape[slots.ndim:]))
      new[k] = new[k].at[flat].set(v.astype(new[k].dtype))
    new['_gen'] = new['_gen'].at[flat].set(gens.reshape(-1))
    return new
