"""Device-layer Agent: wraps a pure functional model into the core Agent API.

Capability parity: /root/reference/embodied/jax/agent.py — mesh construction
over ('d','f','t'), regex partition rules from the model, jitted
init/train/policy/report with explicit in/out shardings and donated train
state, per-call seed counters, prefetched device streams, checkpoint
gather/shard, and AOT precompilation.

TPU-native design notes:
- Everything is jit + NamedSharding (GSPMD); no pmap. The full train store
  (params, optimizer slots, normalizer state) is ONE flat dict donated to
  the train executable every step, so parameter updates happen in place in
  HBM with zero host traffic.
- The policy runs on the same mesh from a read-only view of the store (no
  copy; the dict shares device buffers). A separate policy mesh/device
  split can be layered on without changing the model contract.

The model contract (duck-typed):
  model.init_policy/init_train/init_report(ctx, batch_size) -> carry
  model.policy(ctx, carry, obs, mode) -> carry, act, out
  model.train(ctx, carry, data) -> carry, outs, metrics
  model.report(ctx, carry, data) -> carry, metrics
  model.policy_keys: regex over store paths needed by policy
  model.partition_rules: [(regex, partition spec tuple)]
  model.ext_space: dict of extra replay keys (consec/stepid/latents)
"""

import re
import threading

import jax
import jax.numpy as jnp
import numpy as np

from .. import core as corelib
from ..core import streams as streamlib
from ..nn.core import Ctx
from ..utils import Space, timer
from . import latents as latentslib
from . import meshes


class Agent(corelib.Agent):

  def __init__(self, model, obs_space, act_space, config):
    self.model = model
    self.obs_space = obs_space
    self.act_space = {k: v for k, v in act_space.items() if k != 'reset'}
    self.config = config
    jaxcfg = config.jax
    self.batch_size = config.batch_size
    self.batch_length = config.batch_length
    self.replay_context = config.replay_context
    self.seed = int(config.seed)

    # Multi-host: every process holds batch_size rows; the global batch is
    # batch_size * process_count (parity: reference jax/agent.py:199-217).
    self.nprocs = jax.process_count()
    if self.nprocs > 1:
      self.batch_size = self.batch_size * self.nprocs
      print(f'Global batch size: {self.batch_size} ({self.nprocs} hosts)')

    self.mesh = meshes.make_mesh(getattr(jaxcfg, 'mesh', '-1,1,1'))
    self.data_sharding = meshes.data_sharding(self.mesh)
    self.replicated = meshes.replicated(self.mesh)
    self.nbatch = int(np.prod(self.mesh.devices.shape[:2]))
    assert self.batch_size % self.nbatch == 0, (
        self.batch_size, self.mesh.devices.shape)

    # Optional policy/train device split: the policy runs on its own mesh
    # with a double-buffered copy of the policy parameters (parity:
    # reference jax/agent.py:80-104,277-284).
    policy_mesh_spec = getattr(jaxcfg, 'policy_mesh', '')
    if policy_mesh_spec:
      self.policy_mesh = meshes.make_mesh(policy_mesh_spec)
      self._policy_cache = None
      self._policy_dirty = True
    else:
      self.policy_mesh = None

    # Explicit-collective mode: the train step runs under shard_map with
    # per-device RNG and explicit gradient/metric pmean over the data axes
    # (parity: reference jax/transform.py:84-111 use_shardmap). GSPMD jit
    # remains the default paved path on TPU.
    self.use_shardmap = bool(getattr(jaxcfg, 'shardmap', False)) and (
        self.mesh.devices.size > 1)

    # Device-resident replay-latent table: replay-context latents stay in
    # HBM, keyed by 4-byte slot ids that travel through replay instead of
    # the KB-scale latent payload (see parallel/latents.py). Requires the
    # single-mesh GSPMD path (the policy scatters into the learner's
    # table). jax.latent_slots: 0 = off (host path, reference behavior),
    # -1 = auto (cover the replay capacity within jax.latent_budget_gb),
    # >0 = explicit slot count.
    self._latents = None
    self._latent_keys = tuple(getattr(model, 'latent_keys', ()) or ())
    self._latents_in_replay = bool(
        getattr(jaxcfg, 'latents_in_replay', False))
    slots_cfg = int(float(getattr(jaxcfg, 'latent_slots', 0)))
    if (self._latent_keys and slots_cfg != 0 and self.policy_mesh is None
        and not self.use_shardmap):
      spaces = {k: model.ext_space[k] for k in self._latent_keys}
      minimum = 4 * self.batch_size * (self.batch_length +
                                       self.replay_context)
      if slots_cfg > 0:
        capacity = max(slots_cfg, minimum)
        eval_slots = max(minimum, capacity // 10)
      else:
        budget = float(getattr(jaxcfg, 'latent_budget_gb', 4.0)) * (1 << 30)
        replay_size = int(float(getattr(config, 'replay_size', 1e6)))
        per = latentslib.LatentTable.bytes_per_slot(spaces)
        # Eval envs allocate from a separate region sized for the eval
        # replay (capacity/10 in the run protocols), so eval traffic can
        # never wrap the train ring early.
        eval_slots = max(minimum, replay_size // 10)
        capacity = max(minimum, min(
            replay_size, int(budget // per) - eval_slots))
      self._latents = latentslib.LatentTable(
          spaces, capacity, self.mesh, self.nprocs, jax.process_index(),
          eval_slots=eval_slots)
      print(f'Latent table: {self._latents.capacity:,} device-resident '
            f'slots ({self._latents.nbytes / (1 << 20):.0f} MB HBM)')

    # Depth of the async train-output fetch pipeline (see train()).
    self._fetch_depth = max(1, int(getattr(jaxcfg, 'fetch_depth', 3)))
    import collections
    self._pending_train = collections.deque()
    self._fetched_train = None

    self._counters = {'train': 0, 'policy': 0, 'report': 0}
    # Built-in profiler window: traces train updates [start, stop) into
    # logdir/profile (parity: reference jax/agent.py:296-311).
    self._profiler = dict(
        enabled=bool(getattr(jaxcfg, 'profiler', False)),
        start=100, stop=120, active=False,
        outdir=str(config.logdir) + '/profile')
    # Serializes device use across actor/learner threads: train donates the
    # store, so no policy call may hold the old buffers mid-donation
    # (mirrors the reference's policy/train locks, jax/agent.py:157-158).
    self._device_lock = threading.Lock()
    self._base_key_cache = None
    self._base_key()  # Materialize eagerly, before any tracing.
    self._init_store()
    self._build_fns()
    if getattr(jaxcfg, 'precompile', False):
      self._precompile()

  # --- Example data -------------------------------------------------------

  @property
  def ext_space(self):
    """Replay keys as seen by the host: with the latent table enabled the
    latent columns are replaced by their 4-byte slot id + generation. With
    jax.latents_in_replay the packed latent columns ride replay AS WELL,
    serving as the fallback context where a generation tag no longer
    matches (agent restarted while replay persisted) — reference-exact
    resume semantics at the cost of the latent payload transfers."""
    ext = dict(self.model.ext_space)
    if self._latents is not None:
      if not self._latents_in_replay:
        for key in self._latent_keys:
          ext.pop(key, None)
      ext['slot'] = Space(np.int32)
      ext['slotgen'] = Space(np.uint32)
    return ext

  def _example_batch(self, batch_size, length, spaces=None):
    if spaces is None:
      spaces = self.ext_space
    spaces = {**self.obs_space, **self.act_space, **spaces}
    data = {}
    for key, space in spaces.items():
      if key.startswith('log/'):
        continue
      shape = (batch_size, length, *space.shape)
      if key == 'slot' and self._latents is not None:
        idx = np.arange(batch_size * length, dtype=np.int64)
        data[key] = (idx % self._latents.capacity).astype(
            np.int32).reshape(shape)
      else:
        data[key] = np.zeros(shape, space.dtype)
    return data

  def _example_obs(self, batch_size):
    data = {}
    for key, space in self.obs_space.items():
      if key.startswith('log/'):
        continue
      data[key] = np.zeros((batch_size, *space.shape), space.dtype)
    return data

  # --- Init ---------------------------------------------------------------

  def _base_key(self):
    # Kept as host numpy: the jitted functions close over this key, and a
    # device-resident constant would need an implicit device-to-host read
    # at lowering time (which the transfer guard rightly rejects). Cached
    # eagerly because this is also reached from inside traces, where the
    # PRNGKey would be a tracer.
    cached = getattr(self, '_base_key_cache', None)
    if cached is None:
      with jax.transfer_guard('allow'):
        cached = np.asarray(jax.device_get(jax.random.PRNGKey(self.seed)))
      self._base_key_cache = cached
    return cached

  def _init_store(self):
    import zlib
    length = self.batch_length + self.replay_context
    # Init traces the raw model, which always consumes the model-native
    # data format (latent columns, not table slots).
    data = self._example_batch(
        self.batch_size, length, spaces=self.model.ext_space)
    meta_cell = {}
    recipe_cell = {}

    def tracefn(seedctr, data):
      key = jax.random.fold_in(self._base_key(), seedctr)
      ctx = Ctx({}, create=True, key=key)
      carry = self.model.init_train(ctx, self.batch_size)
      self.model.train(ctx, carry, data)
      self.model.init_policy(ctx, self.batch_size)
      self.model.init_report(ctx, self.batch_size)
      store = {**ctx.store, **ctx.updates}
      meta_cell.update(ctx.meta)
      recipe_cell.update(ctx.recipes)
      return store

    data_shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), data)
    shapes = jax.eval_shape(tracefn, 0, data_shapes)
    self.meta = dict(meta_cell)
    missing = set(shapes) - set(recipe_cell)
    assert not missing, f'Entries without init recipes: {sorted(missing)[:5]}'
    rules = getattr(self.model, 'partition_rules', [])
    if self.use_shardmap:
      # shard_map mode runs the model on per-device batch shards with the
      # full parameters, so the store must be replicated (no FSDP/TP).
      rules = []
    self.shardings = meshes.resolve_rules(shapes, rules, self.mesh)

    # Materialize the store from the recorded recipes only: this avoids
    # tracing/compiling the whole train graph a second time just for init
    # (params are keyed by path hash, so values match the traced init).
    def fastinit(seedctr):
      key = jax.random.fold_in(self._base_key(), seedctr)
      store = {}
      for path, recipe in recipe_cell.items():
        if recipe[0] != 'init':
          continue
        _, init, shape, dtype = recipe
        if callable(init):
          pkey = jax.random.fold_in(key, zlib.crc32(path.encode()))
          store[path] = init(pkey, shape, dtype)
        else:
          store[path] = jnp.full(shape, init, dtype)
      for path, recipe in recipe_cell.items():
        if recipe[0] == 'copy':
          store[path] = store[recipe[1]]
      return store

    with timer.section('agent_init_params'):
      self.store = jax.jit(fastinit, out_shardings=self.shardings)(
          jax.device_put(np.uint32(0)))
    total = sum(
        v.size for k, v in self.store.items()
        if self.meta.get(k) == 'param')
    print(f'Initialized agent store: {len(self.store)} entries, '
          f'{total:,} trainable params')

  def _policy_paths(self):
    pattern = re.compile(self.model.policy_keys)
    return [k for k in self.store if pattern.search(k)]

  def policy_store(self):
    subset = {k: self.store[k] for k in self._policy_paths()}
    if self.policy_mesh is None:
      return subset  # Shares device buffers with the train store.
    # Split mode: copy params to the policy mesh when stale.
    if self._policy_dirty or self._policy_cache is None:
      replicated = meshes.replicated(self.policy_mesh)
      self._policy_cache = {
          k: jax.device_put(v, replicated) for k, v in subset.items()}
      self._policy_dirty = False
    return self._policy_cache

  # --- Jitted functions ---------------------------------------------------

  def _build_fns(self):
    model = self.model
    base = self._base_key()
    meta = self.meta

    def train_core(store, key, carry, data):
      ctx = Ctx(dict(store), create=False, key=key, meta=meta)
      carry, outs, mets = model.train(ctx, carry, data)
      new_store = {**store, **ctx.updates}
      return new_store, carry, outs, mets

    def trainfn(store, seedctr, carry, data):
      key = jax.random.fold_in(base, seedctr)
      return train_core(store, key, carry, data)

    def smtrainfn(store, seedctr, carry, data):
      """Train step under shard_map: data split over ('d','f'), params
      replicated, per-device RNG, explicit pmean of grads (in the
      optimizer via DATA_AXES) and of scalar metrics."""
      from jax.sharding import PartitionSpec as P
      from ..nn import opt as optlib
      mesh = self.mesh
      axes = ('d', 'f')
      nshard = mesh.shape['d'] * mesh.shape['f']
      dspec = P(axes)

      def leafspec(x):
        batched = getattr(x, 'ndim', 0) >= 1 and x.shape[0] % nshard == 0
        return dspec if batched else P()

      def inner(store, seedctr, carry, data):
        idx = jax.lax.axis_index('d') * mesh.shape['f'] + (
            jax.lax.axis_index('f'))
        key = jax.random.fold_in(jax.random.fold_in(base, seedctr), idx)
        new_store, carry, outs, mets = train_core(store, key, carry, data)
        # Scalar metrics are per-shard means; average them so every device
        # returns the same (replicated) value.
        mets = jax.tree.map(
            lambda x: jax.lax.pmean(x.astype(jnp.float32), axes)
            if x.ndim == 0 else x, mets)
        return new_store, carry, outs, mets

      # Output structure (traced without collectives) drives the out specs.
      # The store is replicated on BOTH sides — leafspec must never touch
      # it, or a parameter whose first dim happens to divide the shard
      # count would get concatenated into garbage.
      optlib.DATA_AXES[0] = ()
      shapes = jax.eval_shape(trainfn, store, seedctr, carry, data)
      _, carry_shapes, outs_shapes, mets_shapes = shapes
      store_specs = {k: P() for k in store}
      out_specs = (
          store_specs,
          jax.tree.map(leafspec, carry_shapes),
          jax.tree.map(leafspec, outs_shapes),
          jax.tree.map(leafspec, mets_shapes))
      in_specs = (
          store_specs, P(),
          jax.tree.map(leafspec, carry), jax.tree.map(leafspec, data))
      optlib.DATA_AXES[0] = axes
      try:
        return jax.shard_map(
            inner, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False)(store, seedctr, carry, data)
      finally:
        optlib.DATA_AXES[0] = ()

    def policyfn(mode):
      def fn(pstore, seedctr, carry, obs):
        key = jax.random.fold_in(
            jax.random.fold_in(base, seedctr), 1_000_003)
        ctx = Ctx(dict(pstore), create=False, key=key, meta=meta)
        return model.policy(ctx, carry, obs, mode=mode)
      return fn

    def reportfn(store, seedctr, carry, data):
      key = jax.random.fold_in(base, seedctr)
      ctx = Ctx(dict(store), create=False, key=key, meta=meta)
      carry, mets = model.report(ctx, carry, data)
      return carry, mets

    def init_mode(mode):
      def fn(store, batch_size):
        ctx = Ctx(dict(store), create=False, key=base, meta=meta)
        return getattr(model, f'init_{mode}')(ctx, batch_size)
      return fn

    # --- Latent-table variants: latents gathered/scattered in-graph ----
    latent_keys = self._latent_keys
    K = self.replay_context
    Table = latentslib.LatentTable

    latents_in_replay = self._latents_in_replay

    def inject_latents(tables, data):
      """Pop slot/gen and gather latents from the table into the data
      dict. Where the generation tag no longer matches (slot evicted,
      overwritten, or written before a restart): fall back to the packed
      latents the batch itself carries (latents_in_replay mode), else
      reset the window start so no stale context is grafted."""
      data = dict(data)
      slots = data.pop('slot')
      gens = data.pop('slotgen')
      fresh = Table.gather(tables, latent_keys, slots)
      valid = Table.valid(tables, slots, gens)
      if latents_in_replay:
        for k in latent_keys:
          stored = data[k]
          mask = valid.reshape(valid.shape + (1,) * (stored.ndim - 2))
          data[k] = jnp.where(mask, fresh[k], stored)
      else:
        data.update(fresh)
        if K:
          firstchunk = data['consec'][:, 0] == 0
          bad = firstchunk & ~valid[:, K - 1]
          isf = data['is_first']
          data['is_first'] = isf.at[:, K].set(isf[:, K] | bad)
      return data, slots, gens, valid

    def trainfn_table(store, tables, seedctr, carry, data):
      key = jax.random.fold_in(base, seedctr)
      data, slots, gens, valid = inject_latents(tables, data)
      new_store, carry, outs, mets = train_core(store, key, carry, data)
      outs = dict(outs)
      if latents_in_replay:
        # Scatter the refreshed latents into the table AND let them flow
        # back to the host so the run protocol patches the replay copies
        # (the restart-safe fallback stays fresh too).
        upd = outs.get('replay', None)
      else:
        upd = outs.pop('replay', None)
      if upd is not None:
        upd = dict(upd)
        upd.pop('stepid', None)
        tables = Table.scatter(
            tables, latent_keys, slots[:, K:], gens[:, K:], upd)
      mets = dict(mets)
      mets['latents/valid'] = valid.astype(jnp.float32).mean()
      return new_store, tables, carry, outs, mets

    def reportfn_table(store, tables, seedctr, carry, data):
      key = jax.random.fold_in(base, seedctr)
      data, _, _, _ = inject_latents(tables, data)
      ctx = Ctx(dict(store), create=False, key=key, meta=meta)
      carry, mets = model.report(ctx, carry, data)
      return carry, mets

    def policyfn_table(mode):
      def fn(pstore, tables, seedctr, carry, obs, slots, gens):
        key = jax.random.fold_in(
            jax.random.fold_in(base, seedctr), 1_000_003)
        ctx = Ctx(dict(pstore), create=False, key=key, meta=meta)
        carry, act, out = model.policy(ctx, carry, obs, mode=mode)
        out = dict(out)
        if latents_in_replay:
          # The packed latents travel to replay as columns AND into the
          # table; replay copies become the restart-safe fallback.
          values = {k: out[k] for k in latent_keys}
        else:
          values = {k: out.pop(k) for k in latent_keys}
        tables = Table.scatter(tables, latent_keys, slots, gens, values)
        return tables, carry, act, out
      return fn

    self._train_raw = trainfn
    self._train = jax.jit(
        smtrainfn if self.use_shardmap else trainfn, donate_argnums=(0, 2))
    # Models can expose extra policy modes (e.g. Director's 'explore'
    # behavior); each mode is a separate static branch -> executable.
    modes = ('train', 'eval') + tuple(
        getattr(model, 'policy_modes', ()) or ())
    self._policy = {
        mode: jax.jit(policyfn(mode), donate_argnums=(2,))
        for mode in modes}
    self._report = jax.jit(reportfn)
    if self._latents is not None:
      self._train_table = jax.jit(trainfn_table, donate_argnums=(0, 1, 3))
      self._report_table = jax.jit(reportfn_table)
      self._policy_table = {
          mode: jax.jit(policyfn_table(mode), donate_argnums=(1, 3))
          for mode in modes}
    self._init_fns = {
        mode: jax.jit(init_mode(mode), static_argnums=(1,))
        for mode in ('policy', 'train', 'report')}

  def train_cost(self):
    """AOT-compile the train step and return XLA's cost analysis dict
    (notably 'flops' and 'bytes accessed'); shares the compile cache with
    the executable the train loop uses."""
    length = self.batch_length + self.replay_context
    data = self._example_batch(self.batch_size, length)
    data_shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), data)
    store_shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        dict(self.store))
    carry = jax.eval_shape(
        lambda: self._init_fns['train'](store_shapes, self.batch_size))
    if self._latents is not None:
      table_shapes = jax.tree.map(
          lambda x: jax.ShapeDtypeStruct(
              x.shape, x.dtype, sharding=x.sharding),
          dict(self._latents.tables))
      lowered = self._train_table.lower(
          store_shapes, table_shapes, 0, carry, data_shapes)
    else:
      lowered = self._train.lower(store_shapes, 0, carry, data_shapes)
    compiled = lowered.compile()
    try:
      cost = compiled.cost_analysis()
      return cost[0] if isinstance(cost, list) else dict(cost)
    except Exception:
      return {}

  def _precompile(self):
    with timer.section('precompile_train'):
      cost = self.train_cost()
      flops = cost.get('flops', 0)
      if flops:
        print(f'Train step FLOPs: {flops:.3e}')

  # --- Agent API ----------------------------------------------------------

  def init_policy(self, batch_size):
    return self._init_fns['policy'](dict(self.store), batch_size)

  def init_train(self, batch_size):
    # Callers pass the per-host batch size; carries span the global batch.
    return self._init_fns['train'](
        dict(self.store), batch_size * self.nprocs)

  def init_report(self, batch_size):
    return self._init_fns['report'](
        dict(self.store), batch_size * self.nprocs)

  @timer.section('agent_policy')
  def policy(self, carry, obs, mode='train'):
    obs = {k: v for k, v in obs.items() if not k.startswith('log/')}
    with self._device_lock:
      if self.policy_mesh is not None:
        target = meshes.replicated(self.policy_mesh)
        obs = {k: jax.device_put(v, target) for k, v in obs.items()}
        carry = jax.tree.map(lambda x: jax.device_put(x, target), carry)
      else:
        obs = self._device_batch(obs)
        # Host-side carries (the parallel actor gathers/scatters them as
        # numpy per env id) ride an explicit put; device carries pass
        # through untouched.
        carry = jax.tree.map(
            lambda x: x if isinstance(x, jax.Array)
            else jax.device_put(x, self.replicated), carry)
      self._counters['policy'] += 1
      if self._latents is not None:
        # Allocate slots host-side; the jitted step scatters the packed
        # latents into the HBM table, so only the 4-byte ids come back.
        B = len(next(iter(obs.values())))
        slots, gens = self._latents.alloc(
            B, 'eval' if mode == 'eval' else 'train')
        extra = self._device_batch({'slot': slots, 'slotgen': gens})
        fn = self._policy_table.get(mode, self._policy_table['train'])
        tables, carry, act, out = fn(
            self.policy_store(), self._latents.tables,
            self._seedctr(self._counters['policy']), carry, obs,
            extra['slot'], extra['slotgen'])
        self._latents.tables = tables
        act, out = jax.device_get((act, out))
        out['slot'], out['slotgen'] = slots, gens
      else:
        fn = self._policy.get(mode, self._policy['train'])
        carry, act, out = fn(
            self.policy_store(), self._seedctr(self._counters['policy']),
            carry, obs)
        act, out = jax.device_get((act, out))
    act = {k: np.asarray(v) for k, v in act.items()}
    out = {k: np.asarray(v) for k, v in out.items()}
    return carry, act, out

  @timer.section('agent_train')
  def train(self, carry, data):
    """One train step. Outputs and metrics are fetched through a depth-k
    pipeline (jax.fetch_depth) so several device->host DMAs stay in flight
    while the device computes ahead — on hosts with slow transfer links
    the fetch would otherwise serialize with compute. Results come back
    k steps late; replay updates are keyed by stepid, so delay is safe.
    During warmup the oldest result is returned repeatedly (replay updates
    are idempotent overwrites). Parity: the reference's one-step
    pending_outs, /root/reference/embodied/jax/agent.py:286-294."""
    with self._device_lock:
      if not isinstance(next(iter(data.values())), jax.Array):
        data = self._device_batch(data)
      self._counters['train'] += 1
      self._maybe_profile(self._counters['train'])
      use_table = self._latents is not None and 'slot' in data
      with jax.profiler.StepTraceAnnotation(
          'train', step_num=self._counters['train']):
        if use_table:
          (self.store, self._latents.tables, carry, outs,
           mets) = self._train_table(
              self.store, self._latents.tables,
              self._seedctr(self._counters['train']),
              carry, data)
        else:
          self.store, carry, outs, mets = self._train(
              self.store, self._seedctr(self._counters['train']),
              carry, data)
      # Start device->host DMA for this step's outputs without blocking.
      self._start_fetch((outs, mets))
      queue = self._pending_train
      queue.append((outs, mets))
      if len(queue) > self._fetch_depth:
        self._fetched_train = outs, mets = self._fetch_local(queue.popleft())
      else:
        if self._fetched_train is None:
          self._fetched_train = self._fetch_local(queue[0])
        outs, mets = self._fetched_train
      if self.policy_mesh is not None:
        self._policy_dirty = True
    return carry, outs, mets

  @timer.section('agent_report')
  def report(self, carry, data):
    with self._device_lock:
      if not isinstance(next(iter(data.values())), jax.Array):
        data = self._device_batch(data)
      self._counters['report'] += 1
      if self._latents is not None and 'slot' in data:
        carry, mets = self._report_table(
            dict(self.store), self._latents.tables,
            self._seedctr(self._counters['report']), carry, data)
      else:
        carry, mets = self._report(
            dict(self.store), self._seedctr(self._counters['report']),
            carry, data)
      return carry, self._fetch_local(mets)

  def stream(self, source):
    return streamlib.Prefetch(source, transform=self._device_batch, amount=2)

  def _start_fetch(self, tree):
    """Begin async device->host DMA for every addressable shard. This is
    the sanctioned output-fetch crossing, so the guard is lifted."""
    def start(x):
      if isinstance(x, jax.Array):
        if x.is_fully_addressable:
          x.copy_to_host_async()
        else:
          for shard in x.addressable_shards:
            shard.data.copy_to_host_async()
      return x
    with jax.transfer_guard('allow'):
      jax.tree.map(start, tree)

  def _fetch_local(self, tree):
    """device_get that works on multi-host arrays: values spanning
    non-addressable devices come back as this host's rows (batch-sharded)
    or the replicated copy (parity: reference to_local,
    /root/reference/embodied/jax/internal.py:160-213)."""
    def get(x):
      if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(jax.device_get(x))
      pieces = {}
      for shard in x.addressable_shards:
        first = shard.index[0] if shard.index else slice(None)
        key = (first.start or 0, first.stop)
        pieces[key] = shard.data
      if len(pieces) == 1:
        return np.asarray(next(iter(pieces.values())))
      return np.concatenate(
          [np.asarray(pieces[k]) for k in sorted(pieces)], 0)
    # Shard reads are device->host transfers; this is a sanctioned
    # crossing, so lift the transfer guard for its duration.
    with jax.transfer_guard('allow'):
      return jax.tree.map(get, tree)


  def _seedctr(self, value):
    """Counters ride to the device as explicit transfers so the implicit
    transfer guard stays armed for accidental crossings."""
    return jax.device_put(np.uint32(value))

  def _device_batch(self, data):
    out = {}
    with jax.transfer_guard('allow'):
      return self._device_batch_inner(data, out)

  def _device_batch_inner(self, data, out):
    for k, v in data.items():
      batch = np.asarray(v).shape[0] if np.ndim(v) else 0
      # Hosts feed their LOCAL rows; the global batch is batch * nprocs.
      # Batches that do not divide the data axes (e.g. small env counts in
      # the policy path) are replicated instead of sharded.
      gbatch = batch * self.nprocs
      sharding = (
          self.data_sharding if batch and gbatch % self.nbatch == 0
          else self.replicated)
      if self.nprocs > 1 and sharding is self.data_sharding:
        # Each host contributes its local rows of the global batch.
        out[k] = jax.make_array_from_process_local_data(
            sharding, np.asarray(v))
      else:
        out[k] = jax.device_put(v, sharding)
    return out

  def _maybe_profile(self, update):
    prof = self._profiler
    if not prof['enabled']:
      return
    # Remote logdirs cannot receive the trace directly: write to /tmp and
    # copy at stop (parity: reference jax/agent.py:296-311).
    outdir, copyto = prof['outdir'], None
    if str(outdir).startswith(('gs://', '/gcs/', '/cns/')):
      copyto, outdir = outdir, '/tmp/profiler'
    if update == prof['start'] and not prof['active']:
      print(f'Writing profiler trace to {outdir}')
      jax.profiler.start_trace(outdir)
      prof['active'] = True
    elif update >= prof['stop'] and prof['active']:
      jax.profiler.stop_trace()
      prof['active'] = False
      if copyto:
        import os as _os
        from ..utils import Path
        dst = Path(copyto)
        for dirpath, _, files in _os.walk(outdir):
          for fname in files:
            full = _os.path.join(dirpath, fname)
            rel = _os.path.relpath(full, outdir)
            target = dst
            for part in rel.split(_os.sep):
              target = target / part
            target.parent.mkdir()
            target.write_bytes(Path(full).read_bytes())
        print(f'Copied profiler trace {outdir} to {copyto}')

  # --- Checkpointing ------------------------------------------------------

  def save(self, chunk_bytes=1 << 30):
    """Gather the store to host memory in bounded groups so large models
    never need 2x HBM+RAM at once (parity: reference grouped ckpt fns,
    jax/internal.py:239-286)."""
    with timer.section('agent_save'), self._device_lock:
      result = {}
      group, group_bytes = [], 0
      keys = sorted(self.store.keys())
      for key in keys + [None]:
        size = self.store[key].nbytes if key is not None else 0
        if group and (key is None or group_bytes + size > chunk_bytes):
          arrays = {k: self.store[k] for k in group}
          if self.nprocs > 1:
            gather = jax.jit(
                lambda xs: xs,
                out_shardings={k: self.replicated for k in arrays})
            arrays = gather(arrays)
          host = self._fetch_local(arrays)
          result.update({k: np.asarray(v) for k, v in host.items()})
          group, group_bytes = [], 0
        if key is not None:
          group.append(key)
          group_bytes += size
      state = {
          'store': result,
          'counters': dict(self._counters),
      }
      if self._latents is not None:
        # Only the slot allocator persists; the table contents self-heal
        # (invalid generations reset the carry until the first revisit).
        state['latents'] = self._latents.save()
      return state

  def load(self, data, regex=None):
    store = data['store']
    if regex:
      pattern = re.compile(regex)
      store = {k: v for k, v in store.items() if pattern.search(k)}
    missing = set(self.store) - set(store)
    unexpected = set(store) - set(self.store)
    if not regex:
      assert not missing, f'Checkpoint missing entries: {sorted(missing)[:5]}'
    if unexpected:
      print(f'Ignoring {len(unexpected)} unexpected checkpoint entries')
    new = dict(self.store)
    for key, value in store.items():
      if key in new:
        new[key] = jax.device_put(value, self.shardings[key])
    self.store = new
    self._counters.update(data.get('counters', {}))
    if self._latents is not None:
      if 'latents' in data:
        self._latents.load(data['latents'])
      else:
        # Pre-table checkpoint: restored replay may hold (slot, gen) pairs
        # from the previous run. Start one generation up so stale pairs
        # can never falsely validate against freshly-minted ones.
        self._latents.bump_generations()
