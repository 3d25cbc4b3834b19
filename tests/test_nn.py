import jax
import jax.numpy as jnp
import numpy as np

from embodied_tpu import nn
from embodied_tpu.nn import dists
from embodied_tpu.utils import Space


class TestModuleSystem:

  def test_init_apply_linear(self):
    layer = nn.Linear(8, 'lin')
    def fn(ctx, x):
      return layer(ctx, x)
    x = jnp.ones((2, 4))
    store, meta = nn.init(fn)(jax.random.PRNGKey(0), x)
    assert 'lin/kernel' in store and 'lin/bias' in store
    assert store['lin/kernel'].shape == (4, 8)
    assert meta['lin/kernel'] == 'param'
    updates, y = nn.pure(fn)(store, jax.random.PRNGKey(1), x)
    assert y.shape == (2, 8)
    assert not updates

  def test_missing_param_raises(self):
    layer = nn.Linear(8, 'lin')
    try:
      nn.pure(lambda ctx, x: layer(ctx, x))({}, jax.random.PRNGKey(0),
                                            jnp.ones((2, 4)))
      assert False, 'expected KeyError'
    except KeyError:
      pass

  def test_deterministic_init(self):
    layer = nn.Linear(8, 'lin')
    fn = lambda ctx, x: layer(ctx, x)
    s1, _ = nn.init(fn)(jax.random.PRNGKey(0), jnp.ones((2, 4)))
    s2, _ = nn.init(fn)(jax.random.PRNGKey(0), jnp.ones((2, 4)))
    assert np.allclose(s1['lin/kernel'], s2['lin/kernel'])

  def test_scan_creates_params_and_runs(self):
    cell = nn.GRU(16, 'gru')
    def fn(ctx, carry, inputs, resets):
      return cell(ctx, carry, inputs, resets)
    B, T = 3, 5
    carry = cell.initial(B)
    inputs = jnp.ones((B, T, 4))
    resets = jnp.zeros((B, T), bool)
    store, _ = nn.init(fn)(jax.random.PRNGKey(0), carry, inputs, resets)
    updates, (out_carry, feats) = nn.pure(fn)(
        store, jax.random.PRNGKey(0), carry, inputs, resets)
    assert feats.shape == (B, T, 16)
    assert out_carry.shape == (B, 16)
    # Resets zero the carry: with all resets, output indep of carry.
    resets_all = jnp.ones((B, T), bool)
    _, (c1, f1) = nn.pure(fn)(
        store, jax.random.PRNGKey(0), carry + 5.0, inputs, resets_all)
    _, (c2, f2) = nn.pure(fn)(
        store, jax.random.PRNGKey(0), carry, inputs, resets_all)
    assert np.allclose(nn.f32(f1), nn.f32(f2))


class TestOptimizer:

  def test_regression_converges(self):
    mlp = nn.MLP(2, 32, 'mlp')
    head = nn.Linear(1, 'out')
    opt = nn.Optimizer(['mlp', 'out'], lr=1e-2, warmup=10)

    def lossfn(ctx, x, y):
      pred = head(ctx, mlp(ctx, x))
      return jnp.square(nn.f32(pred) - y).mean()

    def trainfn(ctx, x, y):
      return opt(ctx, lossfn, x, y)

    x = jnp.linspace(-1, 1, 64)[:, None]
    y = jnp.sin(3 * x)
    store, meta = nn.init(trainfn)(jax.random.PRNGKey(0), x, y)
    assert any(k.startswith('opt/rms') for k in store)
    assert meta['opt/step'] == 'state'

    step = jax.jit(nn.pure(trainfn, meta))
    losses = []
    for i in range(200):
      updates, mets = step(store, jax.random.PRNGKey(i), x, y)
      store = {**store, **updates}
      losses.append(float(mets['opt/loss']))
    assert losses[-1] < 0.1 * losses[0], (losses[0], losses[-1])
    assert float(store['opt/step']) == 200

  def test_grad_isolation_by_scope(self):
    l1 = nn.Linear(4, 'inside')
    l2 = nn.Linear(4, 'outside')
    opt = nn.Optimizer(['inside'], lr=0.1, warmup=0)

    def lossfn(ctx, x):
      return nn.f32(l1(ctx, x) + l2(ctx, x)).sum()

    def trainfn(ctx, x):
      return opt(ctx, lossfn, x)

    x = jnp.ones((2, 3))
    store, meta = nn.init(trainfn)(jax.random.PRNGKey(0), x)
    before_out = np.array(store['outside/kernel'])
    before_in = np.array(store['inside/kernel'])
    updates, _ = nn.pure(trainfn, meta)(store, jax.random.PRNGKey(1), x)
    store = {**store, **updates}
    assert not np.allclose(store['inside/kernel'], before_in)
    assert np.allclose(store['outside/kernel'], before_out)


class TestTrainUtils:

  def test_normalize_meanstd(self):
    norm = nn.Normalize('meanstd', 'n', rate=0.5)
    def fn(ctx, x):
      return norm(ctx, x, update=True)
    x = 10 + 2 * jax.random.normal(jax.random.PRNGKey(0), (1000,))
    store, _ = nn.init(fn)(jax.random.PRNGKey(0), x)
    for _ in range(20):
      updates, (mean, std) = nn.pure(fn)(store, jax.random.PRNGKey(0), x)
      store = {**store, **updates}
    assert abs(float(mean) - 10) < 1.0
    assert abs(float(std) - 2) < 1.0

  def test_slow_model_copies_and_tracks(self):
    fast = nn.Linear(4, 'fast')
    slow = nn.SlowModel(nn.Linear(4, "slow"), source=fast, rate=0.4)

    def fn(ctx, x):
      a = fast(ctx, x)
      b = slow(ctx, x)
      return a, b

    x = jnp.ones((2, 3))
    store, meta = nn.init(fn)(jax.random.PRNGKey(0), x)
    assert np.allclose(store['fast/kernel'], store['slow/kernel'])
    assert meta['slow/kernel'] == 'state'
    # Perturb fast; update pulls slow towards it.
    store['fast/kernel'] = store['fast/kernel'] + 1.0
    def upd(ctx):
      slow.update(ctx)
    ustore, _ = nn.init(upd)(jax.random.PRNGKey(0))
    store = {**ustore, **store}
    updates, _ = nn.pure(upd)(store, jax.random.PRNGKey(0))
    store = {**store, **updates}
    diff = np.abs(store['fast/kernel'] - store['slow/kernel']).mean()
    assert 0.55 < diff < 0.65, diff


class TestDists:

  def test_twohot_zero_at_uniform(self):
    bins = dists.symexp_bins(255)
    logits = jnp.zeros((4, 255))
    out = dists.TwoHot(logits, bins)
    assert np.allclose(out.pred(), 0.0), out.pred()

  def test_twohot_loss_recovers_target(self):
    bins = dists.symexp_bins(7)
    logits = jnp.array(np.random.randn(16, 7), jnp.float32)
    target = jnp.full((16,), 1.5, jnp.float32)
    loss = dists.TwoHot(logits, bins).loss(target)
    assert loss.shape == (16,)
    assert np.isfinite(np.asarray(loss)).all()

  def test_twohot_out_of_range_collapses_to_boundary_bin(self):
    # Targets past either end must put ALL mass on the boundary bin, not
    # split it between the top two (reference outs.py TwoHot semantics).
    bins = np.linspace(-1.0, 1.0, 5).astype(np.float32)
    logits = jnp.zeros((2, 5))
    enc = dists.TwoHot(logits, bins)._encode(jnp.array([10.0, -10.0]))
    enc = np.asarray(enc)
    assert np.allclose(enc[0], [0, 0, 0, 0, 1]), enc[0]
    assert np.allclose(enc[1], [1, 0, 0, 0, 0]), enc[1]
    # In-range targets still interpolate between the bracketing bins.
    enc = np.asarray(
        dists.TwoHot(logits, bins)._encode(jnp.array([0.25, 0.5])))
    assert np.allclose(enc[0], [0, 0, 0.5, 0.5, 0]), enc[0]
    assert np.allclose(enc[1], [0, 0, 0, 1, 0]), enc[1]

  def test_categorical_logp_entropy(self):
    logits = jnp.array([[0.0, 0.0, 0.0, 0.0]])
    dist = dists.Categorical(logits)
    assert np.allclose(dist.entropy(), np.log(4))
    assert np.allclose(dist.logp(jnp.array([2])), np.log(0.25))

  def test_onehot_straight_through_grads(self):
    def fn(logits):
      out = dists.OneHot(logits, unimix=0.01)
      sample = out.sample(jax.random.PRNGKey(0))
      return (sample * jnp.arange(4.0)).sum()
    grads = jax.grad(fn)(jnp.zeros((2, 4)))
    assert not np.allclose(grads, 0.0)

  def test_normal_kl_zero_same(self):
    d = dists.Normal(jnp.zeros(3), jnp.ones(3))
    assert np.allclose(d.kl(dists.Normal(jnp.zeros(3), jnp.ones(3))), 0.0)

  def test_agg_sums_event_dims(self):
    mse = dists.Agg(dists.MSE(jnp.zeros((2, 3, 4))), 2, jnp.sum)
    loss = mse.loss(jnp.ones((2, 3, 4)))
    assert loss.shape == (2,)
    assert np.allclose(loss, 12.0)


class TestHeads:

  def test_mlp_head_scalar_twohot(self):
    space = Space(np.float32, ())
    head = nn.MLPHead(space, 'symexp_twohot', 'rew', layers=1, units=16,
                      bins=15)
    def fn(ctx, x):
      return head(ctx, x, bdims=2).pred()
    x = jnp.ones((2, 5, 8))
    store, _ = nn.init(fn)(jax.random.PRNGKey(0), x)
    _, pred = nn.pure(fn)(store, jax.random.PRNGKey(0), x)
    assert pred.shape == (2, 5)

  def test_dict_head_policy(self):
    act_space = {
        'move': Space(np.int32, (), 0, 5),
        'look': Space(np.float32, (3,), -1, 1),
    }
    outs = {'move': 'categorical', 'look': 'bounded_normal'}
    head = nn.MLPHead(act_space, outs, 'pol', layers=1, units=16,
                      minstd=0.1, maxstd=1.0)
    def fn(ctx, x, key):
      policy = head(ctx, x, bdims=1)
      return {k: v.sample(key) for k, v in policy.items()}
    x = jnp.ones((4, 8))
    key = jax.random.PRNGKey(0)
    store, _ = nn.init(fn)(key, x, key)
    _, act = nn.pure(fn)(store, key, x, key)
    assert act['move'].shape == (4,)
    assert act['look'].shape == (4, 3)


class TestStackedLayers:

  def test_stack_runs_and_differs_per_layer(self):
    class Block(nn.Module):
      def __init__(self, name):
        super().__init__(name)
        self.lin = nn.Linear(8, 'lin')
        self.norm = nn.Norm('rms', 'norm')
      def __call__(self, ctx, x):
        p = self.sub(ctx)
        return x + self.norm(p, self.lin(p, x))

    stack = nn.StackedLayers(Block('block'), 4, 'stack')
    fn = lambda ctx, x: stack(ctx, x)
    x = jnp.ones((2, 8))
    store, meta = nn.init(fn)(jax.random.PRNGKey(0), x)
    kernels = store['stack/block/lin/kernel']
    assert kernels.shape == (4, 8, 8)
    # Per-layer weights differ (independent init keys).
    assert not np.allclose(kernels[0], kernels[1])
    _, y = nn.pure(fn, meta)(store, jax.random.PRNGKey(0), x)
    assert y.shape == (2, 8)
    assert np.isfinite(nn.f32(y)).all()

  def test_stack_gradients_flow(self):
    class Block(nn.Module):
      def __init__(self, name):
        super().__init__(name)
        self.lin = nn.Linear(8, 'lin')
      def __call__(self, ctx, x):
        p = self.sub(ctx)
        return x + jnp.tanh(nn.f32(self.lin(p, x))).astype(x.dtype)

    stack = nn.StackedLayers(Block('block'), 3, 'stack')
    opt = nn.Optimizer(['stack'], lr=0.05, warmup=0)

    def trainfn(ctx, x, y):
      lossfn = lambda c, x, y: jnp.square(
          nn.f32(stack(c, x)) - y).mean()
      return opt(ctx, lossfn, x, y)

    x = jnp.ones((4, 8))
    y = jnp.zeros((4, 8))
    store, meta = nn.init(trainfn)(jax.random.PRNGKey(0), x, y)
    step = jax.jit(nn.pure(trainfn, meta))
    losses = []
    for i in range(40):
      updates, mets = step(store, jax.random.PRNGKey(i), x, y)
      store = {**store, **updates}
      losses.append(float(mets['opt/loss']))
    assert losses[-1] < losses[0], (losses[0], losses[-1])
