import numpy as np
import pytest

from embodied_tpu.utils import (
    Agg, Config, Counter, Flags, Space, UUID, timer, tree, when)


class TestSpace:

  def test_discrete(self):
    space = Space(np.int32, (), 0, 5)
    assert space.discrete
    assert space.classes == 5
    for _ in range(10):
      assert space.contains(space.sample())

  def test_continuous(self):
    space = Space(np.float32, (6,), -1, 1)
    assert not space.discrete
    sample = space.sample()
    assert sample.shape == (6,)
    assert space.contains(sample)
    assert not space.contains(np.full((6,), 2.0, np.float32))

  def test_int_shorthand_shape(self):
    assert Space(np.float32, 7).shape == (7,)

  def test_bool(self):
    space = Space(bool)
    assert space.discrete
    assert space.contains(space.sample())


class TestConfig:

  def test_nested_access(self):
    config = Config({'a': {'b': {'c': 1}}, 'd': 2.5})
    assert config.a.b.c == 1
    assert config['a.b.c'] == 1
    assert config['a']['b']['c'] == 1
    assert config.d == 2.5

  def test_immutable(self):
    config = Config({'a': 1})
    with pytest.raises(TypeError):
      config['a'] = 2

  def test_update_type_checking(self):
    config = Config({'a': 1, 'b': 2.0, 'c': 'x', 'd': True, 'e': (1, 2)})
    config = config.update({'a': '3', 'b': '4.5', 'd': 'False', 'e': '5,6,7'})
    assert config.a == 3 and isinstance(config.a, int)
    assert config.b == 4.5
    assert config.d is False
    assert config.e == (5, 6, 7)

  def test_update_regex(self):
    config = Config({'x': {'units': 1}, 'y': {'units': 2}, 'z': 3})
    config = config.update({r'.*\.units': 64})
    assert config.x.units == 64
    assert config.y.units == 64
    assert config.z == 3

  def test_update_missing_raises(self):
    with pytest.raises(KeyError):
      Config({'a': 1}).update({'missing': 2})

  def test_flags(self):
    config = Config({'a': 1, 'b': {'c': 2.0}, 'd': False})
    parsed, remaining = Flags(config).parse_known(
        ['extra', '--a', '5', '--b.c=3.5', '--d'])
    assert parsed.a == 5
    assert parsed.b.c == 3.5
    assert parsed.d is True
    assert remaining == ['extra']


class TestTree:

  def test_flat_nest_roundtrip(self):
    nested = {'a': {'b': 1, 'c': {'d': 2}}, 'e': 3}
    flat = tree.flatdict(nested)
    assert flat == {'a/b': 1, 'a/c/d': 2, 'e': 3}
    assert tree.nestdict(flat) == nested

  def test_map(self):
    out = tree.tree_map(
        lambda x, y: x + y, {'a': 1, 'b': (2, 3)}, {'a': 10, 'b': (20, 30)})
    assert out == {'a': 11, 'b': (22, 33)}


class TestAgg:

  def test_modes(self):
    agg = Agg()
    agg.add('x', 1.0)
    agg.add('x', 3.0)
    agg.add('y', 1.0, agg='sum')
    agg.add('y', 2.0, agg='sum')
    agg.add('z', 5.0, agg=('avg', 'max', 'sum'))
    agg.add('z', 1.0, agg=('avg', 'max', 'sum'))
    result = agg.result()
    assert result['x'] == 2.0
    assert result['y'] == 3.0
    assert result['z/avg'] == 3.0
    assert result['z/max'] == 5.0
    assert result['z/sum'] == 6.0
    assert agg.result() == {}

  def test_stack(self):
    agg = Agg()
    agg.add('r', np.float32(1), agg='stack')
    agg.add('r', np.float32(2), agg='stack')
    assert agg.result()['r'].tolist() == [1, 2]


class TestCounter:

  def test_basics(self):
    counter = Counter()
    counter.increment()
    counter.increment(5)
    assert int(counter) == 6
    assert counter < 10
    assert counter >= 6
    counter.load(counter.save())
    assert int(counter) == 6


class TestUUID:

  def test_roundtrip(self):
    uuid = UUID()
    assert UUID(str(uuid)) == uuid
    assert UUID(bytes(uuid)) == uuid
    assert len(str(uuid)) == 22
    assert len(bytes(uuid)) == 16

  def test_zero(self):
    zero = UUID(bytes(16))
    assert UUID(str(zero)) == zero


class TestWhen:

  def test_ratio(self):
    ratio = when.Ratio(2.0)
    assert ratio(0) == 1
    assert ratio(10) == 20
    assert ratio(10) == 0
    assert ratio(11) == 2

  def test_every(self):
    every = when.Every(10)
    assert every(0) is True
    assert every(5) is False
    assert every(10) is True
    assert every(11) is False


class TestTimer:

  def test_section(self):
    timer.stats()  # Reset.
    with timer.section('mywork'):
      sum(range(1000))
    stats = timer.stats()
    assert 'mywork/frac' in stats
    assert stats['mywork/total'] > 0
