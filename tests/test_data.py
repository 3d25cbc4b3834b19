import numpy as np

from embodied_tpu.data import BagReader, BagWriter


class TestBag:

  def test_write_read_roundtrip(self, tmp_path):
    writer = BagWriter(str(tmp_path), shard_size=8)
    for i in range(30):
      writer.append({'x': np.full((4,), i, np.float32), 'i': np.int32(i)})
    writer.close()
    reader = BagReader(str(tmp_path), batch=2, length=3)
    batch = next(reader)
    assert batch['x'].shape == (2, 3, 4)
    assert batch['i'].shape == (2, 3)
    # Consecutive within each row.
    assert (np.diff(batch['i'], axis=1) == 1).all()

  def test_resume(self, tmp_path):
    writer = BagWriter(str(tmp_path), shard_size=8)
    for i in range(16):
      writer.append({'i': np.int32(i)})
    writer.close()
    reader = BagReader(str(tmp_path), batch=1, length=1)
    first = [int(next(reader)['i'][0, 0]) for _ in range(5)]
    state = reader.save()
    next(reader)
    reader.load(state)
    resumed = int(next(reader)['i'][0, 0])
    fresh = BagReader(str(tmp_path), batch=1, length=1)
    fresh.load(state)
    assert int(next(fresh)['i'][0, 0]) == resumed

  def test_sharding(self, tmp_path):
    writer = BagWriter(str(tmp_path), shard_size=4)
    for i in range(16):
      writer.append({'i': np.int32(i)})
    writer.close()
    r0 = BagReader(str(tmp_path), batch=1, length=1, shard_id=0, num_shards=2)
    r1 = BagReader(str(tmp_path), batch=1, length=1, shard_id=1, num_shards=2)
    assert len(r0.files) + len(r1.files) == 4
    assert not set(r0.files) & set(r1.files)


class TestBagRandomAccess:

  def _write(self, tmp_path, n=25, shard=7):
    from embodied_tpu.data import BagWriter
    writer = BagWriter(tmp_path / 'bag', shard_size=shard)
    for i in range(n):
      writer.append({'x': np.full((3,), i, np.int64), 'y': np.float32(i)})
    writer.close()
    return tmp_path / 'bag'

  def test_len_and_getitem_across_shards(self, tmp_path):
    from embodied_tpu.data import Bag
    d = self._write(tmp_path)
    bag = Bag(d)
    assert len(bag) == 25
    for i in (0, 6, 7, 13, 24, -1):
      rec = bag[i]
      want = i % 25
      assert rec['x'].tolist() == [want] * 3, (i, rec)
      assert float(rec['y']) == want
    assert bag.spaces['x'] == ((3,), np.dtype(np.int64))

  def test_range_spans_shard_boundary(self, tmp_path):
    from embodied_tpu.data import Bag
    d = self._write(tmp_path)
    bag = Bag(d)
    cols = bag.range(5, 16)  # crosses the 7 and 14 boundaries
    assert cols['x'].shape == (11, 3)
    assert cols['x'][:, 0].tolist() == list(range(5, 16))
    sl = bag[5:16]
    assert sl['x'][:, 0].tolist() == list(range(5, 16))

  def test_sampler_deterministic_and_resumable(self, tmp_path):
    from embodied_tpu.data import BagSampler
    d = self._write(tmp_path)
    a = BagSampler(d, batch=4, length=5, seed=3)
    b = BagSampler(d, batch=4, length=5, seed=3)
    for _ in range(3):
      np.testing.assert_array_equal(next(a)['x'], next(b)['x'])
    state = a.save()
    after = [next(a)['x'] for _ in range(2)]
    c = BagSampler(d, batch=4, length=5, seed=999)
    c.load(state)
    for want in after:
      np.testing.assert_array_equal(next(c)['x'], want)

  def test_windows_are_consecutive_records(self, tmp_path):
    from embodied_tpu.data import BagSampler
    d = self._write(tmp_path)
    sampler = BagSampler(d, batch=8, length=4, seed=0)
    batch = next(sampler)
    firsts = batch['x'][:, 0, 0]
    for row, first in enumerate(firsts):
      assert batch['x'][row, :, 0].tolist() == list(
          range(int(first), int(first) + 4))
