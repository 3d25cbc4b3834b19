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
