import numpy as np
import pytest

from embodied_tpu.core import Replay, selectors


def make_step(value, is_first=False, is_last=False):
  return {
      'count': np.int32(value),
      'image': np.full((8, 8, 3), value % 255, np.uint8),
      'is_first': np.bool_(is_first),
      'is_last': np.bool_(is_last),
  }


class TestReplay:

  @pytest.mark.parametrize('chunksize', [4, 16, 64])
  def test_cross_chunk_sequences(self, chunksize):
    replay = Replay(length=8, capacity=1000, chunksize=chunksize)
    for i in range(100):
      replay.add(make_step(i, is_first=(i == 0)))
    batch = replay.sample(4)
    assert batch['count'].shape == (4, 8)
    for row in batch['count']:
      # Sequences must be consecutive even across chunk boundaries.
      assert (np.diff(row) == 1).all(), row

  def test_capacity_exact(self):
    replay = Replay(length=4, capacity=10, chunksize=8)
    for i in range(100):
      replay.add(make_step(i))
    assert len(replay) == 10

  def test_worker_interleaving(self):
    replay = Replay(length=4, capacity=100, chunksize=8)
    for i in range(20):
      replay.add(make_step(i), worker=0)
      replay.add(make_step(100 + i), worker=1)
    batch = replay.sample(8)
    for row in batch['count']:
      assert (np.diff(row) == 1).all(), row

  def test_update_patches_future_samples(self):
    replay = Replay(length=4, capacity=100, chunksize=8)
    for i in range(12):
      replay.add(make_step(i))
    batch = replay.sample(2)
    patch = {
        'stepid': batch['stepid'],
        'count': np.full_like(batch['count'], 777),
    }
    replay.update(patch)
    # Resample until we hit a patched sequence.
    seen = False
    for _ in range(100):
      again = replay.sample(4)
      if (again['count'] == 777).any():
        seen = True
        break
    assert seen

  def test_save_load_roundtrip(self, tmp_path):
    replay = Replay(length=4, capacity=100, chunksize=8,
                    directory=str(tmp_path), save_wait=True)
    for i in range(30):
      replay.add(make_step(i, is_first=(i == 0)))
    count = len(replay)
    replay.save()
    restored = Replay(length=4, capacity=100, chunksize=8,
                      directory=str(tmp_path))
    restored.load()
    assert len(restored) == count
    batch = restored.sample(4)
    for row in batch['count']:
      assert (np.diff(row) == 1).all(), row

  def test_online_mode(self):
    replay = Replay(length=4, capacity=100, chunksize=8, online=True)
    for i in range(8):
      replay.add(make_step(i))
    batch = replay.sample(1)
    # The first sampled item should be the fresh online sequence, which is
    # queued one step after the stream fills (same cadence as the reference).
    assert batch['count'][0, 0] == 1

  def test_is_first_annotation(self):
    replay = Replay(length=4, capacity=100, chunksize=8)
    for i in range(12):
      replay.add(make_step(i))
    batch = replay.sample(4)
    assert batch['is_first'][:, 0].all()


class TestSampleTree:

  def test_weighted_sampling(self):
    tree = selectors.SampleTree(branching=4, seed=0)
    tree.insert('a', 1.0)
    tree.insert('b', 3.0)
    counts = {'a': 0, 'b': 0}
    for key in tree.sample(4000):
      counts[key] += 1
    assert 0.65 < counts['b'] / 4000 < 0.85

  def test_insert_remove_grow(self):
    tree = selectors.SampleTree(branching=4, seed=0)
    for i in range(100):
      tree.insert(i, float(i + 1))
    assert len(tree) == 100
    assert abs(tree.total - sum(range(1, 101))) < 1e-6
    for i in range(0, 100, 2):
      tree.remove(i)
    assert len(tree) == 50
    keys = set(tree.sample(500))
    assert all(k % 2 == 1 for k in keys)

  def test_update(self):
    tree = selectors.SampleTree(branching=4, seed=0)
    tree.insert('a', 1.0)
    tree.insert('b', 1.0)
    tree.update('a', 0.0)
    assert set(tree.sample(100)) == {'b'}


class TestSelectors:

  def test_uniform(self):
    sel = selectors.Uniform(seed=0)
    for i in range(10):
      sel[i] = None
    del sel[3]
    assert len(sel) == 9
    samples = {sel() for _ in range(200)}
    assert 3 not in samples
    assert len(samples) == 9

  def test_prioritized(self):
    sel = selectors.Prioritized(exponent=1.0, initial=1.0)
    stepids = {i: np.frombuffer(
        bytes(16) + i.to_bytes(4, 'big'), np.uint8).reshape(1, 20)
        for i in range(4)}
    for i in range(4):
      sel[i] = stepids[i]
    sel.prioritize(stepids[2], [100.0])
    counts = np.zeros(4)
    for _ in range(500):
      counts[sel()] += 1
    assert counts[2] > 300

  def test_fifo(self):
    sel = selectors.Fifo()
    sel[0] = None
    sel[1] = None
    first = sel()
    assert first == 0
    assert sel() == 1
