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


class TestReplayPersistence:

  def test_partial_shard_superseded(self, tmp_path):
    # Saving twice while a segment is still filling must leave exactly one
    # shard for that segment (the longer one supersedes the partial).
    replay = Replay(length=4, capacity=100, chunksize=16,
                    directory=str(tmp_path), save_wait=True)
    for i in range(6):
      replay.add(make_step(i))
    replay.save()
    for i in range(6, 12):
      replay.add(make_step(i))
    replay.save()
    shards = list(tmp_path.glob('*.npz'))
    assert len(shards) == 1, shards
    restored = Replay(length=4, capacity=100, chunksize=16,
                      directory=str(tmp_path))
    restored.load()
    assert len(restored) == len(replay)

  def test_corrupt_shard_splits_run(self, tmp_path):
    replay = Replay(length=4, capacity=100, chunksize=8,
                    directory=str(tmp_path), save_wait=True)
    for i in range(24):  # Three full segments.
      replay.add(make_step(i))
    replay.save()
    shards = sorted(tmp_path.glob('*.npz'), key=lambda p: p.name)
    assert len(shards) == 3
    # Corrupt the middle segment; windows must never bridge the gap.
    middle = [p for p in shards if p.name.split('-')[2] == '8'][0]
    middle.write_bytes(b'not an npz')
    restored = Replay(length=4, capacity=100, chunksize=8,
                      directory=str(tmp_path))
    restored.load()
    assert 0 < len(restored) < len(replay)
    for _ in range(20):
      batch = restored.sample(4)
      for row in batch['count']:
        assert (np.diff(row) == 1).all(), row
        # No sequence may span the missing segment [8, 16).
        assert not (row[0] < 8 and row[-1] >= 16)

  def test_load_amount_prefers_newest(self, tmp_path):
    replay = Replay(length=2, capacity=1000, chunksize=4,
                    directory=str(tmp_path), save_wait=True)
    for i in range(40):
      replay.add(make_step(i))
    replay.save()
    restored = Replay(length=2, capacity=1000, chunksize=4,
                      directory=str(tmp_path))
    restored.load(amount=5)
    batch = restored.sample(16)
    # Only the newest shards should have been rehydrated.
    assert batch['count'].min() >= 20


class TestReplayEviction:

  def test_segments_are_freed(self):
    replay = Replay(length=4, capacity=8, chunksize=8)
    for i in range(200):
      replay.add(make_step(i))
    stats = replay.stats()
    assert stats['items'] == 8
    # The frontier frees everything more than ~2 segments back.
    assert stats['segments'] <= 3
    batch = replay.sample(8)
    assert batch['count'].min() >= 200 - 8 - 4

  def test_update_after_eviction_is_noop(self):
    replay = Replay(length=4, capacity=8, chunksize=8)
    for i in range(12):
      replay.add(make_step(i))
    batch = replay.sample(2)
    for i in range(100, 150):
      replay.add(make_step(i))  # Evicts the sampled windows.
    replay.update({
        'stepid': batch['stepid'],
        'count': np.full_like(batch['count'], 999)})
    again = replay.sample(8)
    assert not (again['count'] == 999).any()


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


class TestReplayConcurrency:

  def test_sample_during_constant_eviction(self):
    # At capacity every add evicts; inserts/evictions run under the read
    # lock so they interleave freely with sampling. The sample path must
    # stay valid via its segment snapshots: windows are consecutive and
    # ahead of the eviction frontier, never torn or crashing.
    import threading
    replay = Replay(length=8, capacity=64, chunksize=16)
    for i in range(200):
      replay.add(make_step(i))
    stop = threading.Event()
    errors = []

    def writer():
      i = 200
      while not stop.is_set():
        replay.add(make_step(i))
        i += 1

    def reader():
      try:
        for _ in range(300):
          batch = replay.sample(4)
          for row in batch['count']:
            assert (np.diff(row) == 1).all(), row
      except Exception as e:  # pragma: no cover - failure reporting
        errors.append(e)
      finally:
        stop.set()

    threads = [threading.Thread(target=writer),
               threading.Thread(target=reader)]
    [t.start() for t in threads]
    [t.join(timeout=60) for t in threads]
    stop.set()
    assert not errors, errors[0]
