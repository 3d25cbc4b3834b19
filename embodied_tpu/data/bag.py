"""Sharded on-disk datasets of dict-of-array records.

Capability parity: the `granular` satellite library referenced by the
reference's requirements (offline/pretrain data handling; the reference's
run/pretrain.py consumes streams directly). Records are dicts of numpy
arrays appended to shard files; each shard is a compressed npz holding
columns plus a row-count, with a directory-level index reconstructed from
filenames. Readers are resumable Streams (save/load of cursor state).
"""

import io

import numpy as np

from ..core import base
from ..utils import Path, UUID, timestamp


class BagWriter:
  """Appends records and writes shards of `shard_size` rows."""

  def __init__(self, directory, shard_size=1024):
    self.directory = Path(directory)
    self.directory.mkdir()
    self.shard_size = shard_size
    self.buffer = []

  def append(self, record):
    record = {k: np.asarray(v) for k, v in record.items()}
    self.buffer.append(record)
    if len(self.buffer) >= self.shard_size:
      self.flush()

  def flush(self):
    if not self.buffer:
      return
    columns = {
        k: np.stack([r[k] for r in self.buffer])
        for k in self.buffer[0].keys()}
    name = f'{timestamp(millis=True)}-{UUID()}-{len(self.buffer)}.npz'
    buffer = io.BytesIO()
    np.savez_compressed(buffer, **columns)
    (self.directory / name).write_bytes(buffer.getvalue())
    self.buffer = []

  def close(self):
    self.flush()


class BagReader(base.Stream):
  """Streams batches of consecutive records; resumable and shardable.

  `shard_id`/`num_shards` partition the files across replicas for
  multi-host offline training.
  """

  def __init__(self, directory, batch, length=1, shard_id=0, num_shards=1,
               repeat=True, seed=0):
    self.directory = Path(directory)
    self.batch = batch
    self.length = length
    self.files = sorted(
        str(f) for f in self.directory.glob('*.npz'))[shard_id::num_shards]
    assert self.files, f'No shards found in {directory}'
    self.repeat = repeat
    self.rng = np.random.default_rng(seed)
    self.file_index = 0
    self.row_index = 0
    self.columns = None
    self.rows = 0

  def _load(self):
    filename = self.files[self.file_index]
    with io.BytesIO(Path(filename).read_bytes()) as f:
      self.columns = dict(np.load(f))
    self.rows = len(next(iter(self.columns.values())))
    self.row_index = 0

  def __next__(self):
    outs = []
    while len(outs) < self.batch:
      if self.columns is None:
        self._load()
      if self.row_index + self.length > self.rows:
        self.columns = None
        self.file_index += 1
        if self.file_index >= len(self.files):
          if not self.repeat:
            raise StopIteration
          self.file_index = 0
        continue
      start = self.row_index
      outs.append({
          k: v[start:start + self.length]
          for k, v in self.columns.items()})
      self.row_index += self.length
    return {
        k: np.stack([o[k] for o in outs]) for k in outs[0].keys()}

  def save(self):
    return {'file_index': self.file_index, 'row_index': self.row_index}

  def load(self, state):
    self.file_index = state['file_index'] % len(self.files)
    self.row_index = state['row_index']
    self.columns = None
    # Re-seek within the file on next read; row bound re-checked there.
    self._load()
    self.row_index = min(state['row_index'], self.rows)
