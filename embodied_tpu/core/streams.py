"""Resumable data pipelines feeding the learner.

Capability parity: /root/reference/embodied/core/streams.py — Stateless,
Prefetch (background thread with backpressure and save/load of source
state), Consec (splits long sampled windows into consecutive training chunks
with optional replay-context prefix), Zip, Map, Mixer.
"""

import functools
import queue
import threading

import numpy as np

from ..utils import tree
from . import base


class Stateless(base.Stream):

  def __init__(self, nextfn, *args, **kwargs):
    if not callable(nextfn) and hasattr(nextfn, '__next__'):
      nextfn = nextfn.__next__
    self.nextfn = functools.partial(nextfn, *args, **kwargs)

  def __iter__(self):
    return self

  def __next__(self):
    return self.nextfn()

  def save(self):
    return None

  def load(self, data):
    pass


class Prefetch(base.Stream):
  """Prefetches batches on a daemon thread with semaphore backpressure."""

  def __init__(self, source, transform=None, amount=1):
    self.source = iter(source) if hasattr(source, '__iter__') else source()
    self.transform = transform or (lambda x: x)
    self.state = self._getstate()
    self.requests = threading.Semaphore(amount)
    self.amount = amount
    self.queue = queue.Queue()
    self.thread = threading.Thread(
        target=self._worker, daemon=True, name='prefetch')
    self.started = False

  def __iter__(self):
    if not self.started:
      self.thread.start()
      self.started = True
    return self

  def __next__(self):
    assert self.started, 'Call iter() before next()'
    result = self.queue.get()
    self.requests.release()
    if isinstance(result, BaseException):
      raise RuntimeError(str(result)) from result
    data, self.state = result
    return data

  def save(self):
    return self.state

  def load(self, state):
    if self.started:
      for _ in range(self.amount):
        self.queue.get()
    if hasattr(self.source, 'load'):
      self.source.load(state)
    if self.started:
      self.requests.release(self.amount)

  def _worker(self):
    try:
      while True:
        self.requests.acquire()
        data = next(self.source)
        data = self.transform(data)
        state = self._getstate()
        self.queue.put((data, state))
    except BaseException as e:
      self.queue.put(e)

  def _getstate(self):
    return self.source.save() if hasattr(self.source, 'save') else None


class Consec(base.Stream):
  """Splits sampled super-sequences into consecutive training chunks.

  With length=3, consec=3, prefix=2 a source sequence of 11 steps yields
  three chunks of 5 steps each, where the first `prefix` steps overlap the
  previous chunk (replay context). Emits a 'consec' key marking the chunk
  index within the super-sequence, which the agent uses to decide whether to
  resume from stored latents.
  """

  def __init__(
      self, source, length, consec, prefix=0, strict=True, contiguous=False):
    self.source = source
    self.length = length
    self.consec = consec
    self.prefix = prefix
    self.strict = strict
    self.contiguous = contiguous
    self.index = 0
    self.current = None
    self.it = None

  def __iter__(self):
    self.it = iter(self.source)
    return self

  def __next__(self):
    if self.index >= self.consec:
      self.index = 0
    if self.index == 0:
      self.current = next(self.it)
      available = self.current['is_first'].shape[-1]
      need = self.length * self.consec + self.prefix
      assert need <= available, (self.length, self.consec, self.prefix,
                                 available)
      if self.strict:
        assert need == available, (self.consec, self.length, self.prefix,
                                   available)
    start = self.index * self.length
    stop = start + self.length + self.prefix
    chunk = {k: v[:, start: stop] for k, v in self.current.items()}
    chunk['consec'] = np.full(chunk['is_first'].shape, self.index, np.int32)
    if self.contiguous:
      chunk = {k: np.ascontiguousarray(v) for k, v in chunk.items()}
    self.index += 1
    return chunk

  def save(self):
    return {
        'source': self.source.save() if hasattr(self.source, 'save')
        else None,
        'index': self.index,
    }

  def load(self, data):
    if hasattr(self.source, 'load'):
      self.source.load(data['source'])
    self.index = data['index']


class Zip(base.Stream):
  """Concatenates batches from several sources along the batch dim."""

  def __init__(self, sources):
    assert len(sources) > 1, len(sources)
    self.sources = sources
    self.iterators = None

  def __iter__(self):
    self.iterators = [iter(x) for x in self.sources]
    return self

  def __next__(self):
    parts = [next(x) for x in self.iterators]
    return tree.tree_map(lambda *xs: np.concatenate(xs), *parts)

  def save(self):
    return [x.save() for x in self.iterators]

  def load(self, data):
    assert len(data) == len(self.iterators)
    [it.load(d) for it, d in zip(self.iterators, data)]


class Map(base.Stream):

  def __init__(self, source, fn, *args, **kwargs):
    self.source = source
    self.fn = lambda x: fn(x, *args, **kwargs)
    self.iterator = None

  def __iter__(self):
    self.iterator = iter(self.source)
    return self

  def __next__(self):
    return self.fn(next(self.iterator))

  def save(self):
    return self.iterator.save()

  def load(self, data):
    self.iterator.load(data)


class Mixer(base.Stream):
  """Draws each batch from one source, chosen by normalized weights."""

  def __init__(self, sources, weights, seed=0):
    assert sources.keys() == weights.keys(), (sources, weights)
    self.keys = sorted(sources.keys())
    self.iterators = {k: iter(sources[k]) for k in self.keys}
    probs = np.array([weights[k] for k in self.keys], np.float64)
    self.probs = probs / probs.sum()
    self.seed = seed
    self.step = 0

  def __iter__(self):
    return self

  def __next__(self):
    rng = np.random.default_rng(seed=[self.seed, self.step])
    self.step += 1
    index = rng.choice(len(self.keys), p=self.probs)
    return next(self.iterators[self.keys[index]])

  def save(self):
    return {
        'step': self.step,
        'seed': self.seed,
        'sources': {k: it.save() for k, it in self.iterators.items()},
    }

  def load(self, data):
    self.step = data['step']
    self.seed = data['seed']
    for key in self.keys:
      self.iterators[key].load(data['sources'][key])
