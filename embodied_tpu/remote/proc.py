"""Supervised processes and threads.

Capability parity: portal.Process/Thread/run/setup as used by
/root/reference/embodied/run/parallel.py:40-59 and core/driver.py:21-23 —
workers that propagate failures, a supervision loop that tears everything
down when one worker dies, and crash files for external supervisors.
"""

import multiprocessing as mp
import sys
import threading
import time
import traceback

_SETTINGS = {'errfile': None}


def setup(errfile=None, **kwargs):
  _SETTINGS['errfile'] = str(errfile) if errfile else None


def _record_error(name, exc):
  message = f'Worker {name} crashed:\n{traceback.format_exc()}'
  print(message, file=sys.stderr, flush=True)
  errfile = _SETTINGS['errfile']
  if errfile:
    try:
      with open(errfile, 'w') as f:
        f.write(message)
    except OSError:
      pass


class Thread:
  """Daemon thread that records exceptions for the supervisor."""

  def __init__(self, fn, *args, name=None, start=False):
    self.fn = fn
    self.name = name or getattr(fn, '__name__', 'thread')
    self.exception = None
    self.thread = threading.Thread(
        target=self._run, args=args, daemon=True, name=self.name)
    if start:
      self.start()

  def _run(self, *args):
    try:
      self.fn(*args)
    except SystemExit:
      pass
    except BaseException as e:  # noqa: B036
      self.exception = e
      _record_error(self.name, e)

  def start(self):
    self.thread.start()
    return self

  @property
  def running(self):
    return self.thread.is_alive()

  def check(self):
    if self.exception is not None:
      raise RuntimeError(
          f'Worker {self.name} failed: {self.exception!r}')

  def kill(self):
    pass  # Daemon threads die with the process.

  def join(self, timeout=None):
    self.thread.join(timeout)


def _proc_main(payload, args):
  import cloudpickle
  fn = cloudpickle.loads(payload)
  fn(*args)


class Process:
  """Supervised subprocess; the target is shipped via cloudpickle."""

  def __init__(self, fn, *args, name=None, start=False):
    import cloudpickle
    self.name = name or getattr(fn, '__name__', 'process')
    context = mp.get_context('spawn')
    self.proc = context.Process(
        target=_proc_main, args=(cloudpickle.dumps(fn), args),
        name=self.name, daemon=True)
    if start:
      self.start()

  def start(self):
    self.proc.start()
    return self

  @property
  def running(self):
    return self.proc.is_alive()

  @property
  def pid(self):
    return self.proc.pid

  def check(self):
    if self.proc.exitcode not in (None, 0):
      raise RuntimeError(
          f'Worker {self.name} exited with code {self.proc.exitcode}')

  def kill(self):
    if self.proc.is_alive():
      self.proc.terminate()
      self.proc.join(timeout=3)
      if self.proc.is_alive():
        self.proc.kill()
        self.proc.join(timeout=3)

  def join(self, timeout=None):
    self.proc.join(timeout)


def run(workers, duration=None):
  """Start workers and supervise: if one fails, kill all and raise."""
  for worker in workers:
    if not worker.running:
      try:
        worker.start()
      except (AssertionError, RuntimeError):
        pass
  start = time.time()
  try:
    while True:
      for worker in workers:
        worker.check()
      if all(not w.running for w in workers):
        return
      if duration and time.time() - start > duration:
        return
      time.sleep(0.3)
  finally:
    for worker in workers:
      try:
        worker.kill()
      except Exception:
        pass

