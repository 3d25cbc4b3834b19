"""Synchronous vectorized environment loop.

Capability parity: /root/reference/embodied/core/driver.py — lockstep batch
stepping of N envs (optionally one subprocess per env), 'log/' key split,
action masking at episode boundaries, per-env transition callbacks, and a
child env-server loop with error propagation.

Beyond the reference: `parallel='thread'` steps envs from a thread pool
instead of one process per env — on few-core hosts, and for env libraries
that release the GIL (ALE, MuJoCo, procgen), this avoids the process
context-switch tax of lockstep stepping while keeping callbacks
in-process and zero-copy.

Process mode uses a shared-memory transport: after the first transition
reveals the observation layout, each env worker gets one SharedMemory
block holding its obs and act columns. Steps then exchange only a tiny
token over the pipe while the payload rides shared memory with zero
pickling and zero copies on the parent side (the batch stack reads the
views directly — lockstep stepping guarantees the child is idle then).
Workers whose observation layout changes mid-run fall back to the pickled
pipe payload for that step.
"""

import multiprocessing as mp
from multiprocessing import shared_memory

import numpy as np

from ..utils import tree

_SHM_TOKEN = '__shm__'


def _shm_layout(arrays):
  """(offset, shape, dtype) per key plus total size, 64-byte aligned."""
  layout, offset = {}, 0
  for key in sorted(arrays.keys()):
    value = np.asarray(arrays[key])
    if value.dtype == object:
      return None, 0
    layout[key] = (offset, value.shape, value.dtype.str)
    offset += int(-(-value.nbytes // 64) * 64) or 64
  return layout, max(offset, 64)


def _shm_views(block, layout):
  views = {}
  for key, (offset, shape, dtype) in layout.items():
    size = int(np.prod(shape)) if shape else 1
    views[key] = np.frombuffer(
        block.buf, np.dtype(dtype), size, offset).reshape(shape)
  return views


class Driver:

  def __init__(self, make_env_fns, parallel=True, **kwargs):
    assert len(make_env_fns) >= 1
    assert parallel in (True, False, 'process', 'thread'), parallel
    self.parallel = 'process' if parallel is True else parallel
    self.kwargs = kwargs
    self.length = len(make_env_fns)
    self.pool = None
    if self.parallel == 'process':
      import cloudpickle
      context = mp.get_context('spawn')
      self.pipes, child_pipes = zip(
          *[context.Pipe() for _ in range(self.length)])
      payloads = [cloudpickle.dumps(fn) for fn in make_env_fns]
      self.procs = [
          context.Process(
              target=_env_server, args=(i, pipe, payload), daemon=True)
          for i, (payload, pipe) in enumerate(zip(payloads, child_pipes))]
      [proc.start() for proc in self.procs]
      self.pipes[0].send(('act_space',))
      self.act_space = self._receive(self.pipes[0])
      # Shared-memory transport state, set up lazily per worker once the
      # first transition reveals the observation layout.
      self.shm = [None] * self.length
    else:
      self.envs = [fn() for fn in make_env_fns]
      self.act_space = self.envs[0].act_space
      if self.parallel == 'thread':
        from concurrent.futures import ThreadPoolExecutor
        self.pool = ThreadPoolExecutor(
            max_workers=min(self.length, 4 * (mp.cpu_count() or 1)),
            thread_name_prefix='driver-env')
    self.callbacks = []
    self.acts = None
    self.carry = None
    self.reset()

  def reset(self, init_policy=None):
    self.acts = {
        k: np.zeros((self.length,) + v.shape, v.dtype)
        for k, v in self.act_space.items()}
    self.acts['reset'] = np.ones(self.length, bool)
    self.carry = init_policy and init_policy(self.length)

  def close(self):
    if self.parallel == 'process':
      for proc in self.procs:
        proc.terminate()
        proc.join(timeout=5)
      for entry in getattr(self, 'shm', []):
        if entry is not None:
          entry['views'] = entry['act_views'] = None
          try:
            entry['block'].close()
            entry['block'].unlink()
          except Exception:
            pass
    else:
      if self.pool is not None:
        self.pool.shutdown(wait=False)
      [env.close() for env in self.envs]

  def on_step(self, callback):
    self.callbacks.append(callback)

  def __call__(self, policy, steps=0, episodes=0):
    step, episode = 0, 0
    while step < steps or episode < episodes:
      step, episode = self._step(policy, step, episode)

  def _step(self, policy, step, episode):
    acts = self.acts
    assert all(len(x) == self.length for x in acts.values())
    per_env = [{k: v[i] for k, v in acts.items()} for i in range(self.length)]
    if self.parallel == 'process':
      for i, (pipe, act) in enumerate(zip(self.pipes, per_env)):
        entry = self.shm[i]
        if entry is None:
          pipe.send(('step', act))
        else:
          for key, value in act.items():
            entry['act_views'][key][...] = value
          pipe.send(('step_shm',))
      obs = []
      for i, pipe in enumerate(self.pipes):
        result = self._receive(pipe)
        if result == _SHM_TOKEN:
          # Lockstep stepping: the child is idle until the next send, so
          # the views can be read (and stacked below) without copying.
          obs.append(self.shm[i]['views'])
        else:
          obs.append(result)
          if self.shm[i] is None:
            self._attach_shm(i, result)
    elif self.parallel == 'thread':
      obs = list(self.pool.map(
          lambda ea: ea[0].step(ea[1]), zip(self.envs, per_env)))
    else:
      obs = [env.step(act) for env, act in zip(self.envs, per_env)]
    obs = {k: np.stack([x[k] for x in obs]) for k in obs[0].keys()}
    logs = {k: v for k, v in obs.items() if k.startswith('log/')}
    obs = {k: v for k, v in obs.items() if not k.startswith('log/')}
    self.carry, acts, outs = policy(self.carry, obs, **self.kwargs)
    assert all(k not in acts for k in outs), (
        list(outs.keys()), list(acts.keys()))
    if obs['is_last'].any():
      # Zero out actions for envs that just finished an episode, so the
      # stored prevact at episode starts is a null action.
      mask = ~obs['is_last']
      acts = {k: self._mask(v, mask) for k, v in acts.items()}
    self.acts = {**acts, 'reset': obs['is_last'].copy()}
    trans = {**obs, **acts, **outs, **logs}
    for i in range(self.length):
      trn = tree.tree_map(lambda x: x[i], trans)
      [fn(trn, i, **self.kwargs) for fn in self.callbacks]
    step += len(obs['is_first'])
    episode += int(obs['is_last'].sum())
    return step, episode

  def _attach_shm(self, i, obs):
    """Create the worker's shared block from its first observation."""
    obs_layout, obs_size = _shm_layout(obs)
    act_layout, act_size = _shm_layout(
        {k: np.zeros(v.shape, v.dtype) for k, v in self.act_space.items()})
    if obs_layout is None or act_layout is None:
      return  # Non-numeric payloads stay on the pickled pipe path.
    try:
      block = shared_memory.SharedMemory(create=True, size=obs_size + act_size)
    except Exception:
      return
    act_layout = {
        k: (off + obs_size, shape, dtype)
        for k, (off, shape, dtype) in act_layout.items()}
    self.shm[i] = dict(
        block=block,
        views=_shm_views(block, obs_layout),
        act_views=_shm_views(block, act_layout))
    self.pipes[i].send(('attach_shm', block.name, obs_layout, act_layout))

  def _mask(self, value, mask):
    while mask.ndim < value.ndim:
      mask = mask[..., None]
    return value * mask.astype(value.dtype)

  def _receive(self, pipe):
    try:
      msg, arg = pipe.recv()
      if msg == 'error':
        raise RuntimeError(arg)
      assert msg == 'result', msg
      return arg
    except BaseException:
      print('Terminating env workers due to an exception.')
      self.close()
      raise


def _env_server(envid, pipe, payload):
  env = None
  shm_block, obs_views, act_views = None, None, None
  try:
    import cloudpickle
    ctor = cloudpickle.loads(payload)
    env = ctor()
    while True:
      if not pipe.poll(0.1):
        continue
      try:
        msg, *args = pipe.recv()
      except EOFError:
        return
      if msg == 'step':
        pipe.send(('result', env.step(args[0])))
      elif msg == 'step_shm':
        act = {k: v.copy() for k, v in act_views.items()}
        obs = env.step(act)
        ok = set(obs.keys()) == set(obs_views.keys())
        if ok:
          for key, value in obs.items():
            view = obs_views[key]
            value = np.asarray(value)
            if value.shape != view.shape or value.dtype != view.dtype:
              ok = False
              break
            view[...] = value
        if ok:
          pipe.send(('result', _SHM_TOKEN))
        else:
          # Layout changed (new/missing keys or reshaped values): fall
          # back to the pickled payload for this step.
          pipe.send(('result', obs))
      elif msg == 'attach_shm':
        name, obs_layout, act_layout = args
        shm_block = shared_memory.SharedMemory(name=name)
        obs_views = _shm_views(shm_block, obs_layout)
        act_views = _shm_views(shm_block, act_layout)
        # No reply: the parent continues immediately.
      elif msg == 'obs_space':
        pipe.send(('result', env.obs_space))
      elif msg == 'act_space':
        pipe.send(('result', env.act_space))
      elif msg == 'close':
        return
      else:
        raise ValueError(f'Invalid message {msg}')
  except (ConnectionResetError, BrokenPipeError, KeyboardInterrupt):
    pass
  except Exception as e:
    try:
      pipe.send(('error', repr(e)))
    except Exception:
      pass
    raise
  finally:
    try:
      env and env.close()
    except Exception:
      pass
    if shm_block is not None:
      obs_views = act_views = None
      try:
        shm_block.close()
      except Exception:
        pass
    pipe.close()
