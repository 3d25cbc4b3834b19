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
"""

import multiprocessing as mp

import numpy as np

from ..utils import tree


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
      [pipe.send(('step', act)) for pipe, act in zip(self.pipes, per_env)]
      obs = [self._receive(pipe) for pipe in self.pipes]
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
    pipe.close()
