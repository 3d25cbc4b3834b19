"""Checkpoint-restore + policy-only rollouts.

Capability parity: /root/reference/embodied/run/eval_only.py.
"""

from collections import defaultdict
from functools import partial as bind

import numpy as np

from .. import core
from ..utils import Agg, Checkpoint, FPS, Path, Usage, timer


def eval_only(make_agent, make_env, make_logger, args):
  assert args.from_checkpoint, 'eval_only requires run.from_checkpoint'

  agent = make_agent()
  logger = make_logger()

  logdir = Path(args.logdir)
  logdir.mkdir()
  step = logger.step
  usage = Usage(**dict(args.usage))
  epstats = Agg()
  episodes = defaultdict(Agg)
  should_log = core.LocalClock(args.log_every)
  policy_fps = FPS()

  @timer.section('logfn')
  def logfn(tran, worker):
    episode = episodes[worker]
    tran['is_first'] and episode.reset()
    episode.add('score', tran['reward'], agg='sum')
    episode.add('length', 1, agg='sum')
    episode.add('rewards', tran['reward'], agg='stack')
    for key, value in tran.items():
      isimage = (value.dtype == np.uint8) and (value.ndim == 3)
      if isimage and worker == 0:
        episode.add(f'policy_{key}', value, agg='stack')
      elif key.startswith('log/'):
        episode.add(key, value, agg=('avg', 'max', 'sum'))
    if tran['is_last']:
      result = episode.result()
      logger.add({
          'score': result.pop('score'),
          'length': result.pop('length'),
      }, prefix='episode')
      rew = result.pop('rewards')
      if len(rew) > 1:
        result['reward_rate'] = (np.abs(rew[1:] - rew[:-1]) >= 0.01).mean()
      epstats.add(result)

  fns = [bind(make_env, i) for i in range(args.envs)]
  driver = core.Driver(fns, parallel=(False if args.debug else getattr(args, 'driver', 'process')))
  driver.on_step(lambda tran, _: step.increment())
  driver.on_step(lambda tran, _: policy_fps.step())
  driver.on_step(logfn)

  cp = Checkpoint()
  cp.agent = agent
  cp.load(args.from_checkpoint, keys=['agent'])

  print('Start evaluation')
  policy = lambda *a: agent.policy(*a, mode='eval')
  driver.reset(agent.init_policy)
  try:
    while step < args.steps:
      driver(policy, steps=10)
      if should_log(step):
        logger.add(epstats.result(), prefix='epstats')
        logger.add(usage.stats(), prefix='usage')
        logger.add({'fps/policy': policy_fps.result()})
        logger.add({'timer': timer.stats()['summary']})
        logger.write()
  finally:
    driver.close()
    logger.close()
