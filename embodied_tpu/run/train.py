"""Single-process training protocol.

Capability parity: /root/reference/embodied/run/train.py — driver callbacks
for step accounting and replay inserts, Ratio-paced train steps interleaved
with env stepping, periodic report/log/save via wall clocks, and checkpoint
registration with resume.
"""

import collections
import pickle
from functools import partial as bind

import numpy as np

from .. import core
from ..utils import (
    Agg, Checkpoint, FPS, Path, Usage, timer, when)


def train(make_agent, make_replay, make_env, make_stream, make_logger, args):

  agent = make_agent()
  replay = make_replay()
  logger = make_logger()

  logdir = Path(args.logdir)
  step = logger.step
  usage = Usage(**dict(args.usage))
  train_agg = Agg()
  epstats = Agg()
  episodes = collections.defaultdict(Agg)
  policy_fps = FPS()
  train_fps = FPS()

  batch_steps = args.batch_size * args.batch_length
  should_train = when.Ratio(args.train_ratio / batch_steps)
  should_log = core.LocalClock(args.log_every)
  should_report = core.LocalClock(args.report_every)
  should_save = core.LocalClock(args.save_every)

  @timer.section('logfn')
  def logfn(tran, worker):
    episode = episodes[worker]
    tran['is_first'] and episode.reset()
    episode.add('score', tran['reward'], agg='sum')
    episode.add('length', 1, agg='sum')
    episode.add('rewards', tran['reward'], agg='stack')
    for key, value in tran.items():
      if value.dtype == np.uint8 and value.ndim == 3:
        if worker == 0:
          episode.add(f'policy_{key}', value, agg='stack')
      elif key.startswith('log/'):
        assert value.ndim == 0, (key, value.shape, value.dtype)
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
  driver.on_step(replay.add)
  driver.on_step(logfn)

  stream_train = iter(agent.stream(make_stream(replay, 'train')))
  stream_report = iter(agent.stream(make_stream(replay, 'report')))

  carry_train = [agent.init_train(args.batch_size)]
  carry_report = [agent.init_report(args.batch_size)]

  def trainfn(tran, worker):
    if len(replay) < args.batch_size * args.batch_length:
      return
    for _ in range(should_train(step)):
      with timer.section('stream_next'):
        batch = next(stream_train)
      carry_train[0], outs, mets = agent.train(carry_train[0], batch)
      train_fps.step(batch_steps)
      if 'replay' in outs:
        replay.update(outs['replay'])
      train_agg.add(mets, prefix='train')
  driver.on_step(trainfn)

  cp = Checkpoint(logdir / 'checkpoint.pkl')
  cp.step = step
  cp.agent = agent
  cp.replay = replay
  if args.from_checkpoint:
    data = pickle.loads(Path(args.from_checkpoint).read_bytes())
    agent.load(data['agent'])
  cp.load_or_save()

  print('Start training loop')
  policy = lambda *a: agent.policy(*a, mode='train')
  driver.reset(agent.init_policy)
  try:
    while step < args.steps:

      driver(policy, steps=10)

      if should_report(step) and len(replay):
        agg = Agg()
        for _ in range(args.consec_report * args.report_batches):
          carry_report[0], mets = agent.report(
              carry_report[0], next(stream_report))
          agg.add(mets)
        logger.add(agg.result(), prefix='report')

      if should_log(step):
        logger.add(train_agg.result())
        logger.add(epstats.result(), prefix='epstats')
        logger.add(replay.stats(), prefix='replay')
        logger.add(usage.stats(), prefix='usage')
        logger.add({'fps/policy': policy_fps.result()})
        logger.add({'fps/train': train_fps.result()})
        logger.add({'timer': timer.stats()['summary']})
        logger.write()

      if should_save(step):
        cp.save()
  finally:
    driver.close()
    logger.close()
