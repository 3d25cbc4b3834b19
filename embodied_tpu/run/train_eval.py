"""Training protocol with a separate eval env fleet and eval replay.

Capability parity: /root/reference/embodied/run/train_eval.py.
"""

import collections
import pickle
from functools import partial as bind

import numpy as np

from .. import core
from ..utils import Agg, Checkpoint, FPS, Path, Usage, timer, when


def train_eval(
    make_agent, make_replay_train, make_replay_eval, make_env_train,
    make_env_eval, make_stream, make_logger, args):

  agent = make_agent()
  replay_train = make_replay_train()
  replay_eval = make_replay_eval()
  logger = make_logger()

  logdir = Path(args.logdir)
  logdir.mkdir()
  step = logger.step
  usage = Usage(**dict(args.usage))
  agg = Agg()
  train_episodes = collections.defaultdict(Agg)
  train_epstats = Agg()
  eval_episodes = collections.defaultdict(Agg)
  eval_epstats = Agg()
  policy_fps = FPS()
  train_fps = FPS()

  batch_steps = args.batch_size * args.batch_length
  should_train = when.Ratio(args.train_ratio / batch_steps)
  should_log = core.LocalClock(args.log_every)
  should_report = core.LocalClock(args.report_every)
  should_save = core.LocalClock(args.save_every)

  @timer.section('logfn')
  def logfn(tran, worker, mode):
    episodes = dict(train=train_episodes, eval=eval_episodes)[mode]
    epstats = dict(train=train_epstats, eval=eval_epstats)[mode]
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
        episode.add(key, value, agg=('avg', 'max', 'sum'))
    if tran['is_last']:
      result = episode.result()
      logger.add({
          'score': result.pop('score'),
          'length': result.pop('length'),
      }, prefix=('episode' if mode == 'train' else 'eval_episode'))
      rew = result.pop('rewards')
      if len(rew) > 1:
        result['reward_rate'] = (np.abs(rew[1:] - rew[:-1]) >= 0.01).mean()
      epstats.add(result)

  fns = [bind(make_env_train, i) for i in range(args.envs)]
  driver_train = core.Driver(fns, parallel=(False if args.debug else getattr(args, 'driver', 'process')))
  driver_train.on_step(lambda tran, _: step.increment())
  driver_train.on_step(lambda tran, _: policy_fps.step())
  driver_train.on_step(replay_train.add)
  driver_train.on_step(bind(logfn, mode='train'))

  fns = [bind(make_env_eval, i) for i in range(args.eval_envs)]
  driver_eval = core.Driver(fns, parallel=(False if args.debug else getattr(args, 'driver', 'process')))
  driver_eval.on_step(replay_eval.add)
  driver_eval.on_step(bind(logfn, mode='eval'))
  driver_eval.on_step(lambda tran, _: policy_fps.step())

  stream_train = iter(agent.stream(make_stream(replay_train, 'train')))
  stream_report = iter(agent.stream(make_stream(replay_train, 'report')))
  stream_eval = iter(agent.stream(make_stream(replay_eval, 'eval')))

  carry_train = [agent.init_train(args.batch_size)]
  carry_report = [agent.init_report(args.batch_size)]
  carry_eval = [agent.init_report(args.batch_size)]

  def trainfn(tran, worker):
    if len(replay_train) < args.batch_size * args.batch_length:
      return
    for _ in range(should_train(step)):
      batch = next(stream_train)
      carry_train[0], outs, mets = agent.train(carry_train[0], batch)
      train_fps.step(batch_steps)
      if 'replay' in outs:
        replay_train.update(outs['replay'])
      agg.add(mets, prefix='train')
  driver_train.on_step(trainfn)

  def reportfn(carry, stream):
    result = Agg()
    for _ in range(args.report_batches):
      carry[0], mets = agent.report(carry[0], next(stream))
      result.add(mets)
    return result.result()

  cp = Checkpoint(logdir / 'checkpoint.pkl')
  cp.step = step
  cp.agent = agent
  cp.replay_train = replay_train
  cp.replay_eval = replay_eval
  if args.from_checkpoint:
    data = pickle.loads(Path(args.from_checkpoint).read_bytes())
    agent.load(data['agent'])
  cp.load_or_save()
  should_save(step)

  print('Start training loop')
  train_policy = lambda *a: agent.policy(*a, mode='train')
  eval_policy = lambda *a: agent.policy(*a, mode='eval')
  driver_train.reset(agent.init_policy)
  try:
    while step < args.steps:

      if should_report(step):
        print('Evaluation')
        driver_eval.reset(agent.init_policy)
        driver_eval(eval_policy, episodes=args.eval_eps)
        logger.add(eval_epstats.result(), prefix='epstats')
        if len(replay_train):
          logger.add(reportfn(carry_report, stream_report), prefix='report')
        if len(replay_eval):
          logger.add(reportfn(carry_eval, stream_eval), prefix='eval')

      driver_train(train_policy, steps=10)

      if should_log(step):
        logger.add(agg.result())
        logger.add(train_epstats.result(), prefix='epstats')
        logger.add(replay_train.stats(), prefix='replay')
        logger.add(usage.stats(), prefix='usage')
        logger.add({'fps/policy': policy_fps.result()})
        logger.add({'fps/train': train_fps.result()})
        logger.add({'timer': timer.stats()['summary']})
        logger.write()

      if should_save(step):
        cp.save()
  finally:
    driver_train.close()
    driver_eval.close()
    logger.close()
