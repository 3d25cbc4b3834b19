"""Offline model training from streams only; multi-replica aware.

Capability parity: /root/reference/embodied/run/pretrain.py — GlobalClock
cadence across replicas, checkpoint writes gated on replica 0.
"""

import pickle
import time

from .. import core
from ..utils import Agg, Checkpoint, FPS, Path, Usage, timer


def pretrain(make_model, make_stream, make_logger, args):

  model = make_model()
  dataset_train = iter(model.stream(make_stream(None, 'train')))
  dataset_report = iter(model.stream(make_stream(None, 'report')))
  dataset_eval = iter(model.stream(make_stream(None, 'eval')))
  logger = make_logger()
  step = logger.step

  should_log = core.GlobalClock(args.log_every)
  should_report = core.GlobalClock(args.report_every)
  should_save = core.GlobalClock(args.save_every)

  train_agg = Agg()
  usage = Usage(**dict(args.usage))
  fps = FPS()

  carry_train = model.init_train(args.batch_size)
  carry_report = model.init_report(args.batch_size)
  carry_eval = model.init_report(args.batch_size)

  write = (args.replica == 0)
  cp = Checkpoint(Path(args.logdir) / 'checkpoint.pkl')
  cp.step = step
  cp.model = model
  cp.dataset_train = dataset_train
  cp.dataset_report = dataset_report
  cp.dataset_eval = dataset_eval
  if not cp.exists():
    if args.from_checkpoint:
      data = pickle.loads(Path(args.from_checkpoint).read_bytes())
      model.load(data['model'])
    write and cp.save()
  else:
    cp.load()

  print('Starting training')
  while step < args.steps:

    with timer.section('stream'):
      batch = next(dataset_train)
    with timer.section('train'):
      start = time.time()
      carry_train, outs, mets = model.train(carry_train, batch)
      logger.add({'dur/train': time.time() - start})
    train_agg.add(mets)
    step.increment()
    fps.step(args.batch_size * args.batch_length)

    if should_report(step):
      logger.write()
      with timer.section('report'):
        agg = Agg()
        for _ in range(args.consec_report * args.report_batches):
          carry_report, mets = model.report(carry_report,
                                            next(dataset_report))
          agg.add(mets)
        logger.add(agg.result(), prefix='report')
      with timer.section('eval'):
        agg = Agg()
        for _ in range(args.consec_report * args.report_batches):
          carry_eval, mets = model.report(carry_eval, next(dataset_eval))
          agg.add(mets)
        logger.add(agg.result(), prefix='eval')
      logger.add({'timer': timer.stats()['summary']})
      logger.write()

    if should_log(step):
      logger.add(train_agg.result(), prefix='train')
      logger.add(usage.stats(), prefix='usage')
      result = fps.result()
      logger.add({'fps': result, 'spf': 1 / max(result, 1e-8)})

    if should_save(step) and write:
      with timer.section('saving'):
        cp.save()

  logger.close()
