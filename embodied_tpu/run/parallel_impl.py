"""Distributed actor-learner protocol over the remote RPC layer.

Capability parity: /root/reference/embodied/run/parallel.py — combined()
spawns agent (actor+learner threads), logger process, N env processes, and
a replay process; roles can also run on separate machines via the
parallel_env/parallel_envs/parallel_replay entry scripts and
remote_envs/remote_replay flags. The actor is a batching RPC server that
gathers per-env policy carries, runs the batched policy, and forwards
transitions to the replay and logger services; the learner trains from
prefetched sample futures and pushes latent updates back to replay, which
enforces the SamplesPerInsert limiter on both sides.
"""

import collections
import pickle
import threading
import time

import numpy as np

from .. import core, remote
from ..core import limiters as limiterlib
from ..core import streams as streamlib
from ..utils import Agg, Checkpoint, Counter, FPS, Path, Usage, timer, tree

prefix = lambda d, p: {f'{p}/{k}': v for k, v in d.items()}


def combined(
    make_agent, make_replay_train, make_replay_eval, make_env_train,
    make_env_eval, make_stream, make_logger, args):
  import cloudpickle

  if args.actor_batch <= 0:
    args = args.update(actor_batch=max(1, args.envs // 2))
  assert args.actor_batch <= args.envs, (args.actor_batch, args.envs)
  for key in ('actor_addr', 'replay_addr', 'logger_addr'):
    if '{auto}' in args[key]:
      args = args.update({key: args[key].format(auto=remote.free_port())})

  make_agent_b = cloudpickle.dumps(make_agent)
  make_replay_train_b = cloudpickle.dumps(make_replay_train)
  make_replay_eval_b = cloudpickle.dumps(make_replay_eval)
  make_env_train_b = cloudpickle.dumps(make_env_train)
  make_env_eval_b = cloudpickle.dumps(make_env_eval)
  make_stream_b = cloudpickle.dumps(make_stream)
  make_logger_b = cloudpickle.dumps(make_logger)

  workers = []
  # The agent runs in-process (it owns the accelerator).
  workers.append(remote.Thread(
      parallel_agent, make_agent_b, args, name='agent'))
  workers.append(remote.Process(
      parallel_logger, make_logger_b, args, name='logger'))
  if not args.remote_envs:
    for i in range(args.envs):
      workers.append(remote.Process(
          parallel_env, make_env_train_b, i, args, False, name=f'env{i}'))
    for i in range(args.envs, args.envs + args.eval_envs):
      workers.append(remote.Process(
          parallel_env, make_env_eval_b, i, args, True, name=f'env{i}'))
  if not args.remote_replay:
    workers.append(remote.Process(
        parallel_replay, make_replay_train_b, make_replay_eval_b,
        make_stream_b, args, name='replay'))
  remote.run(workers, duration=args.duration or None)


def parallel_agent(make_agent, args):
  import cloudpickle
  if isinstance(make_agent, bytes):
    make_agent = cloudpickle.loads(make_agent)
  agent = make_agent()
  barrier = threading.Barrier(2)
  workers = [
      remote.Thread(parallel_actor, agent, barrier, args, name='actor'),
      remote.Thread(parallel_learner, agent, barrier, args, name='learner'),
  ]
  remote.run(workers, duration=args.duration or None)


@timer.section('actor')
def parallel_actor(agent, barrier, args):
  islist = lambda x: isinstance(x, list)
  initial = agent.init_policy(args.actor_batch)
  initial = tree.tree_map(lambda x: x[0], _to_numpy(initial), isleaf=islist)
  carries = collections.defaultdict(lambda: initial)
  barrier.wait()  # Wait for the learner to restore the checkpoint.
  fps = FPS()

  should_log = core.LocalClock(args.log_every)
  backlog = 8 * args.actor_threads
  logger = remote.Client(args.logger_addr, 'ActorLogger',
                         maxinflight=backlog)
  replay = remote.Client(args.replay_addr, 'ActorReplay',
                         maxinflight=backlog)

  @timer.section('actor_workfn')
  def workfn(obs):
    envid = obs.pop('envid')
    assert envid.shape == (args.actor_batch,), envid.shape
    is_eval = obs.pop('is_eval')
    fps.step(obs['is_first'].size)
    carry = [carries[int(a)] for a in envid]
    carry = tree.tree_map(lambda *xs: np.stack(xs), *carry)
    logs = {k: v for k, v in obs.items() if k.startswith('log/')}
    obs = {k: v for k, v in obs.items() if not k.startswith('log/')}
    carry, acts, outs = agent.policy(carry, obs)
    carry = _to_numpy(carry)
    for i, a in enumerate(envid):
      carries[int(a)] = tree.tree_map(lambda x: x[i], carry)
    trans = {'envid': envid, 'is_eval': is_eval, **obs, **acts, **outs,
             **logs}
    trans = {k: np.asarray(v) for k, v in trans.items()}
    acts = {**acts, 'reset': obs['is_last'].copy()}
    return acts, trans

  @timer.section('actor_postfn')
  def postfn(trans):
    logs = {k: v for k, v in trans.items() if k.startswith('log/')}
    trans = {k: v for k, v in trans.items() if not k.startswith('log/')}
    replay.call('add_batch', trans)
    logger.call('tran', {**trans, **logs})
    if should_log():
      stats = {'fps/policy': fps.result(),
               'parallel/ep_states': len(carries)}
      stats.update(prefix(server.stats(), 'server/actor'))
      stats.update(prefix(logger.stats(), 'client/actor_logger'))
      stats.update(prefix(replay.stats(), 'client/actor_replay'))
      logger.call('add', stats)

  server = remote.BatchServer(args.actor_addr, name='Actor')
  server.bind('act', workfn, postfn, args.actor_batch, args.actor_threads)
  server.start()


@timer.section('learner')
def parallel_learner(agent, barrier, args):
  agg = Agg()
  usage = Usage(**dict(args.usage))
  should_log = core.GlobalClock(args.log_every)
  should_report = core.GlobalClock(args.report_every)
  should_save = core.GlobalClock(args.save_every)
  fps = FPS()
  batch_steps = args.batch_size * args.batch_length

  cp = Checkpoint(Path(args.logdir) / 'agent.pkl')
  cp.agent = agent
  if args.from_checkpoint:
    data = pickle.loads(Path(args.from_checkpoint).read_bytes())
    agent.load(data['agent'])
  cp.load_or_save()
  logger = remote.Client(args.logger_addr, 'LearnerLogger', maxinflight=1)
  updater = remote.Client(args.replay_addr, 'LearnerReplayUpdater',
                          maxinflight=8)
  barrier.wait()

  replays = {}
  received = collections.defaultdict(int)

  def parallel_stream(source, prefetch=2):
    client = remote.Client(args.replay_addr, f'LearnerReplay{source}')
    replays[source] = client
    method = f'sample_batch_{source}'
    futures = collections.deque(
        client.call(method) for _ in range(prefetch))
    while True:
      futures.append(client.call(method))
      data = futures.popleft().result()
      received[source] += 1
      yield data

  def evaluate(stream):
    carry = agent.init_report(args.batch_size)
    result = Agg()
    for _ in range(args.consec_report * args.report_batches):
      carry, metrics = agent.report(carry, next(stream))
      result.add(metrics)
    return result.result()

  stream_train = iter(agent.stream(
      streamlib.Stateless(parallel_stream('train'))))
  stream_report = iter(agent.stream(
      streamlib.Stateless(parallel_stream('report'))))
  stream_eval = iter(agent.stream(
      streamlib.Stateless(parallel_stream('eval'))))
  carry = agent.init_train(args.batch_size)

  try:
    while True:
      with timer.section('learner_next'):
        batch = next(stream_train)
      with timer.section('learner_train'):
        carry, outs, mets = agent.train(carry, batch)
      if 'replay' in outs:
        updater.call('update', outs['replay'])
      agg.add(mets)
      fps.step(batch_steps)

      if should_report(skip=not received['report']):
        with timer.section('learner_report'):
          logger.call('add', prefix(evaluate(stream_report), 'report'))
          if args.eval_envs and received['eval']:
            logger.call('add', prefix(evaluate(stream_eval), 'eval'))

      if should_log():
        stats = {'fps/train': fps.result()}
        stats['timer/agent'] = timer.stats()['summary']
        stats.update(prefix(agg.result(), 'train'))
        stats.update(prefix(usage.stats(), 'usage/agent'))
        logger.call('add', stats)

      if should_save():
        cp.save()
  except (remote.Disconnected, RuntimeError) as e:
    # Replay/logger going away means the run is shutting down.
    if 'connection closed' in str(e) or 'Disconnected' in str(e):
      print('Learner shutting down: services disconnected')
      return
    raise


def parallel_replay(make_replay_train, make_replay_eval, make_stream, args):
  import cloudpickle
  if isinstance(make_replay_train, bytes):
    make_replay_train = cloudpickle.loads(make_replay_train)
  if isinstance(make_replay_eval, bytes):
    make_replay_eval = cloudpickle.loads(make_replay_eval)
  if isinstance(make_stream, bytes):
    make_stream = cloudpickle.loads(make_stream)

  replay_train = make_replay_train()
  replay_eval = make_replay_eval()

  stream_train = iter(make_stream(replay_train, 'train'))
  stream_report = iter(make_stream(replay_train, 'report'))
  stream_eval = iter(make_stream(replay_eval, 'eval'))

  should_log = core.LocalClock(args.log_every)
  logger = remote.Client(args.logger_addr, 'ReplayLogger', maxinflight=1)
  usage = Usage(**{**dict(args.usage)})
  active = Counter()

  limiter = limiterlib.SamplesPerInsert(
      args.train_ratio / args.batch_length,
      tolerance=4 * args.batch_size,
      minsize=args.batch_size * replay_train.length)

  def add_batch(data):
    active.increment()
    envids = data.pop('envid')
    for i, envid in enumerate(envids):
      tran = {k: v[i] for k, v in data.items()}
      if tran.pop('is_eval', False):
        replay_eval.add(tran, int(envid))
        continue
      limiterlib.wait(limiter.want_insert, 'Replay insert waiting')
      limiter.insert()
      replay_train.add(tran, int(envid))
    return {}

  def sample_batch_train():
    active.increment()
    for _ in range(args.batch_size):
      limiterlib.wait(limiter.want_sample, 'Replay sample waiting')
      limiter.sample()
    return next(stream_train)

  def sample_batch_report():
    active.increment()
    return next(stream_report)

  def sample_batch_eval():
    active.increment()
    return next(stream_eval)

  should_save = core.LocalClock(args.save_every)
  cp = Checkpoint(Path(args.logdir) / 'replay.pkl')
  cp.replay_train = replay_train
  cp.replay_eval = replay_eval
  cp.limiter = limiter
  cp.load_or_save()

  server = remote.Server(args.replay_addr, name='Replay')
  server.bind('add_batch', add_batch, workers=1)
  server.bind('sample_batch_train', sample_batch_train, workers=1)
  server.bind('sample_batch_report', sample_batch_report, workers=1)
  server.bind('sample_batch_eval', sample_batch_eval, workers=1)
  server.bind('update', lambda data: replay_train.update(data) or {},
              workers=1)
  server.start(block=False)
  while True:
    if should_save() and active > 0:
      active.load(0)
      cp.save()
    if should_log():
      stats = {}
      stats['timer/replay'] = timer.stats()['summary']
      stats.update(prefix(replay_train.stats(), 'replay'))
      stats.update(prefix(replay_eval.stats(), 'replay_eval'))
      stats.update(prefix(usage.stats(), 'usage/replay'))
      stats.update(prefix(server.stats(), 'server/replay'))
      logger.call('add', stats)
    time.sleep(1)


def parallel_logger(make_logger, args):
  import cloudpickle
  if isinstance(make_logger, bytes):
    make_logger = cloudpickle.loads(make_logger)

  logger = make_logger()
  should_log = core.LocalClock(args.log_every)
  usage = Usage(**dict(args.usage))

  active = Counter()
  should_save = core.LocalClock(args.save_every)
  cp = Checkpoint(Path(args.logdir) / 'logger.pkl')
  cp.step = logger.step
  cp.load_or_save()

  parallel_agg = Agg()
  epstats = Agg()
  episodes = collections.defaultdict(Agg)
  updated = collections.defaultdict(lambda: None)
  dones = collections.defaultdict(lambda: True)

  def addfn(metrics):
    active.increment()
    logger.add(metrics)
    return {}

  def tranfn(trans):
    active.increment()
    now = time.time()
    envid = trans.pop('envid')
    logger.step.increment(int((~trans['is_eval']).sum()))
    parallel_agg.add('ep_starts', trans['is_first'].sum(), agg='sum')
    parallel_agg.add('ep_ends', trans['is_last'].sum(), agg='sum')

    for i, addr in enumerate(envid):
      addr = int(addr)
      tran = {k: v[i] for k, v in trans.items()}
      updated[addr] = now
      episode = episodes[addr]
      if tran['is_first']:
        episode.reset()
        parallel_agg.add('ep_abandoned', int(not dones[addr]), agg='sum')
      dones[addr] = bool(tran['is_last'])

      episode.add('score', tran['reward'], agg='sum')
      episode.add('length', 1, agg='sum')
      episode.add('rewards', tran['reward'], agg='stack')
      first_addr = next(iter(episodes.keys()))
      for key, value in tran.items():
        if hasattr(value, 'dtype') and value.dtype == np.uint8 and (
            value.ndim == 3):
          if addr == first_addr:
            episode.add(f'policy_{key}', value, agg='stack')
        elif key.startswith('log/'):
          episode.add(key, value, agg=('avg', 'max', 'sum'))
      if tran['is_last']:
        result = episode.result()
        logger.add({
            'score': result.pop('score'),
            'length': result.pop('length') - 1,
        }, prefix='episode')
        rew = result.pop('rewards')
        if len(rew) > 1:
          result['reward_rate'] = (
              np.abs(rew[1:] - rew[:-1]) >= 0.01).mean()
        epstats.add(result)

    for addr, last in list(updated.items()):
      if now - last >= args.episode_timeout:
        print('Dropping episode statistics due to timeout.')
        episodes.pop(addr, None)
        updated.pop(addr, None)
    return {}

  server = remote.Server(args.logger_addr, 'Logger')
  server.bind('add', addfn)
  server.bind('tran', tranfn)
  server.start(block=False)
  last_step = int(logger.step)
  while True:
    time.sleep(1)
    if should_log() and active > 0:
      active.load(0)
      logger.add({'timer/logger': timer.stats()['summary']})
      logger.add(parallel_agg.result(), prefix='parallel')
      logger.add(epstats.result(), prefix='epstats')
      logger.add(usage.stats(), prefix='usage/logger')
      logger.add(server.stats(), prefix='server/logger')
      if logger.step != last_step:
        logger.write()
        last_step = int(logger.step)
    if should_save():
      cp.save()


def parallel_env(make_env, envid, args, is_eval=False):
  import cloudpickle
  if isinstance(make_env, bytes):
    make_env = cloudpickle.loads(make_env)
  assert envid >= 0, envid
  name = f'Env{envid:05}'

  should_log = core.LocalClock(args.log_every)
  fps = FPS()
  logger = None
  if envid == 0:
    logger = remote.Client(args.logger_addr, f'{name}Logger', maxinflight=1)
    usage = Usage(**dict(args.usage))

  env = make_env(envid)
  actor = remote.Client(args.actor_addr, name, autoconn=False)
  actor.connect()

  done = True
  act = None
  while True:
    if done:
      act = {k: v.sample() for k, v in env.act_space.items()}
      act['reset'] = True
      score, length = 0.0, 0

    obs = env.step(act)
    obs = {k: np.asarray(v, order='C') for k, v in obs.items()}
    obs['is_eval'] = is_eval
    score += float(obs['reward'])
    length += 1
    fps.step(1)
    done = bool(obs['is_last'])
    if done and envid == 0:
      print(f'[{name}] Episode of length {length} with score {score:.2f}')

    try:
      future = actor.call('act', {'envid': envid, **obs})
      act = future.result()
    except remote.Disconnected:
      print(f'[{name}] Env lost connection to agent')
      actor.connect()
      done = True

    if should_log() and envid == 0:
      stats = {'fps/env': fps.result()}
      stats['timer/env'] = timer.stats()['summary']
      stats.update(prefix(usage.stats(), 'usage/env'))
      stats.update(prefix(actor.stats(), 'client/env_actor'))
      logger.call('add', stats)


def parallel_envs(make_env, make_env_eval, args):
  import cloudpickle
  make_env_b = cloudpickle.dumps(make_env)
  make_env_eval_b = cloudpickle.dumps(make_env_eval)
  workers = []
  for i in range(args.envs):
    workers.append(remote.Process(
        parallel_env, make_env_b, i, args, False, name=f'env{i}'))
  for i in range(args.envs, args.envs + args.eval_envs):
    workers.append(remote.Process(
        parallel_env, make_env_eval_b, i, args, True, name=f'env{i}'))
  remote.run(workers)


def _to_numpy(tree_):
  return tree.tree_map(lambda x: np.asarray(x), tree_)
