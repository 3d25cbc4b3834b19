"""Shared entry-point wiring for agent packages (dreamerv3 / ppo / director).

Capability parity: /root/reference/dreamerv3/main.py — config assembly from
configs.yaml presets + CLI flags with regex keys, logdir templating, env
construction by task prefix with a standard wrapper stack, replay/stream/
logger factories, and script dispatch (train, train_eval, eval_only,
parallel and its role scripts).
"""

import importlib
import os
from functools import partial as bind

import yaml

from .. import core, run
from ..core import selectors as selectorlib
from ..core import streams as streamlib
from ..utils import (
    Config, Counter, Flags, JSONLOutput, Logger, Path, ScoreOutput,
    TensorBoardOutput, TerminalOutput, WandBOutput, timer, timestamp)

ENV_CTORS = {
    'dummy': 'embodied_tpu.envs.dummy:Dummy',
    'gym': 'embodied_tpu.envs.from_gym:FromGym',
    'dm': 'embodied_tpu.envs.from_dm:FromDM',
    'crafter': 'embodied_tpu.envs.crafter:Crafter',
    'dmc': 'embodied_tpu.envs.dmc:DMC',
    'atari': 'embodied_tpu.envs.atari:Atari',
    'atari100k': 'embodied_tpu.envs.atari:Atari',
    'dmlab': 'embodied_tpu.envs.dmlab:DMLab',
    'minecraft': 'embodied_tpu.envs.minecraft:Minecraft',
    'loconav': 'embodied_tpu.envs.loconav:LocoNav',
    'pinpad': 'embodied_tpu.envs.pinpad:PinPad',
    'procgen': 'embodied_tpu.envs.procgen:ProcGen',
    'bsuite': 'embodied_tpu.envs.bsuite:BSuite',
}


def assemble_config(configs_path, argv=None):
  with open(configs_path) as f:
    configs = yaml.safe_load(f)
  parsed, other = Flags(Config(configs=('defaults',))).parse_known(argv)
  config = Config(configs['defaults'])
  for name in parsed.configs:
    config = config.update(configs[name])
  config = Flags(config).parse(other)
  config = config.update(
      logdir=config.logdir.format(timestamp=timestamp()))
  if 'JOB_COMPLETION_INDEX' in os.environ:
    config = config.update(replica=int(os.environ['JOB_COMPLETION_INDEX']))
  return config


def run_script(config, make_agent_fn):
  print('Replica:', config.replica, '/', config.replicas)
  logdir = Path(config.logdir)
  print('Logdir:', logdir)
  print('Run script:', config.script)
  if not config.script.endswith(('_env', '_replay')):
    logdir.mkdir()
    config.save(logdir / 'config.yaml')
  timer.enable(config.logger.timer)

  args = Config(
      **dict(config.run),
      replica=config.replica,
      replicas=config.replicas,
      logdir=config.logdir,
      batch_size=config.batch_size,
      batch_length=config.batch_length,
      report_length=config.report_length,
      consec_train=config.consec_train,
      consec_report=config.consec_report,
      replay_context=config.replay_context,
  )

  if config.script == 'train':
    run.train(
        bind(make_agent_fn, config),
        bind(make_replay, config, 'replay'),
        bind(make_env, config),
        bind(make_stream, config),
        bind(make_logger, config),
        args)
  elif config.script == 'train_eval':
    run.train_eval(
        bind(make_agent_fn, config),
        bind(make_replay, config, 'replay'),
        bind(make_replay, config, 'eval_replay', 'eval'),
        bind(make_env, config),
        bind(make_env, config),
        bind(make_stream, config),
        bind(make_logger, config),
        args)
  elif config.script == 'eval_only':
    run.eval_only(
        bind(make_agent_fn, config),
        bind(make_env, config),
        bind(make_logger, config),
        args)
  elif config.script == 'pretrain':
    run.pretrain(
        bind(make_agent_fn, config),
        bind(make_stream, config),
        bind(make_logger, config),
        args)
  elif config.script == 'parallel':
    run.parallel.combined(
        bind(make_agent_fn, config),
        bind(make_replay, config, 'replay'),
        bind(make_replay, config, 'replay_eval', 'eval'),
        bind(make_env, config),
        bind(make_env, config),
        bind(make_stream, config),
        bind(make_logger, config),
        args)
  elif config.script == 'parallel_env':
    is_eval = config.replica >= args.envs
    run.parallel.parallel_env(
        bind(make_env, config), config.replica, args, is_eval)
  elif config.script == 'parallel_envs':
    run.parallel.parallel_envs(
        bind(make_env, config), bind(make_env, config), args)
  elif config.script == 'parallel_replay':
    run.parallel.parallel_replay(
        bind(make_replay, config, 'replay'),
        bind(make_replay, config, 'replay_eval', 'eval'),
        bind(make_stream, config),
        args)
  else:
    raise NotImplementedError(config.script)


def agent_config(config):
  return Config(
      agent=dict(config.agent),
      logdir=config.logdir,
      seed=config.seed,
      jax=dict(config.jax),
      batch_size=config.batch_size,
      batch_length=config.batch_length,
      replay_context=config.replay_context,
      replay_size=float(config.replay.size) if 'replay' in config else 1e6,
      report_length=config.report_length,
      replica=config.replica,
      replicas=config.replicas,
  )


def env_spaces(config):
  env = make_env(config, 0)
  notlog = lambda k: not k.startswith('log/')
  obs_space = {k: v for k, v in env.obs_space.items() if notlog(k)}
  act_space = {k: v for k, v in env.act_space.items() if k != 'reset'}
  env.close()
  return obs_space, act_space


def make_logger(config):
  step = Counter()
  logdir = config.logdir
  multiplier = dict(config.env).get(
      config.task.split('_')[0], {}).get('repeat', 1)
  outputs = [TerminalOutput(config.logger.filter, 'Agent')]
  for output in config.logger.outputs:
    if output == 'jsonl':
      outputs.append(JSONLOutput(logdir, 'metrics.jsonl'))
      outputs.append(ScoreOutput(
          logdir, task=config.task, method=config.method, seed=config.seed))
    elif output == 'tensorboard':
      outputs.append(TensorBoardOutput(logdir, config.logger.fps))
    elif output == 'wandb':
      outputs.append(WandBOutput(logdir, name='/'.join(
          str(logdir).split('/')[-2:])))
    elif output == 'terminal':
      pass  # Always included above.
    elif output == 'scope':
      pass  # Metrics viewer not bundled; jsonl covers the data.
    else:
      raise NotImplementedError(output)
  return Logger(step, outputs, multiplier)


def make_replay(config, folder, mode='train'):
  batlen = config.batch_length if mode == 'train' else config.report_length
  consec = config.consec_train if mode == 'train' else config.consec_report
  capacity = config.replay.size if mode == 'train' else config.replay.size / 10
  length = consec * batlen + config.replay_context
  assert config.batch_size * length <= capacity

  directory = Path(config.logdir) / folder
  if config.replicas > 1:
    directory = directory / f'{config.replica:05}'
  kwargs = dict(
      length=length, capacity=int(capacity), online=config.replay.online,
      chunksize=config.replay.chunksize, directory=directory)

  fracs = dict(config.replay.fracs)
  if fracs.get('uniform', 1.0) < 1 and mode == 'train':
    prio = dict(config.replay.prio)
    kwargs['selector'] = selectorlib.Mixture(dict(
        uniform=selectorlib.Uniform(),
        priority=selectorlib.Prioritized(**prio),
        recency=selectorlib.Recency(config.replay.recexp),
    ), fracs)
  return core.Replay(**kwargs)


def make_env(config, index, **overrides):
  suite, task = config.task.split('_', 1)
  ctor = ENV_CTORS[suite]
  if isinstance(ctor, str):
    module, cls = ctor.split(':')
    module = importlib.import_module(module)
    ctor = getattr(module, cls)
  kwargs = dict(dict(config.env).get(suite, {}))
  kwargs.update(overrides)
  if kwargs.pop('use_seed', False):
    kwargs['seed'] = hash((config.seed, index)) % (2 ** 32 - 1)
  if kwargs.pop('use_logdir', False):
    kwargs['logdir'] = Path(config.logdir) / f'env{index}'
  env = ctor(task, **kwargs)
  return wrap_env(env, config)


def wrap_env(env, config):
  for name, space in env.act_space.items():
    if not space.discrete:
      env = core.wrappers.NormalizeAction(env, name)
  env = core.wrappers.UnifyDtypes(env)
  env = core.wrappers.CheckSpaces(env)
  for name, space in env.act_space.items():
    if not space.discrete:
      env = core.wrappers.ClipAction(env, name)
  return env


def make_stream(config, replay, mode):
  length = config.batch_length if mode == 'train' else config.report_length
  consec = config.consec_train if mode == 'train' else config.consec_report
  # Validate the Consec window contract here, on the main thread, with the
  # config knobs in the message — the alternative is an opaque shape assert
  # deep inside a prefetch thread on the first sampled batch.
  need = consec * length + config.replay_context
  if replay.length < need:
    raise ValueError(
        f"Stream '{mode}' needs sampled windows of consec*length+context="
        f"{consec}*{length}+{config.replay_context}={need} steps, but the "
        f"replay it draws from stores sequences of {replay.length}. "
        f"Decrease report_length/consec_report or increase "
        f"batch_length/consec_train.")
  fn = bind(replay.sample, config.batch_size, mode)
  stream = streamlib.Stateless(fn)
  stream = streamlib.Consec(
      stream,
      length=length,
      consec=consec,
      prefix=config.replay_context,
      strict=(mode == 'train'),
      contiguous=True)
  return stream

