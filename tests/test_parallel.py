"""Actor-learner system test: all roles on one machine over real sockets.

Mirrors the reference's strategy (/root/reference/embodied/tests/
test_parallel.py): the topology is real (processes, sockets, batching
server), only colocated.
"""

import json
import multiprocessing as mp
import os
import time

import pytest

from embodied_tpu import remote

pytestmark = pytest.mark.slow


def _run_combined(logdir):
  # Runs in a child process so that daemon threads die with it.
  import numpy as np
  from embodied_tpu import core
  from embodied_tpu.core import streams
  from embodied_tpu.envs import Dummy
  from embodied_tpu.run import parallel_impl
  from embodied_tpu.utils import Config, Counter, Logger, TerminalOutput

  envs = 4
  args = Config(
      logdir=logdir,
      steps=1e5,
      duration=15,
      train_ratio=4.0,
      log_every=2.0,
      report_every=1e9,
      save_every=5.0,
      envs=envs,
      eval_envs=0,
      eval_eps=1,
      report_batches=1,
      from_checkpoint='',
      episode_timeout=60,
      actor_addr=f'localhost:{remote.free_port()}',
      replay_addr=f'localhost:{remote.free_port()}',
      logger_addr=f'localhost:{remote.free_port()}',
      actor_batch=2,
      actor_threads=1,
      remote_replay=False,
      remote_envs=False,
      usage={'psutil': False},
      debug=True,
      batch_size=4,
      batch_length=8,
      report_length=8,
      consec_train=1,
      consec_report=1,
      replay_context=0,
      replica=0,
      replicas=1,
  )

  def make_env(i):
    return Dummy('disc', size=(8, 8), length=20)

  def make_agent():
    import utils as test_utils
    env = make_env(0)
    agent = test_utils.TestAgent(env.obs_space, env.act_space)
    env.close()
    return agent

  def make_replay(mode='train'):
    return core.Replay(length=args.batch_length, capacity=1e4, chunksize=64)

  def make_stream(replay, mode):
    return streams.Stateless(
        lambda: replay.sample(args.batch_size, mode))

  def make_logger():
    return Logger(Counter(), [TerminalOutput(limit=6)])

  parallel_impl.combined(
      make_agent, lambda: make_replay('train'), lambda: make_replay('eval'),
      make_env, make_env, make_stream, make_logger, args)


def _run_combined_dreamer(logdir):
  # Full actor-learner system with the real jitted DreamerV3 agent in
  # latent-table mode: the actor thread scatters policy latents while the
  # learner thread donates the same tables, and slot/slotgen columns ride
  # the RPC replay service instead of latent payloads.
  import os
  os.environ.pop('JAX_PLATFORMS', None)
  import jax
  jax.config.update('jax_platforms', 'cpu')
  from embodied_tpu.models import common
  from embodied_tpu.models.dreamerv3 import main as dv3_main

  path = os.path.join(os.path.dirname(dv3_main.__file__), 'configs.yaml')
  config = common.assemble_config(path, [
      '--configs', 'debug',
      '--script', 'parallel',
      '--task', 'dummy_disc',
      '--logdir', logdir,
      '--batch_size', '4',
      '--batch_length', '8',
      '--run.train_ratio', '4',
      '--run.duration', '25',
      '--run.envs', '2',
      '--run.eval_envs', '0',
      '--run.log_every', '5',
      '--run.save_every', '10',
      '--run.report_every', '1e9',
      '--jax.platform', '',
      '--jax.mesh', '1,1,1',
  ])
  common.run_script(config, dv3_main.make_agent)


def _run_remote_replay_dreamer(logdir, script, addrs):
  # Split-machine deployment: the replay service runs as its own process
  # (script=parallel_replay) while combined() runs agent+logger+envs with
  # run.remote_replay=True. Slot/slotgen columns cross the machine
  # boundary through add_batch/sample_batch RPCs.
  import os
  os.environ.pop('JAX_PLATFORMS', None)
  import jax
  jax.config.update('jax_platforms', 'cpu')
  from embodied_tpu.models import common
  from embodied_tpu.models.dreamerv3 import main as dv3_main

  path = os.path.join(os.path.dirname(dv3_main.__file__), 'configs.yaml')
  config = common.assemble_config(path, [
      '--configs', 'debug',
      '--script', script,
      '--task', 'dummy_disc',
      '--logdir', logdir,
      '--batch_size', '4',
      '--batch_length', '8',
      '--run.train_ratio', '4',
      '--run.duration', '90',
      '--run.envs', '2',
      '--run.eval_envs', '0',
      '--run.log_every', '3',
      '--run.save_every', '10',
      '--run.report_every', '1e9',
      '--run.remote_replay', 'True',
      '--run.actor_addr', addrs['actor'],
      '--run.replay_addr', addrs['replay'],
      '--run.logger_addr', addrs['logger'],
      '--jax.platform', '',
      '--jax.mesh', '1,1,1',
  ])
  common.run_script(config, dv3_main.make_agent)


class TestParallel:

  def test_remote_replay_first_visit_context_valid(self, tmp_path):
    # In split-machine mode (remote replay service), the FIRST training
    # visit of every step must already find a valid context latent in the
    # learner's device table: the actor scatters policy latents in-graph,
    # so only the 4-byte slot ids round-trip through the remote replay.
    from embodied_tpu import remote
    logdir = str(tmp_path)
    addrs = {k: f'localhost:{remote.free_port()}'
             for k in ('actor', 'replay', 'logger')}
    ctx = mp.get_context('spawn')
    replay_proc = ctx.Process(
        target=_run_remote_replay_dreamer,
        args=(logdir, 'parallel_replay', addrs))
    main_proc = ctx.Process(
        target=_run_remote_replay_dreamer,
        args=(logdir, 'parallel', addrs))
    replay_proc.start()
    main_proc.start()
    main_proc.join(timeout=420)
    try:
      if main_proc.is_alive():
        main_proc.terminate()
        main_proc.join(10)
        raise AssertionError('remote-replay dreamer run did not stop')
      metrics = []
      with open(os.path.join(logdir, 'metrics.jsonl')) as f:
        for line in f:
          metrics.append(json.loads(line))
      valids = [m['train/latents/valid'] for m in metrics
                if 'train/latents/valid' in m]
      assert valids, [sorted(m) for m in metrics[:3]]
      # Every trained step was policy-visited exactly in this process, so
      # its table entry must be live on first visit.
      assert min(valids) >= 0.99, valids
    finally:
      if replay_proc.is_alive():
        replay_proc.terminate()
        replay_proc.join(10)

  def test_combined_roles_dreamer_latent_table(self, tmp_path):
    logdir = str(tmp_path)
    ctx = mp.get_context('spawn')
    proc = ctx.Process(target=_run_combined_dreamer, args=(logdir,))
    proc.start()
    proc.join(timeout=240)
    if proc.is_alive():
      proc.terminate()
      proc.join(10)
      raise AssertionError('parallel dreamer run did not stop in time')
    files = os.listdir(logdir)
    assert 'agent.pkl' in files, files

  def test_combined_roles(self, tmp_path):
    logdir = str(tmp_path)
    ctx = mp.get_context('spawn')
    proc = ctx.Process(target=_run_combined, args=(logdir,))
    proc.start()
    proc.join(timeout=90)
    if proc.is_alive():
      proc.terminate()
      proc.join(10)
      raise AssertionError('combined() did not stop within its duration')
    # The roles must have saved their checkpoints, proving the full loop
    # (env -> actor -> replay -> learner -> logger) executed.
    files = os.listdir(logdir)
    assert 'agent.pkl' in files, files
    assert 'replay.pkl' in files, files
    assert 'logger.pkl' in files, files


class TestRPC:

  def test_client_server_roundtrip(self):
    port = remote.free_port()
    server = remote.Server(port, 'TestServer')
    server.bind('double', lambda x: {'y': x['x'] * 2})
    server.start(block=False)
    try:
      import numpy as np
      client = remote.Client(port, 'TestClient', connect=True)
      out = client.call('double', {'x': np.arange(4)}).result(timeout=10)
      assert (out['y'] == np.arange(4) * 2).all()
      # Unknown method surfaces an error.
      with pytest.raises(RuntimeError):
        client.call('nosuch').result(timeout=10)
      client.close()
    finally:
      server.close()

  def test_batch_server(self):
    import numpy as np
    port = remote.free_port()
    server = remote.BatchServer(port, 'TestBatch')
    seen = []

    def workfn(obs):
      assert obs['v'].shape == (3,)
      return {'out': obs['v'] * 10}, {'sum': obs['v'].sum()}

    def postfn(extra):
      seen.append(extra['sum'])

    server.bind('act', workfn, postfn, batch=3, workers=1)
    server.start(block=False)
    try:
      clients = [
          remote.Client(port, f'C{i}', connect=True) for i in range(3)]
      futures = [
          c.call('act', {'v': np.int64(i)}) for i, c in enumerate(clients)]
      results = [f.result(timeout=15) for f in futures]
      outs = sorted(int(r['out']) for r in results)
      assert outs == [0, 10, 20]
      time.sleep(0.2)
      assert seen and int(seen[0]) == 3
      [c.close() for c in clients]
    finally:
      server.close()
