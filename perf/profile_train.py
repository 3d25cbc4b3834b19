"""Capture an xprof op profile of the DreamerV3 train step on TPU.

Usage: python perf/profile_train.py [--size size12m] [--steps 8] [--out DIR]
Prints the top op categories by device time with MXU utilization.
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--size', default='size12m')
  parser.add_argument('--steps', type=int, default=8)
  parser.add_argument('--batch', type=int, default=16)
  parser.add_argument('--length', type=int, default=64)
  parser.add_argument('--out', default='/tmp/xprof_train')
  parser.add_argument('--top', type=int, default=25)
  args = parser.parse_args()

  from embodied_tpu.models import common
  from embodied_tpu.models.dreamerv3.model import Model
  from embodied_tpu import parallel
  from embodied_tpu.envs import Dummy

  path = os.path.join(
      os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
      'embodied_tpu', 'models', 'dreamerv3', 'configs.yaml')
  config = common.assemble_config(path, [
      '--configs', args.size,
      '--task', 'dummy_disc', '--logdir', '/tmp/bench',
      '--batch_size', str(args.batch), '--batch_length', str(args.length),
      '--jax.mesh', '1,1,1', '--jax.precompile', 'False'])

  parallel.setup(compute_dtype='bfloat16')
  import jax

  env = Dummy('disc', size=(64, 64), length=100)
  obs_space = {k: v for k, v in env.obs_space.items()
               if not k.startswith('log/')}
  act_space = {k: v for k, v in env.act_space.items() if k != 'reset'}
  env.close()
  acfg = common.agent_config(config)
  model = Model(obs_space, act_space, acfg)
  agent = parallel.Agent(model, obs_space, act_space, acfg)
  B, L = agent.batch_size, agent.batch_length
  data = agent._example_batch(B, L + agent.replay_context)
  data['is_first'][:, 0] = True
  data = agent._device_batch(data)
  carry = agent.init_train(B)
  for _ in range(3):
    carry, outs, mets = agent.train(carry, dict(data))
  jax.block_until_ready(agent.store)

  os.system(f'rm -rf {args.out}')
  with jax.profiler.trace(args.out):
    for _ in range(args.steps):
      carry, outs, mets = agent.train(carry, dict(data))
    jax.block_until_ready(agent.store)

  os.environ['PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION'] = 'python'
  from xprof.convert import raw_to_tool_data as rtd
  files = glob.glob(f'{args.out}/plugins/profile/*/*.xplane.pb')
  data, _ = rtd.xspace_to_tool_data(files, 'op_profile', {})
  data = json.loads(data) if isinstance(data, (str, bytes)) else data

  rows = []
  def walk(node, path):
    kids = node.get('children', [])
    m = node.get('metrics', {})
    if not kids and m.get('rawTime'):
      rows.append((
          m.get('rawTime', 0), m.get('flops', 0) * 100,
          node.get('name', '?'), path))
    for ch in kids:
      walk(ch, path if not node.get('name') else
           path + '/' + node.get('name', ''))
  top = data.get('byProgram', data)
  walk(top if isinstance(top, dict) else {}, '')
  total = sum(r[0] for r in rows)
  rows.sort(reverse=True)
  print(f'total device time {total:.3g}, top {args.top} leaves:')
  for t, mxu, name, path in rows[:args.top]:
    cat = '/'.join(path.split('/')[-2:])
    print(f'  {100*t/total:5.1f}%  mxu={mxu:5.1f}%  {name[:90]}  [{cat[:40]}]')


if __name__ == '__main__':
  main()
