"""Benchmark: DreamerV3 train-step throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
The metric is replayed frames per second through the jitted train step
(batch * length * steps / wall), the direct driver of env-steps/s for a
given train_ratio. Extras report the implied Crafter env-steps/s
(train_ratio 512) and model size.

Run with --quick for a fast smoke (tiny model), default is size12m at the
reference's default batch 16 x length 64 (configs.yaml:10-12).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--quick', action='store_true')
  parser.add_argument('--size', default='size12m')
  parser.add_argument('--steps', type=int, default=60)
  parser.add_argument('--batch', type=int, default=16)
  parser.add_argument('--length', type=int, default=64)
  parser.add_argument('--kernel', default='',
                      help="override dyn.rssm.kernel: auto|fused|off")
  args = parser.parse_args()

  import numpy as np
  from embodied_tpu.models import common
  from embodied_tpu.models.dreamerv3.model import Model
  from embodied_tpu import parallel
  from embodied_tpu.envs import Dummy

  path = os.path.join(
      os.path.dirname(os.path.abspath(__file__)),
      'embodied_tpu', 'models', 'dreamerv3', 'configs.yaml')
  overrides = [
      '--task', 'dummy_disc',
      '--logdir', '/tmp/bench',
      '--batch_size', str(args.batch),
      '--batch_length', str(args.length),
      '--jax.mesh', '1,1,1',
      '--jax.precompile', 'False',
  ]
  if args.kernel:
    overrides += ['--agent.dyn.rssm.kernel', args.kernel]
  if args.quick:
    config = common.assemble_config(
        path, ['--configs', 'debug'] + overrides +
        ['--batch_size', '4', '--batch_length', '8'])
    steps = 5
  else:
    config = common.assemble_config(
        path, ['--configs', args.size] + overrides)
    steps = args.steps

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

  B = agent.batch_size
  L = agent.batch_length
  data = agent._example_batch(B, L + agent.replay_context)
  data['is_first'][:, 0] = True
  data = agent._device_batch(data)
  carry = agent.init_train(B)

  # Warmup (compile + 2 steps).
  for _ in range(3):
    carry, outs, mets = agent.train(carry, dict(data))
  jax.block_until_ready(agent.store)

  t0 = time.perf_counter()
  for _ in range(steps):
    carry, outs, mets = agent.train(carry, dict(data))
  jax.block_until_ready(agent.store)
  dt = time.perf_counter() - t0

  frames_per_s = steps * B * L / dt
  step_ms = 1000 * dt / steps
  params = sum(v.size for k, v in agent.store.items()
               if agent.meta.get(k) == 'param')

  baseline_path = os.path.join(
      os.path.dirname(os.path.abspath(__file__)), 'BENCH_baseline.json')
  vs_baseline = 1.0
  if os.path.exists(baseline_path):
    try:
      with open(baseline_path) as f:
        base = json.load(f)
      if base.get('value'):
        vs_baseline = frames_per_s / float(base['value'])
    except Exception:
      pass

  result = {
      'metric': 'dreamerv3_train_frames_per_s',
      'value': round(frames_per_s, 2),
      'unit': 'frames/s',
      'vs_baseline': round(vs_baseline, 3),
      'train_step_ms': round(step_ms, 2),
      'implied_crafter_env_steps_per_s': round(frames_per_s / 512, 2),
      'params': int(params),
      'batch': B,
      'length': L,
      'size': 'debug' if args.quick else args.size,
      'device': str(jax.devices()[0]),
  }
  print(json.dumps(result))


if __name__ == '__main__':
  main()
