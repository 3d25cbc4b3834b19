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


# Peak dense bf16 TFLOP/s by device kind, for the MFU fields.
PEAKS = {
    'TPU v5 lite': 197e12,   # v5e
    'TPU v5e': 197e12,
    'TPU v5p': 459e12,
    'TPU v4': 275e12,
    'TPU v6 lite': 918e12,   # v6e / Trillium
}


def peak_flops(device):
  name = str(device)
  for kind, peak in PEAKS.items():
    if kind.lower() in name.lower():
      return peak
  return None


def build_agent(size='size12m', batch=16, length=64, kernel='',
                quick=False):
  """Build the flagship DreamerV3 agent on a dummy image env."""
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
      '--batch_size', str(batch),
      '--batch_length', str(length),
      '--jax.mesh', '1,1,1',
      '--jax.precompile', 'False',
  ]
  if kernel:
    overrides += ['--agent.dyn.rssm.kernel', kernel]
  if quick:
    config = common.assemble_config(
        path, ['--configs', 'debug'] + overrides +
        ['--batch_size', '4', '--batch_length', '8'])
  else:
    config = common.assemble_config(
        path, ['--configs', size] + overrides)

  parallel.setup(compute_dtype='bfloat16')

  env = Dummy('disc', size=(64, 64), length=100)
  obs_space = {k: v for k, v in env.obs_space.items()
               if not k.startswith('log/')}
  act_space = {k: v for k, v in env.act_space.items() if k != 'reset'}
  env.close()

  acfg = common.agent_config(config)
  model = Model(obs_space, act_space, acfg)
  agent = parallel.Agent(model, obs_space, act_space, acfg)
  return agent, model, config


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

  import numpy as np  # noqa: F401
  steps = 5 if args.quick else args.steps
  agent, model, config = build_agent(
      args.size, args.batch, args.length, args.kernel, args.quick)
  import jax

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

  # MFU from the XLA cost analysis of the same executable: achieved
  # FLOP/s over the device's dense bf16 peak.
  cost = agent.train_cost()
  flops = float(cost.get('flops', 0) or 0)
  peak = peak_flops(jax.devices()[0])
  tflops = flops * steps / dt / 1e12 if flops else 0.0
  mfu = (tflops * 1e12 / peak) if (flops and peak) else 0.0

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
      'gflop_per_step': round(flops / 1e9, 1),
      'tflops': round(tflops, 2),
      'mfu': round(mfu, 4),
  }

  # Attach recent size-sweep datapoints (runs/bench_r04.sh) so the
  # one-line artifact carries MFU across presets, not just the default.
  # Guarded by mtime so stale sweeps never masquerade as current: rerun
  # runs/bench_r04.sh to refresh them after code changes.
  sweep = {}
  for name in ('size50m', 'size200m'):
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        'runs', 'bench_r04', f'{name}.json')
    try:
      age_h = (time.time() - os.path.getmtime(path)) / 3600
      if age_h > 48:
        continue
      with open(path) as f:
        row = json.load(f)
      sweep[name] = {k: row[k] for k in
                     ('value', 'train_step_ms', 'params', 'mfu')}
      sweep[name]['age_hours'] = round(age_h, 1)
    except Exception:
      pass
  if sweep and not args.quick:
    result['sweep'] = sweep
  print(json.dumps(result))


if __name__ == '__main__':
  main()
