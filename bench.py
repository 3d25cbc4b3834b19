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
                quick=False, mesh='1,1,1'):
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
      '--jax.mesh', mesh,
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


def run_bench(size, batch, length, kernel='', quick=False, steps=60):
  """Measure one (size, batch) point; returns the result dict."""
  agent, model, config = build_agent(size, batch, length, kernel, quick)
  del model, config
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

  return {
      'metric': 'dreamerv3_train_frames_per_s',
      'value': round(frames_per_s, 2),
      'unit': 'frames/s',
      'vs_baseline': round(vs_baseline, 3),
      'train_step_ms': round(step_ms, 2),
      'implied_crafter_env_steps_per_s': round(frames_per_s / 512, 2),
      'params': int(params),
      'batch': B,
      'length': L,
      'size': 'debug' if quick else size,
      'device': str(jax.devices()[0]),
      'gflop_per_step': round(flops / 1e9, 1),
      'tflops': round(tflops, 2),
      'mfu': round(mfu, 4),
  }


# The batch x size matrix for --sweep: the bandwidth-roofline analysis
# predicts MFU climbs with batch (weights amortize over more rows).
SWEEP = [
    ('size12m', 16), ('size12m', 64), ('size12m', 128),
    ('size50m', 16), ('size50m', 64), ('size50m', 128),
    ('size200m', 16), ('size200m', 64), ('size200m', 128),
]


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--quick', action='store_true')
  parser.add_argument('--size', default='size12m')
  parser.add_argument('--steps', type=int, default=60)
  parser.add_argument('--batch', type=int, default=16)
  parser.add_argument('--length', type=int, default=64)
  parser.add_argument('--kernel', default='',
                      help="override dyn.rssm.kernel: auto|fused|off")
  parser.add_argument('--sweep', default='',
                      help='measure the full batch x size matrix in this '
                           'session and write the results to this path')
  args = parser.parse_args()

  if args.sweep:
    # Every entry measured in THIS session on THIS device; one
    # subprocess per point so each agent gets a clean runtime.
    import subprocess
    rows = []
    for size, batch in SWEEP:
      steps = max(10, int(args.steps * 16 / batch))
      code = (
          'import sys, json; sys.path.insert(0, %r); import bench; '
          'print("ROW " + json.dumps(bench.run_bench(%r, %r, %r, '
          'steps=%r)))' % (
              os.path.dirname(os.path.abspath(__file__)),
              size, batch, args.length, steps))
      row = None
      # The tunnel can refuse registration for ~1-2 min after the
      # previous process releases the chip; retry before recording
      # a failure.
      for attempt in range(3):
        proc = subprocess.run(
            [sys.executable, '-c', code], capture_output=True, text=True)
        for line in proc.stdout.splitlines():
          if line.startswith('ROW '):
            row = json.loads(line[4:])
        if row is not None:
          break
        if 'RESOURCE_EXHAUSTED' in proc.stderr or 'OOM' in proc.stderr:
          break  # A real out-of-memory is a result, not a flake.
        time.sleep(90)
      if row is None:
        row = {'size': size, 'batch': batch,
               'error': (proc.stdout + proc.stderr)[-400:]}
      rows.append(row)
      print(json.dumps(row))
    with open(args.sweep, 'w') as f:
      json.dump({'session_time': time.strftime('%Y-%m-%dT%H:%M:%S'),
                 'rows': rows}, f, indent=2)
    return

  result = run_bench(
      args.size, args.batch, args.length, args.kernel, args.quick,
      steps=5 if args.quick else args.steps)
  print(json.dumps(result))


if __name__ == '__main__':
  main()
