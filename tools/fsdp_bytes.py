"""Cost-model experiment: which sharding cuts per-device weight streaming?

The size200m roofline analysis (COVERAGE.md round-4 notes) says the
observe scan is bandwidth-bound because every BPTT step re-streams the
RSSM weights from HBM, and that sharding the weights over more chips is
the fix. This script tests WHICH sharding actually delivers that on the
virtual CPU mesh: compile the FULL train step on a 1-device mesh, an
8-way FSDP mesh (d,f,t = 1,8,1), and an 8-way tensor-parallel mesh
(1,1,8), and compare XLA's per-device cost analysis ('bytes accessed',
'flops' — the SPMD partitioner emits a per-device program, so both are
per-device numbers).

What the numbers showed (runs/bench_r05/fsdp_bytes_size200m.json):
per-device FLOPs divide ~6x under BOTH shardings, but bytes accessed
moves only ~1.1-1.2x either way — XLA's bytes-accessed metric sums
every HLO operand/result and is dominated by activation traffic, so it
cannot isolate the scan's weight re-streaming. The experiment that
does isolate it is ops/qcore.py: the int8 window keeps the weights
VMEM-resident for the whole window, removing the per-step re-streaming
directly, and its measured on-chip win bounds the weight-streaming
share (see COVERAGE.md round-5 notes).

Usage (CPU virtual devices; run nice'd — compiles are heavy):
  python tools/fsdp_bytes.py --size size200m [--out runs/fsdp_bytes.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()


def measure(size, mesh, batch, length):
  # Same workaround as __graft_entry__.dryrun_multichip: the axon plugin
  # in this image overrides JAX_PLATFORMS, so pin the platform through
  # jax.config before any backend initializes.
  import jax
  jax.config.update('jax_platforms', 'cpu')
  assert len(jax.devices()) >= 8, jax.devices()
  from bench import build_agent
  # Cost analysis only — the production transfer-guard discipline (set up
  # by build_agent) does not apply to this offline tool.
  import embodied_tpu.parallel as par
  orig = par.setup
  def relaxed(*a, **kw):
    out = orig(*a, **kw)
    jax.config.update('jax_transfer_guard', 'allow')
    return out
  par.setup = relaxed
  agent, model, config = build_agent(size, batch, length, mesh=mesh)
  del model, config
  cost = agent.train_cost()
  out = {
      'mesh': mesh,
      'flops_per_device': float(cost.get('flops', 0) or 0),
      'bytes_per_device': float(cost.get('bytes accessed', 0) or 0),
  }
  params_bytes = sum(
      v.nbytes for k, v in agent.store.items()
      if agent.meta.get(k) == 'param')
  out['param_bytes_total'] = int(params_bytes)
  return out


def run_one(size, mesh, batch, length):
  # Each mesh needs a fresh process: build_agent installs the global mesh.
  import subprocess
  code = (
      'import sys, json; sys.path.insert(0, %r); '
      'from tools.fsdp_bytes import measure; '
      'print("RESULT " + json.dumps(measure(%r, %r, %r, %r)))'
  ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
       size, mesh, batch, length)
  proc = subprocess.run(
      [sys.executable, '-c', code], capture_output=True, text=True)
  for line in proc.stdout.splitlines():
    if line.startswith('RESULT '):
      return json.loads(line[len('RESULT '):])
  raise RuntimeError(proc.stdout[-2000:] + proc.stderr[-2000:])


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--size', default='size12m')
  parser.add_argument('--batch', type=int, default=8)
  parser.add_argument('--length', type=int, default=32)
  parser.add_argument('--out', default='')
  parser.add_argument('--meshes', default='1,1,1;1,8,1;1,1,8',
                      help='semicolon-separated d,f,t mesh specs; the '
                           'first is the baseline')
  args = parser.parse_args()

  results = {}
  for mesh in args.meshes.split(';'):
    results[mesh] = run_one(args.size, mesh, args.batch, args.length)
    print(mesh, results[mesh])
  base = results[args.meshes.split(';')[0]]
  summary = dict(
      size=args.size, batch=args.batch, length=args.length, runs=results)
  for mesh, row in results.items():
    if row is base or 'error' in row:
      continue
    summary[f'bytes_reduction[{mesh}]'] = round(
        base['bytes_per_device'] / max(row['bytes_per_device'], 1), 2)
    summary[f'flops_reduction[{mesh}]'] = round(
        base['flops_per_device'] / max(row['flops_per_device'], 1), 2)
  line = json.dumps(summary, indent=2)
  print(line)
  if args.out:
    with open(args.out, 'w') as f:
      f.write(line + '\n')


if __name__ == '__main__':
  main()
