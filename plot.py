"""Plot learning curves from scores.jsonl runs.

Capability parity: /root/reference/plot.py — loads runs, bins scores over
steps, aggregates across seeds (mean/median and normalized stats using the
random/human bounds in baselines.yaml), and renders a grid of curves.

Usage:
  python plot.py --indirs ~/logdir/run1 ~/logdir/run2 --outdir /tmp/plots
"""

import argparse
import collections
import json
import os

import numpy as np
import yaml


def load_runs(indirs):
  runs = []
  for indir in indirs:
    for root, _, files in os.walk(os.path.expanduser(indir)):
      if 'scores.jsonl' not in files:
        continue
      records = []
      with open(os.path.join(root, 'scores.jsonl')) as f:
        for line in f:
          line = line.strip()
          if line:
            records.append(json.loads(line))
      if not records:
        continue
      task = records[0].get('task', os.path.basename(root))
      method = records[0].get('method', 'unnamed')
      seed = records[0].get('seed', 0)
      steps = np.array([r['step'] for r in records], np.float64)
      scores = np.array([r["score"] for r in records], np.float64)
      runs.append(dict(
          task=task, method=method, seed=seed, steps=steps, scores=scores))
  return runs


def binned(steps, scores, borders):
  order = np.argsort(steps)
  steps, scores = steps[order], scores[order]
  binned_scores = []
  for start, stop in zip(borders[:-1], borders[1:]):
    mask = (steps >= start) & (steps < stop)
    binned_scores.append(scores[mask].mean() if mask.any() else np.nan)
  return np.array(binned_scores)


def normalize(task, score, baselines, suite='atari57_gamer'):
  bounds = baselines.get(suite, {}).get(task)
  if not bounds:
    return score
  lo, hi = bounds
  return (score - lo) / (hi - lo)


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--indirs', nargs='+', required=True)
  parser.add_argument('--outdir', default='/tmp/plots')
  parser.add_argument('--bins', type=int, default=30)
  parser.add_argument('--norm', default='', help='baseline suite key')
  args = parser.parse_args()

  baselines = {}
  path = os.path.join(os.path.dirname(__file__), 'baselines.yaml')
  if os.path.exists(path):
    with open(path) as f:
      baselines = yaml.safe_load(f)

  runs = load_runs(args.indirs)
  if not runs:
    print('No scores.jsonl files found.')
    return
  print(f'Loaded {len(runs)} runs.')

  bytask = collections.defaultdict(list)
  for run in runs:
    bytask[run['task']].append(run)

  try:
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
  except ImportError:
    print('matplotlib unavailable; writing summary only')
    plt = None

  os.makedirs(args.outdir, exist_ok=True)
  summary = {}
  ncols = min(4, len(bytask))
  nrows = -(-len(bytask) // ncols)
  if plt:
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(4 * ncols, 3 * nrows), squeeze=False)
  for i, (task, task_runs) in enumerate(sorted(bytask.items())):
    maxstep = max(run['steps'].max() for run in task_runs)
    borders = np.linspace(0, maxstep, args.bins + 1)
    centers = (borders[:-1] + borders[1:]) / 2
    bymethod = collections.defaultdict(list)
    for run in task_runs:
      curve = binned(run['steps'], run['scores'], borders)
      if args.norm:
        curve = normalize(task, curve, baselines, args.norm)
      bymethod[run['method']].append(curve)
    for method, curves in bymethod.items():
      curves = np.stack(curves)
      mean = np.nanmean(curves, 0)
      summary[f'{task}/{method}'] = float(np.nanmean(mean[-max(1, len(mean) // 10):]))
      if plt:
        ax = axes[i // ncols][i % ncols]
        ax.plot(centers, mean, label=method)
        if len(curves) > 1:
          std = np.nanstd(curves, 0)
          ax.fill_between(centers, mean - std, mean + std, alpha=0.2)
        ax.set_title(task)
        ax.legend(fontsize=7)
  if plt:
    fig.tight_layout()
    out = os.path.join(args.outdir, 'curves.png')
    fig.savefig(out, dpi=120)
    print('Wrote', out)
  with open(os.path.join(args.outdir, 'summary.json'), 'w') as f:
    json.dump(summary, f, indent=2)
  print(json.dumps(summary, indent=2))


if __name__ == '__main__':
  main()
