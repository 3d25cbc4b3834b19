"""Plot learning curves from scores.jsonl runs.

Capability parity: /root/reference/plot.py — loads runs (robust JSONL
reader, method/task regex filters), bins scores over steps (fixed count or
fixed binsize, shared or per-task x-limit), aggregates across seeds and
tasks, computes the reference's statistic suite (runs count, mean, median,
self-normalized mean/median, suite-normalized means from baselines.yaml
with 'auto' suite detection and the DMLab capped mean), and renders a grid
of per-task curves plus aggregate panels.

Structured as pure functions over a list-of-dict run table so the whole
pipeline is unit-testable without matplotlib (rendering is optional).

Usage:
  python plot.py --indirs ~/logdir/run1 ~/logdir/run2 --outdir /tmp/plots \
      --stats auto runs
"""

import argparse
import collections
import json
import os
import re

import numpy as np
import yaml


def load_run(path, xkeys=('step', 'xs'), ykeys=('score', 'ys')):
  """Robust JSONL reader: skips malformed lines, picks the first present
  x/y key pair."""
  records = []
  with open(path) as f:
    for line in f:
      line = line.strip()
      if not line:
        continue
      try:
        records.append(json.loads(line))
      except json.JSONDecodeError:
        print(f'Skipping invalid JSONL line in {path}')
  if not records:
    return None
  xkey = next((k for k in xkeys if k in records[0]), None)
  ykey = next((k for k in ykeys if k in records[0]), None)
  if not xkey or not ykey:
    return None
  xs = np.array([r[xkey] for r in records if ykey in r], np.float64)
  ys = np.array([r[ykey] for r in records if ykey in r], np.float64)
  return dict(
      task=records[0].get('task', os.path.basename(os.path.dirname(path))),
      method=records[0].get('method', 'unnamed'),
      seed=records[0].get('seed', 0),
      xs=xs, ys=ys)


def load_runs(indirs, methods='.*', tasks='.*', filename='scores.jsonl'):
  method_re = re.compile(methods)
  task_re = re.compile(tasks)
  runs = []
  for indir in indirs:
    for root, _, files in os.walk(os.path.expanduser(indir)):
      if filename not in files:
        continue
      run = load_run(os.path.join(root, filename))
      if run is None:
        continue
      if not method_re.search(run['method']):
        continue
      if not task_re.search(run['task']):
        continue
      runs.append(run)
  return runs


def bin_runs(runs, bins=30, binsize=None, xlim=None):
  """Histogram-average every run onto a shared per-task (or global) grid.

  Matches the reference semantics (/root/reference/plot.py:88-111): bin
  value = sum of scores in bin / count, NaN where empty; bin edges from 0
  to the task's max step (or the given xlim/binsize)."""
  out = []
  if xlim is None:
    xlims = collections.defaultdict(float)
    for run in runs:
      xlims[run['task']] = max(xlims[run['task']], float(run['xs'].max()))
  for run in runs:
    limit = xlim if xlim is not None else xlims[run['task']]
    size = binsize if binsize else limit / bins
    edges = np.arange(0, limit + 0.99 * size, size)
    sums = np.histogram(run['xs'], bins=edges, weights=run['ys'])[0]
    nums = np.histogram(run['xs'], bins=edges)[0]
    ys = np.divide(
        sums, nums, out=np.full(len(edges) - 1, np.nan), where=nums != 0)
    out.append(dict(run, xs=edges[1:], ys=ys))
  lengths = {len(r['xs']) for r in out}
  assert len(lengths) <= 1, f'Inconsistent bin counts: {lengths}'
  return out


def _common_domain(runs):
  """If tasks have different step ranges, place them on a unit domain."""
  first = runs[0]['xs']
  if all(np.array_equal(r['xs'], first) for r in runs):
    return runs
  domain = np.linspace(0, 1, len(first))
  return [dict(r, xs=domain) for r in runs]


def _seed_mean(runs):
  """Collapse seeds: one curve per (task, method)."""
  grouped = collections.defaultdict(list)
  for run in runs:
    grouped[(run['task'], run['method'])].append(run)
  out = []
  for (task, method), group in sorted(grouped.items()):
    xs = np.nanmean(np.stack([r['xs'] for r in group]), 0)
    with np.errstate(invalid='ignore'):
      ys = np.nanmean(np.stack([r['ys'] for r in group]), 0)
    out.append(dict(task=task, method=method, xs=xs, ys=ys))
  return out


def comp_stat(name, runs, fn, baseline=None):
  """Cross-task aggregate statistic, one curve per method.

  Seeds are averaged per task first, tasks optionally normalized by
  (lo, hi) baseline bounds, then `fn` reduces the task axis."""
  runs = _common_domain(runs)
  pertask = _seed_mean(runs)
  if baseline is not None:
    for run in pertask:
      lo, hi = baseline[run['task']]
      run['ys'] = (run['ys'] - lo) / (hi - lo)
  bymethod = collections.defaultdict(list)
  for run in pertask:
    bymethod[run['method']].append(run)
  out = []
  for method, group in sorted(bymethod.items()):
    xs = np.nanmean(np.stack([r['xs'] for r in group]), 0)
    ys = fn(np.stack([r['ys'] for r in group]))
    out.append(dict(name=name, method=method, xs=xs, ys=ys))
  return out


def comp_count(name, runs):
  """Number of live runs per bin, per method (across tasks and seeds)."""
  runs = _common_domain(runs)
  bymethod = collections.defaultdict(list)
  for run in runs:
    bymethod[run['method']].append(run)
  out = []
  for method, group in sorted(bymethod.items()):
    xs = np.nanmean(np.stack([r['xs'] for r in group]), 0)
    ys = np.isfinite(np.stack([r['ys'] for r in group])).sum(0)
    out.append(dict(name=name, method=method, xs=xs, ys=ys.astype(float)))
  return out


def self_baseline(runs):
  """Per-task (min, max) over all runs — the self-normalization bounds."""
  bounds = {}
  for run in runs:
    finite = run['ys'][np.isfinite(run['ys'])]
    if not len(finite):
      continue
    lo, hi = float(finite.min()), float(finite.max())
    if run['task'] in bounds:
      plo, phi = bounds[run['task']]
      bounds[run['task']] = (min(lo, plo), max(hi, phi))
    else:
      bounds[run['task']] = (lo, hi)
  return bounds


def auto_stats(tasks):
  """Suite-appropriate statistic selection (reference plot.py:163-173)."""
  if all(t.startswith('atari_') for t in tasks):
    return ['atari_mean', 'atari_median']
  if all(t.startswith('dmc_') for t in tasks):
    return ['mean', 'median']
  if all(t.startswith('dmlab_') for t in tasks):
    return ['dmlab_mean', 'dmlab_mean_capped']
  if all(t.startswith('procgen_') for t in tasks):
    return ['procgen_mean']
  return ['mean', 'median']


def _strip_suite(baseline, tasks):
  """Index baselines by the plotted task names (with/without suite prefix)."""
  out = {}
  for task in tasks:
    if task in baseline:
      out[task] = baseline[task]
      continue
    bare = task.split('_', 1)[-1]
    if bare in baseline:
      out[task] = baseline[bare]
  return out


def compute_stats(runs, stats, baselines=None):
  """The reference's statistic suite over binned runs."""
  baselines = baselines or {}
  tasks = sorted({r['task'] for r in runs})
  choices = [s for s in stats if s != 'none']
  if 'auto' in choices:
    choices.remove('auto')
    choices += auto_stats(tasks)
  ref = lambda suite: _strip_suite(baselines.get(suite, {}), tasks)
  mean0 = lambda ys: np.nanmean(ys, 0)
  median0 = lambda ys: np.nanmedian(ys, 0)
  capped0 = lambda ys: np.nanmean(np.minimum(ys, 1), 0)
  out = []
  for stat in choices:
    if stat == 'runs':
      out += comp_count('Runs', runs)
    elif stat == 'mean':
      out += comp_stat('Mean', runs, mean0)
    elif stat == 'median':
      out += comp_stat('Median', runs, median0)
    elif stat == 'self_mean':
      out += comp_stat('Self Mean', runs, mean0, self_baseline(runs))
    elif stat == 'self_median':
      out += comp_stat('Self Median', runs, median0, self_baseline(runs))
    elif stat == 'atari_mean':
      out += comp_stat('Gamer Mean', runs, mean0, ref('atari57_gamer'))
    elif stat == 'atari_median':
      out += comp_stat('Gamer Median', runs, median0, ref('atari57_gamer'))
    elif stat == 'dmlab_mean':
      out += comp_stat('Capped Mean', runs, mean0, ref('dmlab30'))
    elif stat == 'dmlab_mean_capped':
      out += comp_stat('Capped Mean', runs, capped0, ref('dmlab30'))
    elif stat == 'procgen_mean':
      out += comp_stat('Normalized Mean', runs, mean0, ref('procgen_hard'))
    else:
      raise ValueError(stat)
  return out


def summarize(runs, stats, tail_frac=0.1):
  """Final-performance table: tail-of-training mean per curve."""
  tail = lambda ys: float(np.nanmean(ys[-max(1, int(len(ys) * tail_frac)):]))
  summary = {}
  for run in _seed_mean(runs):
    summary[f"{run['task']}/{run['method']}"] = tail(run['ys'])
  for stat in stats or []:
    summary[f"stat/{stat['name']}/{stat['method']}"] = tail(stat['ys'])
  return summary


def render(runs, stats, outpath, cols=4):
  """Grid of per-task curves (seed mean +/- std) plus aggregate panels."""
  import matplotlib
  matplotlib.use('Agg')
  import matplotlib.pyplot as plt

  bytask = collections.defaultdict(lambda: collections.defaultdict(list))
  for run in runs:
    bytask[run['task']][run['method']].append(run)
  bystat = collections.defaultdict(lambda: collections.defaultdict(list))
  for stat in stats or []:
    bystat[stat['name']][stat['method']].append(stat)

  panels = len(bytask) + len(bystat)
  cols = min(cols, max(panels, 1))
  rows = -(-panels // cols)
  fig, axes = plt.subplots(
      rows, cols, figsize=(4 * cols, 3 * rows), squeeze=False)
  index = 0
  for title, methods in (
      list(sorted(bytask.items())) + list(sorted(bystat.items()))):
    ax = axes[index // cols][index % cols]
    for method, group in sorted(methods.items()):
      xs = group[0]['xs']
      curves = np.stack([g['ys'] for g in group])
      with np.errstate(invalid='ignore'):
        mean = np.nanmean(curves, 0)
      # Bins with no episodes are NaN; drop them so curves stay connected
      # (episodes arrive in bursts relative to the binning grid).
      keep = ~np.isnan(mean) & ~np.isnan(xs)
      ax.plot(xs[keep], mean[keep], label=method)
      if len(curves) > 1:
        std = np.nanstd(curves, 0)
        ax.fill_between(xs[keep], (mean - std)[keep], (mean + std)[keep],
                        alpha=0.2)
    ax.set_title(title)
    ax.legend(fontsize=7)
    index += 1
  for i in range(index, rows * cols):
    axes[i // cols][i % cols].axis('off')
  fig.tight_layout()
  fig.savefig(outpath, dpi=120)
  plt.close(fig)


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--indirs', nargs='+', required=True)
  parser.add_argument('--outdir', default='/tmp/plots')
  parser.add_argument('--bins', type=int, default=30)
  parser.add_argument('--binsize', type=float, default=0)
  parser.add_argument('--xlim', type=float, default=0)
  parser.add_argument('--methods', default='.*')
  parser.add_argument('--tasks', default='.*')
  parser.add_argument(
      '--stats', nargs='*', default=['auto', 'runs'],
      help='none auto runs mean median self_mean self_median atari_mean '
           'atari_median dmlab_mean dmlab_mean_capped procgen_mean')
  args = parser.parse_args()

  baselines = {}
  path = os.path.join(os.path.dirname(__file__), 'baselines.yaml')
  if os.path.exists(path):
    with open(path) as f:
      baselines = yaml.safe_load(f)

  runs = load_runs(args.indirs, args.methods, args.tasks)
  if not runs:
    print('No scores.jsonl files found.')
    return
  print(f'Loaded {len(runs)} runs.')
  runs = bin_runs(
      runs, args.bins, args.binsize or None, args.xlim or None)
  stats = compute_stats(runs, args.stats, baselines)
  summary = summarize(runs, stats)

  os.makedirs(args.outdir, exist_ok=True)
  try:
    render(runs, stats, os.path.join(args.outdir, 'curves.png'))
    print('Wrote', os.path.join(args.outdir, 'curves.png'))
  except ImportError:
    print('matplotlib unavailable; writing summary only')
  with open(os.path.join(args.outdir, 'summary.json'), 'w') as f:
    json.dump(summary, f, indent=2)
  print(json.dumps(summary, indent=2))


if __name__ == '__main__':
  main()
