"""Plotter aggregation-statistics parity on synthetic scores.jsonl runs.

Covers the reference feature list (/root/reference/plot.py): robust JSONL
loading with method/task filters, histogram binning, cross-seed and
cross-task aggregation, self-normalized stats, suite-normalized stats from
baselines.yaml with 'auto' selection, the DMLab capped mean, and the runs
counter.
"""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    'plotmod', os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'plot.py'))
plot = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(plot)


def write_run(root, task, method, seed, steps, scores):
  rundir = root / f'{task}-{method}-{seed}'
  rundir.mkdir(parents=True, exist_ok=True)
  with open(rundir / 'scores.jsonl', 'w') as f:
    for step, score in zip(steps, scores):
      f.write(json.dumps(dict(
          task=task, method=method, seed=seed, step=step,
          score=float(score))) + '\n')
  return rundir


@pytest.fixture
def rundir(tmp_path):
  steps = list(range(0, 1000, 50))
  for task, base in (('dmc_walker', 100.0), ('dmc_hopper', 50.0)):
    for method in ('ours', 'baseline'):
      for seed in (0, 1):
        gain = 2.0 if method == 'ours' else 1.0
        noise = np.random.default_rng(seed).normal(0, 1, len(steps))
        scores = base + gain * np.arange(len(steps)) + noise
        write_run(tmp_path, task, method, seed, steps, scores)
  return tmp_path


class TestLoading:

  def test_loads_all_runs(self, rundir):
    runs = plot.load_runs([str(rundir)])
    assert len(runs) == 8
    keys = {(r['task'], r['method'], r['seed']) for r in runs}
    assert len(keys) == 8

  def test_method_and_task_filters(self, rundir):
    runs = plot.load_runs([str(rundir)], methods='^ours$')
    assert len(runs) == 4
    runs = plot.load_runs([str(rundir)], tasks='walker')
    assert len(runs) == 4
    assert all(r['task'] == 'dmc_walker' for r in runs)

  def test_robust_reader_skips_bad_lines(self, tmp_path):
    rdir = write_run(tmp_path, 't', 'm', 0, [0, 100], [1.0, 2.0])
    with open(rdir / 'scores.jsonl', 'a') as f:
      f.write('this is not json\n')
      f.write(json.dumps(dict(task='t', method='m', step=200,
                              score=3.0)) + '\n')
    runs = plot.load_runs([str(tmp_path)])
    assert len(runs) == 1
    assert len(runs[0]['xs']) == 3


class TestBinning:

  def test_shared_grid_and_nan_bins(self, rundir):
    runs = plot.load_runs([str(rundir)])
    binned = plot.bin_runs(runs, bins=10)
    lengths = {len(r['ys']) for r in binned}
    assert len(lengths) == 1
    # A run with a gap yields NaN in empty bins.
    gappy = [dict(task='t', method='m', seed=0,
                  xs=np.array([0.0, 900.0]), ys=np.array([1.0, 2.0]))]
    out = plot.bin_runs(gappy, bins=10, xlim=1000.0)
    assert np.isnan(out[0]['ys']).sum() >= 7

  def test_binsize_mode(self, rundir):
    runs = plot.load_runs([str(rundir)])
    binned = plot.bin_runs(runs, binsize=100.0, xlim=1000.0)
    assert all(len(r['ys']) == 10 for r in binned)


class TestStats:

  def _binned(self, rundir):
    return plot.bin_runs(plot.load_runs([str(rundir)]), bins=10)

  def test_mean_and_median(self, rundir):
    stats = plot.compute_stats(self._binned(rundir), ['mean', 'median'])
    names = {(s['name'], s['method']) for s in stats}
    assert names == {
        ('Mean', 'ours'), ('Mean', 'baseline'),
        ('Median', 'ours'), ('Median', 'baseline')}
    mean_ours = next(
        s for s in stats if s['name'] == 'Mean' and s['method'] == 'ours')
    mean_base = next(
        s for s in stats
        if s['name'] == 'Mean' and s['method'] == 'baseline')
    # 'ours' improves twice as fast; its late-training mean must win.
    assert np.nanmean(mean_ours['ys'][-3:]) > np.nanmean(mean_base['ys'][-3:])

  def test_self_normalized_in_unit_range(self, rundir):
    stats = plot.compute_stats(
        self._binned(rundir), ['self_mean', 'self_median'])
    for stat in stats:
      vals = stat['ys'][np.isfinite(stat['ys'])]
      assert (vals >= -1e-9).all() and (vals <= 1 + 1e-9).all()

  def test_auto_selects_suite(self, rundir):
    stats = plot.compute_stats(self._binned(rundir), ['auto'])
    names = {s['name'] for s in stats}
    assert names == {'Mean', 'Median'}  # dmc_* tasks -> mean/median

  def test_runs_counter(self, rundir):
    stats = plot.compute_stats(self._binned(rundir), ['runs'])
    per = {s['method']: s for s in stats}
    # 2 tasks x 2 seeds live in every bin.
    assert (per['ours']['ys'] == 4).all()

  def test_suite_normalized_with_baselines(self, rundir):
    baselines = {'atari57_gamer': {
        'dmc_walker': [0.0, 200.0], 'dmc_hopper': [0.0, 100.0]}}
    stats = plot.compute_stats(
        self._binned(rundir), ['atari_mean'], baselines)
    assert all(s['name'] == 'Gamer Mean' for s in stats)
    for stat in stats:
      vals = stat['ys'][np.isfinite(stat['ys'])]
      assert (vals >= 0).all()

  def test_dmlab_capped_mean_capped_at_one(self):
    runs = [dict(task='dmlab_x', method='m', seed=s,
                 xs=np.linspace(0, 1, 5),
                 ys=np.full(5, 500.0 + 100 * s)) for s in range(2)]
    stats = plot.compute_stats(
        runs, ['dmlab_mean_capped'],
        {'dmlab30': {'dmlab_x': [0.0, 100.0]}})
    assert (stats[0]['ys'] <= 1.0 + 1e-9).all()

  def test_baseline_without_suite_prefix(self):
    # baselines.yaml keys lack the suite prefix used in task names.
    runs = [dict(task='atari_pong', method='m', seed=0,
                 xs=np.linspace(0, 1, 4), ys=np.full(4, 10.0))]
    stats = plot.compute_stats(
        runs, ['atari_mean'], {'atari57_gamer': {'pong': [-20.7, 14.6]}})
    expected = (10.0 + 20.7) / (14.6 + 20.7)
    assert np.allclose(stats[0]['ys'], expected)


class TestSummary:

  def test_summary_table(self, rundir):
    binned = plot.bin_runs(plot.load_runs([str(rundir)]), bins=10)
    stats = plot.compute_stats(binned, ['mean'])
    summary = plot.summarize(binned, stats)
    assert 'dmc_walker/ours' in summary
    assert 'stat/Mean/ours' in summary
    assert all(np.isfinite(v) for v in summary.values())
