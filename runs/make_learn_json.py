"""Assemble LEARN_r03.json from the learning runs' scores.jsonl files.

Usage: python runs/make_learn_json.py
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def curve(rundir, limit=40):
  path = os.path.join(rundir, 'scores.jsonl')
  if not os.path.exists(path):
    return None
  rows = []
  with open(path) as f:
    for line in f:
      line = line.strip()
      if line:
        try:
          rows.append(json.loads(line))
        except json.JSONDecodeError:
          pass
  if not rows:
    return None
  # Evenly thin long curves for the artifact.
  if len(rows) > limit:
    stride = len(rows) / limit
    rows = [rows[int(i * stride)] for i in range(limit)] + [rows[-1]]
  samples = [
      {'step': int(r['step']), 'score': round(float(r['score']), 2)}
      for r in rows]
  scores = [s['score'] for s in samples]
  third = max(1, len(scores) // 3)
  return {
      'samples': samples,
      'episodes': len(scores),
      'first_third_mean': round(sum(scores[:third]) / third, 2),
      'last_third_mean': round(sum(scores[-third:]) / len(scores[-third:]), 2),
      'max': max(scores),
  }


def main():
  out = {
      'task': 'dmc_walker_walk',
      'metric': 'episode score (dm_control reward sum, max ~1000; random '
                'policy ~25-40)',
      'runs': {},
  }
  for name in ('proprio', 'vision'):
    rundir = os.path.join(ROOT, 'runs', 'learn_r03', name)
    data = curve(rundir)
    if data:
      config = {}
      cfg = os.path.join(rundir, 'config.yaml')
      out['runs'][name] = data
  for name, data in out['runs'].items():
    data['improved'] = data['last_third_mean'] > data['first_third_mean']
  path = os.path.join(ROOT, 'LEARN_r03.json')
  with open(path, 'w') as f:
    json.dump(out, f, indent=2)
  print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != 'samples'}
                    for k, v in out['runs'].items()}, indent=2))
  print('Wrote', path)


if __name__ == '__main__':
  main()
