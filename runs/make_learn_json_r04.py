"""Assemble LEARN_r04.json from the round-4 learning runs' scores.jsonl.

Usage: python runs/make_learn_json_r04.py

Round-4 learning evidence is dm_control (walker_walk proprio to the
600+ score band, plus cartpole_swingup as a second task). Crafter — the
round-3 ask — is NOT installable in this image (zero egress):
  $ python -c "import crafter"        -> ModuleNotFoundError
  $ pip download crafter --no-deps    -> "No matching distribution found"
That probe is recorded in the artifact so the absence is auditable.
"""

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def curve(rundir, limit=48):
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
  rows = [r for r in rows if 'score' in r and 'step' in r]
  if not rows:
    return None
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
      'last_third_mean': round(
          sum(scores[-third:]) / len(scores[-third:]), 2),
      'max': max(scores),
  }


def main():
  out = {
      'metric': 'episode score (dm_control reward sum, max ~1000; random '
                'policy ~25-40 walker, ~20-80 cartpole)',
      'crafter_note': (
          'crafter is not installed in this image and cannot be fetched '
          '(zero egress): "import crafter" -> ModuleNotFoundError; '
          '"pip download crafter --no-deps" -> no matching distribution. '
          'DMC is the canonical benchmark this image can run end-to-end.'),
      'runs': {},
  }
  for name, rel in (
      ('walker_walk_proprio', 'learn_r04/proprio'),
      ('cartpole_swingup_proprio', 'learn_r04/cartpole'),
      ('walker_walk_vision', 'learn_r04/vision'),
  ):
    data = curve(os.path.join(ROOT, 'runs', rel))
    if data:
      out['runs'][name] = data
  for name, data in out['runs'].items():
    data['improved'] = data['last_third_mean'] > data['first_third_mean']
  path = os.path.join(ROOT, 'LEARN_r04.json')
  with open(path, 'w') as f:
    json.dump(out, f, indent=2)
  print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != 'samples'}
                    for k, v in out['runs'].items()}, indent=2))
  print('Wrote', path)


if __name__ == '__main__':
  main()
