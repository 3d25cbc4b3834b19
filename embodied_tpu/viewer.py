"""Terminal metrics viewer for metrics.jsonl logs.

Capability parity: the `scope` satellite library's role (inspecting run
metrics); this renders latest values and sparkline histories for selected
metrics directly in the terminal.

Usage:
  python -m embodied_tpu.viewer ~/logdir/run1 [--filter score|loss]
"""

import argparse
import json
import os
import re

BARS = ' .:-=+*#%@'


def sparkline(values, width=40):
  if not values:
    return ''
  values = values[-width:]
  lo, hi = min(values), max(values)
  span = (hi - lo) or 1.0
  chars = [BARS[int((v - lo) / span * (len(BARS) - 1))] for v in values]
  return ''.join(chars)


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('logdir')
  parser.add_argument('--filter', default='.*')
  parser.add_argument('--width', type=int, default=40)
  args = parser.parse_args()

  path = os.path.join(os.path.expanduser(args.logdir), 'metrics.jsonl')
  if not os.path.exists(path):
    print(f'No metrics.jsonl in {args.logdir}')
    return
  pattern = re.compile(args.filter)
  series = {}
  steps = {}
  with open(path) as f:
    for line in f:
      line = line.strip()
      if not line:
        continue
      record = json.loads(line)
      step = record.pop('step', 0)
      for key, value in record.items():
        if not pattern.search(key):
          continue
        series.setdefault(key, []).append(float(value))
        steps[key] = step

  if not series:
    print('No matching metrics.')
    return
  namelen = max(len(k) for k in series)
  for key in sorted(series):
    values = series[key]
    print(f'{key:<{namelen}}  {values[-1]:>12.4g}  '
          f'{sparkline(values, args.width)}  (n={len(values)}, '
          f'step={steps[key]})')


if __name__ == '__main__':
  main()
