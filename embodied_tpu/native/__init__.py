"""Native (C++) runtime components, compiled on demand with g++.

The reference delegates all heavy lifting to Python libraries; this
framework's host dataplane is native where it matters:

- `_dataplane`: zero-copy binary codec for RPC payloads (dicts of numpy
  arrays). Replaces pickle-5 message walking with one C call per message;
  large arrays are never copied on either side (scatter-gather send,
  aliasing views on receive).

Build artifacts are cached next to the source and rebuilt when the source
changes. Everything degrades gracefully to the pure-Python path when no
compiler is available (`codec` is None then).
"""

import hashlib
import importlib.util
import os
import subprocess
import sysconfig

_DIR = os.path.dirname(os.path.abspath(__file__))


def _build(name, sources):
  src = os.path.join(_DIR, sources)
  with open(src, 'rb') as f:
    digest = hashlib.sha256(f.read()).hexdigest()[:16]
  suffix = sysconfig.get_config_var('EXT_SUFFIX') or '.so'
  out = os.path.join(_DIR, f'{name}{suffix}')
  stamp = os.path.join(_DIR, f'.{name}.stamp')
  if os.path.exists(out) and os.path.exists(stamp):
    with open(stamp) as f:
      if f.read().strip() == digest:
        return out
  import numpy as np
  include = sysconfig.get_path('include')
  cmd = [
      'g++', '-O3', '-std=c++17', '-shared', '-fPIC',
      f'-I{include}', f'-I{np.get_include()}',
      src, '-o', out,
  ]
  try:
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)
  except (OSError, subprocess.SubprocessError) as e:
    stderr = getattr(e, 'stderr', b'') or b''
    print(f'native: build of {name} failed '
          f'({type(e).__name__}): {stderr.decode()[:500]}')
    return None
  with open(stamp, 'w') as f:
    f.write(digest)
  return out


def _load(name, sources):
  path = _build(name, sources)
  if not path:
    return None
  spec = importlib.util.spec_from_file_location(name, path)
  module = importlib.util.module_from_spec(spec)
  try:
    spec.loader.exec_module(module)
  except ImportError as e:
    print(f'native: load of {name} failed: {e}')
    return None
  return module


if os.environ.get('EMBODIED_TPU_NO_NATIVE'):
  codec = None
else:
  codec = _load('_dataplane', 'dataplane.cpp')
