"""Device meshes and regex partition rules.

Capability parity: /root/reference/embodied/jax/agent.py:88-122 and
jax/transform.py:156-173 — a ('d','f','t') mesh (data / fsdp / tensor), data
sharded over ('d','f'), and parameter shardings resolved from regex rules
supplied by the model. On TPU the mesh axes are laid out so collectives
ride ICI: jax.make_mesh picks a device assignment matching the physical
topology.
"""

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(spec='-1,1,1', devices=None):
  """Build a ('d','f','t') mesh from a 'd,f,t' size spec; -1 = remainder."""
  devices = devices if devices is not None else jax.devices()
  sizes = [int(x) for x in str(spec).split(',')]
  assert len(sizes) == 3, spec
  n = len(devices)
  known = int(np.prod([x for x in sizes if x > 0]))
  sizes = [n // known if x == -1 else x for x in sizes]
  total = int(np.prod(sizes))
  assert total <= n, (spec, n, sizes)
  devices = list(devices)[:total]  # Fixed specs may use a device subset.
  try:
    from jax.sharding import AxisType
    # Auto axes: GSPMD propagates shardings and inserts collectives; the
    # newer Explicit mode would require sharding-correct ops everywhere.
    return jax.make_mesh(
        tuple(sizes), ('d', 'f', 't'), devices=devices,
        axis_types=(AxisType.Auto,) * 3)
  except (TypeError, ImportError):
    arr = np.asarray(devices).reshape(tuple(sizes))
    return Mesh(arr, ('d', 'f', 't'))


def data_sharding(mesh):
  """Batch-dim sharding over the data and fsdp axes."""
  return NamedSharding(mesh, P(('d', 'f')))


def replicated(mesh):
  return NamedSharding(mesh, P())


def resolve_rules(shapes, rules, mesh):
  """Map each store path to a NamedSharding via first-match regex rules.

  `shapes` maps path -> array/ShapeDtypeStruct. `rules` is a sequence of
  (pattern, spec) where spec is a tuple of axis names / None / nested
  tuples. Specs shorter than the array rank are right-aligned (a
  (None, 'f') rule shards the LAST dim of a conv kernel, not a spatial
  dim). Axes whose mesh extent does not divide the dimension are dropped
  (replicated) rather than erroring, so one rule can cover layers of many
  sizes. Paths matching no rule are replicated. Optimizer slots named
  '<opt>/rms.<dotted-param-path>' inherit their parameter's sharding.
  """
  compiled = [(re.compile(pat), tuple(spec)) for pat, spec in rules]
  axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
  shardings = {}
  for path, shape in shapes.items():
    shape = tuple(getattr(shape, 'shape', shape))
    lookup = path
    m = re.match(r'^.*/(?:rms|mom)\.(.+)$', path)
    if m:
      lookup = m.group(1).replace('.', '/')
    spec = None
    for pattern, pspec in compiled:
      if pattern.search(lookup):
        spec = pspec
        break
    shardings[path] = NamedSharding(mesh, _fit_spec(spec, shape, axis_sizes))
  return shardings


def _fit_spec(spec, shape, axis_sizes):
  if not spec or not shape:
    return P()
  spec = tuple(spec)[-len(shape):]
  spec = (None,) * (len(shape) - len(spec)) + spec  # Right-align.
  fitted = []
  for dim, entry in zip(shape, spec):
    if entry is None:
      fitted.append(None)
      continue
    axes = entry if isinstance(entry, (tuple, list)) else (entry,)
    extent = int(np.prod([axis_sizes[a] for a in axes]))
    if extent > 1 and dim % extent == 0:
      fitted.append(tuple(axes) if len(axes) > 1 else axes[0])
    else:
      fitted.append(None)
  return P(*fitted)


def shard_batch_spec(tree_example, mesh):
  """Sharding pytree matching `tree_example` with batch-dim sharding."""
  sharding = data_sharding(mesh)
  return jax.tree.map(lambda _: sharding, tree_example)
