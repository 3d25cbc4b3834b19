"""embodied_tpu: a TPU-native reinforcement learning framework.

Built from scratch with the capabilities of danijar/embodied, redesigned
for TPU hardware: jit + NamedSharding over ('d','f','t') meshes for the
compute plane, Pallas kernels for hot sequence ops, and a host RPC layer
for the actor-learner experience plane.
"""

__version__ = '0.1.0'

from . import utils
from .core import (
    Agent, Env, Stream, Driver, Replay, Wrapper, GlobalClock, LocalClock,
    RandomAgent)
from .core import chunk, clock, limiters, selectors, streams, wrappers
from . import core
from . import run
