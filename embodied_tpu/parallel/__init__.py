from .setup import setup
from .meshes import data_sharding, make_mesh, replicated, resolve_rules
from .agent import Agent
