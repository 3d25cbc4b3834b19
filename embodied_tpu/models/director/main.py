"""Director entry point. Parity: /root/reference/director/train.py."""

import os
import sys

if __name__ == '__main__' and __package__ is None:
  sys.path.insert(0, os.path.abspath(
      os.path.join(os.path.dirname(__file__), '..', '..', '..')))
  __package__ = 'embodied_tpu.models.director'

from ... import core as corelib
from ... import parallel
from .. import common


def make_agent(config):
  obs_space, act_space = common.env_spaces(config)
  if config.random_agent:
    return corelib.RandomAgent(obs_space, act_space)
  from .model import Model
  acfg = common.agent_config(config)
  jcfg = dict(config.jax)
  parallel.setup(
      platform=jcfg.get('platform') or None,
      compute_dtype=jcfg.get('compute_dtype', 'bfloat16'),
      prealloc=jcfg.get('prealloc', True),
      jit=jcfg.get('jit', True),
      debug=jcfg.get('debug', False),
      mock_devices=jcfg.get('mock_devices', 0),
      expect_devices=jcfg.get('expect_devices', 0),
      coordinator_address=jcfg.get('coordinator_address', ''),
      deterministic=jcfg.get('deterministic', False),
      transfer_guard=jcfg.get('transfer_guard', True),
  )
  model = Model(obs_space, act_space, acfg)
  return parallel.Agent(model, obs_space, act_space, acfg)


def main(argv=None):
  configs_path = os.path.join(os.path.dirname(__file__), 'configs.yaml')
  config = common.assemble_config(configs_path, argv)
  common.run_script(config, make_agent)


if __name__ == '__main__':
  main()
