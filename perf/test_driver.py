"""Driver env-stepping throughput (manual; not run in CI).

Capability parity: /root/reference/embodied/perf/test_driver.py.
"""

import sys
import time

sys.path.insert(0, '.')

from embodied_tpu.core import Driver, RandomAgent
from embodied_tpu.envs import Dummy


def bench(envs, parallel, steps=2000):
  driver = Driver(
      [lambda: Dummy('disc', size=(64, 64))] * envs, parallel=parallel)
  env = Dummy('disc', size=(64, 64))
  agent = RandomAgent(env.obs_space, env.act_space)
  driver.reset(agent.init_policy)
  driver(agent.policy, steps=envs * 10)  # Warmup.
  t0 = time.perf_counter()
  driver(agent.policy, steps=steps)
  dt = time.perf_counter() - t0
  print(f'envs={envs:3d} parallel={parallel}  fps={steps / dt:8.0f}')
  driver.close()


if __name__ == '__main__':
  for envs in (4, 16):
    bench(envs, parallel=False)
    bench(envs, parallel='thread')
    bench(envs, parallel='process')
