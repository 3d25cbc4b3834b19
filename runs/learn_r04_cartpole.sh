#!/bin/bash
# Round-4 learning evidence, second task: DreamerV3 on dm_control
# cartpole_swingup, proprio, canonical dmc_proprio settings. Swingup
# solves fast (random ~20-80, solved ~850), so a ~45-minute budget gives
# a complete curve.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site:${PYTHONPATH}
mkdir -p runs/learn_r04

BUDGET=${1:-2700}
DEADLINE=$(( $(date +%s) + BUDGET ))

for attempt in 1 2 3 4; do
  left=$(( DEADLINE - $(date +%s) ))
  if [ "$left" -le 120 ]; then break; fi
  timeout "$left" \
    python -m embodied_tpu.models.dreamerv3.main \
    --configs dmc_proprio \
    --task dmc_cartpole_swingup \
    --logdir runs/learn_r04/cartpole \
    --run.steps 1.1e6 --run.envs 8 --run.eval_envs 0 \
    --run.log_every 60 --run.report_every 600 \
    --jax.precompile False \
    >> runs/learn_r04/cartpole.log 2>&1
  rc=$?
  if [ $rc -eq 0 ] || [ $rc -eq 124 ]; then break; fi
  echo "attempt $attempt exited rc=$rc, retrying in 60s" >> runs/learn_r04/cartpole.log
  sleep 60
done
echo CARTPOLE-DONE >> runs/learn_r04/cartpole.log
