#!/bin/bash
# Round-4 vision learning evidence: DreamerV3 size12m on dm_control
# walker_walk from pixels — exercises BOTH fused kernels (observe window
# + imagination step) in a real learning run. Bandwidth-bound through
# the tunneled chip; evidence of in-image learning, not throughput.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site:${PYTHONPATH}
mkdir -p runs/learn_r04

BUDGET=${1:-3600}
DEADLINE=$(( $(date +%s) + BUDGET ))

for attempt in 1 2 3 4; do
  left=$(( DEADLINE - $(date +%s) ))
  if [ "$left" -le 120 ]; then break; fi
  timeout "$left" \
    python -m embodied_tpu.models.dreamerv3.main \
    --configs dmc_vision size12m \
    --task dmc_walker_walk \
    --logdir runs/learn_r04/vision \
    --run.steps 3e5 --run.envs 4 --run.eval_envs 0 \
    --run.log_every 60 --run.report_every 900 \
    --jax.precompile False \
    >> runs/learn_r04/vision.log 2>&1
  rc=$?
  if [ $rc -eq 0 ] || [ $rc -eq 124 ]; then break; fi
  echo "attempt $attempt exited rc=$rc, retrying in 60s" >> runs/learn_r04/vision.log
  sleep 60
done
echo VISION-DONE >> runs/learn_r04/vision.log
