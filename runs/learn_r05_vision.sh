#!/bin/bash
# Round-5 vision learning evidence: DreamerV3 size12m on dm_control
# walker_walk from pixels at the canonical dmc_vision ratio (256).
# Exercises the fused observe window AND the fused whole-horizon
# imagination rollout (policy in-kernel) in a real learning run.
# Env stepping (DMC pixel rendering on the 2-core host) is the
# bottleneck at ~13 env fps; the budget targets >= 100k env steps.
# Reports are disabled: the experimental tunnel client leaks host RSS
# (~2 GB/min while training), so the run OOM-restarts every ~60 min via
# the retry loop below, and each fresh process would re-pay a ~25-min
# remote compile of the report program at its first report boundary.
# scores.jsonl (the learning evidence) does not need reports.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site:${PYTHONPATH}
mkdir -p runs/learn_r05

BUDGET=${1:-9300}
DEADLINE=$(( $(date +%s) + BUDGET ))

for attempt in 1 2 3 4 5; do
  left=$(( DEADLINE - $(date +%s) ))
  if [ "$left" -le 180 ]; then break; fi
  timeout "$left" \
    python -m embodied_tpu.models.dreamerv3.main \
    --configs dmc_vision size12m \
    --task dmc_walker_walk \
    --logdir runs/learn_r05/vision \
    --run.steps 3e5 --run.envs 4 --run.eval_envs 0 \
    --run.log_every 60 --run.report_every 1e9 --run.save_every 600 \
    --jax.precompile False \
    >> runs/learn_r05/vision.log 2>&1
  rc=$?
  if [ $rc -eq 0 ] || [ $rc -eq 124 ]; then break; fi
  echo "attempt $attempt exited rc=$rc, retrying in 60s" >> runs/learn_r05/vision.log
  sleep 60
done
echo VISION-DONE >> runs/learn_r05/vision.log
