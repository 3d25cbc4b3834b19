#!/bin/bash
# Round-5 full-stack deployment evidence: script=parallel on the real TPU.
# All roles live in one host (BatchServer actor, replay service with the
# SamplesPerInsert limiter, logger proc, env procs) training DreamerV3
# size1m on dm_control cartpole_swingup proprio. The metrics log carries
# the role stats the experience plane emits (parallel/ep_states,
# server/actor/*, replay/* insert/sample counters, latents/valid).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site:${PYTHONPATH}
mkdir -p runs/learn_r05

BUDGET=${1:-2700}
DEADLINE=$(( $(date +%s) + BUDGET ))

for attempt in 1 2 3; do
  left=$(( DEADLINE - $(date +%s) ))
  if [ "$left" -le 120 ]; then break; fi
  timeout "$left" \
    python -m embodied_tpu.models.dreamerv3.main \
    --configs dmc_proprio \
    --script parallel \
    --task dmc_cartpole_swingup \
    --logdir runs/learn_r05/parallel_cartpole \
    --run.steps 8e4 --run.envs 8 --run.eval_envs 0 \
    --run.log_every 30 --run.report_every 1e9 --run.save_every 300 \
    --jax.precompile False \
    >> runs/learn_r05/parallel_cartpole.log 2>&1
  rc=$?
  if [ $rc -eq 0 ] || [ $rc -eq 124 ]; then break; fi
  echo "attempt $attempt exited rc=$rc, retrying in 60s" >> runs/learn_r05/parallel_cartpole.log
  sleep 60
done
echo PARALLEL-DONE >> runs/learn_r05/parallel_cartpole.log
