#!/bin/bash
# Round-4 learning-curve evidence (LEARN_r04): DreamerV3 on real dm_control
# walker_walk, proprio, canonical dmc_proprio budget (train_ratio 1024,
# configs.yaml:204-208). Target: episode score >= 600 past 200k steps.
#
# NOTE on Crafter (the round-3 ask): crafter is NOT installed in this image
# and cannot be fetched (zero egress):
#   $ python -c "import crafter"        -> ModuleNotFoundError
#   $ pip download crafter --no-deps    -> "No matching distribution found"
# DMC walker_walk is the canonical benchmark this image can run end-to-end.
#
# Checkpointing stays ON (save_every default 900s) so the run resumes
# across retries — the axon TPU plugin can fail to register for a short
# window after another process releases the tunnel, hence the retry loop.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site:${PYTHONPATH}
mkdir -p runs/learn_r04

BUDGET=${1:-14400}
DEADLINE=$(( $(date +%s) + BUDGET ))

for attempt in 1 2 3 4 5 6 7 8; do
  left=$(( DEADLINE - $(date +%s) ))
  if [ "$left" -le 180 ]; then break; fi
  timeout "$left" \
    python -m embodied_tpu.models.dreamerv3.main \
    --configs dmc_proprio \
    --task dmc_walker_walk \
    --logdir runs/learn_r04/proprio \
    --run.steps 1.1e6 --run.envs 8 --run.eval_envs 0 \
    --run.log_every 60 --run.report_every 600 \
    --jax.precompile False \
    >> runs/learn_r04/proprio.log 2>&1
  rc=$?
  # 124 = budget spent: success for our purposes.
  if [ $rc -eq 0 ] || [ $rc -eq 124 ]; then break; fi
  echo "attempt $attempt exited rc=$rc, retrying in 60s" >> runs/learn_r04/proprio.log
  sleep 60
done
echo PROPRIO-DONE >> runs/learn_r04/proprio.log
