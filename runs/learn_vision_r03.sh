#!/bin/bash
# Round-3 learning-curve evidence, vision half (LEARN_r03): DreamerV3
# size12m on dm_control walker_walk from pixels. The tunneled TPU's
# ~50MB/s host<->device link caps image-batch training at ~4 train
# steps/s, so this run is bandwidth- not compute-bound; it is evidence
# of in-image learning, not throughput.
#
# Checkpointing stays ON (save_every default 900s) so the run resumes
# across retries — the axon TPU plugin can fail to register for a short
# window after another process releases the tunnel, hence the retry loop.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site:${PYTHONPATH}
mkdir -p runs/learn_r03

BUDGET=${1:-5400}
DEADLINE=$(( $(date +%s) + BUDGET ))

for attempt in 1 2 3 4 5 6; do
  left=$(( DEADLINE - $(date +%s) ))
  if [ "$left" -le 120 ]; then break; fi
  timeout "$left" \
    python -m embodied_tpu.models.dreamerv3.main \
    --configs dmc_vision size12m \
    --task dmc_walker_walk \
    --logdir runs/learn_r03/vision \
    --run.steps 3e5 --run.envs 4 --run.eval_envs 0 \
    --run.log_every 60 --run.report_every 900 \
    --jax.precompile False \
    >> runs/learn_r03/vision.log 2>&1
  rc=$?
  # 124 = budget spent: success for our purposes.
  if [ $rc -eq 0 ] || [ $rc -eq 124 ]; then break; fi
  echo "attempt $attempt exited rc=$rc, retrying in 60s" >> runs/learn_r03/vision.log
  sleep 60
done
echo VISION-DONE >> runs/learn_r03/vision.log
