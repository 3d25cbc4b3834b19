#!/bin/bash
# Round-3 learning-curve evidence (LEARN_r03): DreamerV3 on real dm_control
# walker_walk, proprio (canonical budget) then vision (time-boxed; the
# tunneled TPU's ~50MB/s host<->device link caps image-batch training at
# ~4 train steps/s, so the vision run is bandwidth- not compute-bound).
#
# Each run retries a few times: the axon TPU plugin can fail to register
# for a short window after another process releases the tunnel.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH}
mkdir -p runs/learn_r03

run_with_retry() {
  local budget=$1; shift
  local log=$1; shift
  for attempt in 1 2 3 4 5; do
    timeout "$budget" "$@" >> "$log" 2>&1
    rc=$?
    # 124 = timeout reached (budget spent; success for our purposes).
    if [ $rc -eq 0 ] || [ $rc -eq 124 ]; then
      return 0
    fi
    echo "attempt $attempt failed rc=$rc, retrying in 60s" >> "$log"
    sleep 60
  done
}

run_with_retry 3600 runs/learn_r03/proprio.log \
  python -m embodied_tpu.models.dreamerv3.main \
  --configs dmc_proprio \
  --task dmc_walker_walk \
  --logdir runs/learn_r03/proprio \
  --run.steps 1.1e6 --run.envs 8 --run.eval_envs 0 \
  --run.log_every 60 --run.report_every 600 --run.save_every -1 --jax.precompile False

sleep 30

run_with_retry 4800 runs/learn_r03/vision.log \
  python -m embodied_tpu.models.dreamerv3.main \
  --configs dmc_vision size12m \
  --task dmc_walker_walk \
  --logdir runs/learn_r03/vision \
  --run.steps 3e5 --run.envs 4 --run.eval_envs 0 \
  --run.log_every 60 --run.report_every 900 --run.save_every -1 --jax.precompile False

echo DONE
