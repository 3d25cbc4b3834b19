#!/bin/bash
# Round-5 Director learning evidence on its home benchmark: PinPad.
# pinpad_three (visit 3 pads in order; pure-Python in-image env) with the
# default Director config (goal VAE + manager/worker AC). The harvest
# script compares the curve against the random-agent baseline.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site:${PYTHONPATH}
mkdir -p runs/learn_r05

BUDGET=${1:-3000}
DEADLINE=$(( $(date +%s) + BUDGET ))

for attempt in 1 2 3; do
  left=$(( DEADLINE - $(date +%s) ))
  if [ "$left" -le 120 ]; then break; fi
  timeout "$left" \
    python -m embodied_tpu.models.director.main \
    --task pinpad_three --env.pinpad.length 2000 \
    --logdir runs/learn_r05/pinpad \
    --run.steps 1e6 --run.envs 8 --run.eval_envs 0 \
    --run.train_ratio 64 \
    --run.log_every 30 --run.report_every 1e9 --run.save_every 300 \
    >> runs/learn_r05/pinpad.log 2>&1
  rc=$?
  if [ $rc -eq 0 ] || [ $rc -eq 124 ]; then break; fi
  echo "attempt $attempt exited rc=$rc, retrying in 60s" >> runs/learn_r05/pinpad.log
  sleep 60
done
echo PINPAD-DONE >> runs/learn_r05/pinpad.log
