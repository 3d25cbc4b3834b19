#!/bin/bash
# Round-4 exclusive-chip benchmark session: kernel A/B at size12m, the
# size sweep the judge asked for (size12m / size50m / size200m with MFU
# fields), and segment profiles for size12m and size200m.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site:${PYTHONPATH}
mkdir -p runs/bench_r04

run() {
  local name=$1; shift
  timeout 1500 python "$@" > "runs/bench_r04/${name}.log" 2>&1
  tail -1 "runs/bench_r04/${name}.log" > "runs/bench_r04/${name}.json"
}

run size12m_fused bench.py --size size12m --steps 60 --kernel fused
run size12m_auto  bench.py --size size12m --steps 60 --kernel auto
run size12m_off   bench.py --size size12m --steps 60 --kernel off
run size50m       bench.py --size size50m --steps 30
run size200m      bench.py --size size200m --steps 10 --batch 16

timeout 1500 python tools/profile_train.py --size size12m --iters 20 \
  --out runs/bench_r04/profile_size12m.json \
  > runs/bench_r04/profile_size12m.log 2>&1
timeout 2400 python tools/profile_train.py --size size200m --iters 5 \
  --out runs/bench_r04/profile_size200m.json \
  > runs/bench_r04/profile_size200m.log 2>&1

echo BENCH-R04-DONE
