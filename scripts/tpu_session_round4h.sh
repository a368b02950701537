#!/bin/bash
# Round-4h TPU session (chip must be free; run AFTER profile_l6):
#   1. bench.py refresh with MGTPU_TSPLIT=1 production default
#      (expect >= ~90 MDoF/s float / ~95 df32 if the -5% PCG-step win
#      composes; guard must stay clean, 3 iterations).
#   2. truncated hp-amg rerun: the 2 crashed + 5 budget-skipped configs
#      of results/parameters-hp-amg-trunc-tpu.txt (VERDICT weak #7 tail).
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
export MGTPU_THP=1
cd /root/repo
mark() { echo "$(date +%H:%M:%S) session4h: $1" >> /tmp/tpu_health.log; }

mark "1 bench refresh"
timeout 7200 python bench.py > /tmp/bench_r4h.log 2>&1
echo "rc=$?" >> /tmp/bench_r4h.log
tail -1 /tmp/bench_r4h.log

mark "2 hp-amg rerun"
(
  cd experiments
  timeout 10800 python run_experiment.py --isolate --budget-s 9000 \
    --out ../results/parameters-hp-amg-trunc-tpu.txt parameters_hp_amg 5 6 \
    > /tmp/hpamg_rerun.log 2>&1
  echo "rc=$?" >> /tmp/hpamg_rerun.log
)
mark "session4h done"
