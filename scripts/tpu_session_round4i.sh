#!/bin/bash
# Round-4i TPU session (runs AFTER the in-flight bench.py finishes; the
# launcher waits on its pid so only one TPU process exists at a time):
#   1. truncated hp-amg rerun tail: configs 0005-0013 of
#      parameters_hp_amg 5 6 (the 2 crashed + budget-skipped configs;
#      VERDICT weak #7 tail) into a part2 artifact.
#   2. fresh post-ROWSF/TVCYCLE V-cycle budget (profile_r7) — the new
#      production stage attribution for RESULTS.
#   3. LS solve A/B at r=6/p=4 under the new defaults (do rowsf/tvcycle
#      compose with the LS hierarchy + chain CG?).
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
export MGTPU_THP=1
cd /root/repo
mark() { echo "$(date +%H:%M:%S) session4i: $1" >> /tmp/tpu_health.log; }

if [ -f /tmp/bench.pid ]; then
  while kill -0 "$(cat /tmp/bench.pid)" 2>/dev/null; do sleep 20; done
fi

mark "1 hp-amg rerun tail"
(
  cd experiments
  timeout 10800 python run_experiment.py --isolate --budget-s 9600 --skip-n 5 \
    --out ../results/parameters-hp-amg-trunc-tpu-part2.txt parameters_hp_amg 5 6 \
    > /tmp/hpamg_rerun.log 2>&1
  echo "rc=$?" >> /tmp/hpamg_rerun.log
)
tail -3 /tmp/hpamg_rerun.log

mark "2 profile_r7 fresh budget"
timeout 5400 python scripts/profile_r7.py > /tmp/profile_r7_4i.log 2>&1
echo "rc=$?" >> /tmp/profile_r7_4i.log

mark "3 LS A/B new defaults"
timeout 5400 python scripts/probe_ls_chain.py > /tmp/ls_4i.log 2>&1
echo "rc=$?" >> /tmp/ls_4i.log
mark "session4i done"
