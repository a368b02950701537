#!/bin/bash
# Round-4g TPU session — runs after session4f (r=8 envelope probe):
#   1. probe_pcg_context: bisect the ~38 ms PCG-step in-context residue
#      (V+A vs V+tail vs V+A+tail at r=7/p=4).
#   2. run_sweep_family: refresh all seven results/ artifacts with the
#      production engine (chain CG + deal.II ordering + lane-dense
#      pipeline) — also a broad correctness sweep: every solve runs
#      under the recomputed-residual guard.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
export MGTPU_THP=1
cd /root/repo
mark() { echo "$(date +%H:%M:%S) session4g: $1" >> /tmp/tpu_health.log; }

while ! grep -q "session4f done" /tmp/tpu_health.log 2>/dev/null; do
  sleep 60
done

mark "1 probe_pcg_context"
timeout 5400 python scripts/probe_pcg_context.py 7 4 \
  > /tmp/probe_pcg_context.log 2>&1
echo "rc=$?" >> /tmp/probe_pcg_context.log
mark "2 sweep family refresh"
bash scripts/run_sweep_family.sh > /tmp/sweep_family_r4.log 2>&1
echo "rc=$?" >> /tmp/sweep_family_r4.log
mark "session4g done"
