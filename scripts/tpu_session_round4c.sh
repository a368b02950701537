#!/bin/bash
# Round-4c TPU measurement session — run AFTER the fresh bench capture
# (one TPU process at a time).  Most decision-grade first:
#   1. probe_cg_loop: is the monolithic while_loop really ~40 ms/it over
#      the identical unrolled chain?  -> decides the chunked-chain CG.
#   2. profile_tv lite: fresh L7 vmult stage split with the production
#      flags (TCFACES landed after the last attribution).
#   3. profile_r7: per-level vmult + smoother + transfers + V-cycle +
#      PCG step — the V-cycle budget that sets the next lever.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
export MGTPU_THP=1
cd /root/repo
mark() { echo "$(date +%H:%M:%S) session4c: $1" >> /tmp/tpu_health.log; }

# wait for the bench (its wrapper appends "bench rc=" when it exits)
while ! grep -q "^bench rc=" /tmp/bench_r4c_default.log 2>/dev/null; do
  sleep 30
done

mark "1 probe_cg_loop"
timeout 5400 python scripts/probe_cg_loop.py 7 4 3 chain,while \
  > /tmp/probe_cg_loop.log 2>&1
echo "rc=$?" >> /tmp/probe_cg_loop.log
mark "2 profile_tv lite"
timeout 5400 python scripts/profile_tv.py 7 4 lite \
  > /tmp/profile_tv_lite.log 2>&1
echo "rc=$?" >> /tmp/profile_tv_lite.log
mark "3 profile_r7"
timeout 5400 python scripts/profile_r7.py 7 4 > /tmp/profile_r7c.log 2>&1
echo "rc=$?" >> /tmp/profile_r7c.log
mark "session4c done"
