#!/bin/bash
# Round-4f TPU measurement session (chip must be free):
#   1. microbench_vecops: isolate the ~38 ms/iteration of outer-CG
#      dots/axpys above V + A (profile_r7e) — which op shape pays.
#   2. probe_r8_solve: quadrant r=8/p=4 (~138M DoF) single-chip solve —
#      the envelope point (host build proven at 136M; HBM estimate
#      ~11-13 of 16 GB).  May OOM: that is a measured answer too.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
export MGTPU_THP=1
cd /root/repo
mark() { echo "$(date +%H:%M:%S) session4f: $1" >> /tmp/tpu_health.log; }

mark "1 microbench_vecops"
timeout 3600 python scripts/microbench_vecops.py \
  > /tmp/microbench_vecops.log 2>&1
echo "rc=$?" >> /tmp/microbench_vecops.log
mark "2 probe_r8_solve"
timeout 9000 python scripts/probe_r8_solve.py 8 4 \
  > /tmp/probe_r8.log 2>&1
echo "rc=$?" >> /tmp/probe_r8.log
mark "session4f done"
