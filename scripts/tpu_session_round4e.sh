#!/bin/bash
# Round-4e TPU measurement session (chip must be free):
#   1. probe_ls_chain: LS host-loop vs chunked-chain A/B at r=6/p=4 —
#      if the masked chain compiles correctly (GC did), LS sheds the
#      ~35 ms/iteration tunnel dispatch of the miscompile workaround.
#   2. profile_r7: per-level vmult + smoother + transfers + V-cycle +
#      PCG step, post-rotation — the budget that sets the next lever.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
export MGTPU_THP=1
cd /root/repo
mark() { echo "$(date +%H:%M:%S) session4e: $1" >> /tmp/tpu_health.log; }

mark "1 probe_ls_chain"
timeout 5400 python scripts/probe_ls_chain.py 6 4 4 \
  > /tmp/probe_ls_chain.log 2>&1
echo "rc=$?" >> /tmp/probe_ls_chain.log
mark "2 profile_r7"
timeout 5400 python scripts/profile_r7.py 7 4 > /tmp/profile_r7e.log 2>&1
echo "rc=$?" >> /tmp/profile_r7e.log
mark "session4e done"
