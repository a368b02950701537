#!/bin/bash
# Round-4d TPU measurement session — deal.II CG ordering + chunked-chain
# outer CG.  Waits for the round-4c session (profile_r7) to release the
# chip, then:
#   1. bench A/B with MGTPU_GC_CHAIN=3: rotated CG (one M-apply saved per
#      solve) + first 3 iterations in ONE program.  probe_cg_loop round-4c
#      measured chain t(3)=579 ms vs while t(3)=736 ms with the OLD
#      ordering; the rotation removes the ~145 ms init M-apply from both,
#      so expect solve ~0.43-0.45 s => ~115-122 MDoF/s.  The A/B override
#      guard keeps this run from touching the last-good seed.
# If the A/B wins (expected), flip DEFAULT_POLICY["MGTPU_GC_CHAIN"]="3"
# and run the production bench (no env knobs) to refresh the seed.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
export MGTPU_THP=1
cd /root/repo
mark() { echo "$(date +%H:%M:%S) session4d: $1" >> /tmp/tpu_health.log; }

while ! grep -q "session4c done" /tmp/tpu_health.log 2>/dev/null; do
  sleep 30
done

mark "1 bench chain A/B"
MGTPU_GC_CHAIN=3 timeout 7200 python bench.py \
  > /tmp/bench_r4d_chain.log 2>&1
echo "bench rc=$?" >> /tmp/bench_r4d_chain.log
mark "session4d done"
