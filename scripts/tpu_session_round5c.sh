#!/bin/bash
# Round-5 part 3: r=8 retry with small programs + remaining family refreshes.
# The part-2 r=8 attempt died in the REMOTE compiler (HTTP 500) on the
# chain program (3 unrolled PCG iterations x 9-level V-cycle); host-loop
# mode compiles one PCG step per dispatch — every program ~1/3 the size —
# and the banded routing (MGTPU_HOT_BOUND) keeps the t-path on.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
export MGTPU_THP=1
cd /root/repo
mark() { echo "$(date +%H:%M:%S) session5c: $1" >> /tmp/tpu_health.log; }

mark "c1 r=8/p=4 host-loop retry (small programs)"
MGTPU_HOT_BOUND=2000000 MGTPU_GC_CHAIN=0 MGTPU_GC_HOST_LOOP=1 \
  timeout 4200 python scripts/probe_r8_solve.py 8 4 \
  > /tmp/probe_r8_retry.log 2>&1

mark "c2 annulus refresh r<=6"
timeout 3000 python experiments/run_experiment.py small-scaling annulus \
  --max-ref 6 --budget-s 2700 \
  --out results/small-scaling-annulus-tpu-r5.txt \
  > /tmp/sweep_annulus_r5.log 2>&1

mark "c3 hypercube refresh r<=5"
timeout 2400 python experiments/run_experiment.py small-scaling-hypercube \
  --max-ref 5 --budget-s 2100 \
  --out results/small-scaling-hypercube-tpu-r5.txt \
  > /tmp/sweep_hypercube_r5.log 2>&1

mark "c4 final bench re-warm"
timeout 2400 python bench.py > /tmp/bench_r5_final.log 2>&1

mark "c-done"
