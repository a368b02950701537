#!/bin/bash
# Round-5 TPU session queue (STATUS.md round-5 roadmap).  Runs AFTER any
# in-flight sweep finishes (waits on /tmp/sweep.pid) — ONE TPU process at
# a time.  Every step is budget-limited and leaves a crash-safe artifact.
#
#   1. Sweep-family recapture under the production pipeline (roadmap #1):
#      resume quadrant small-scaling past whatever the round-4 session
#      captured (--skip-n from the artifact's "ran input_NNNN" count),
#      then annulus / hypercube / gaussian / parameters families.
#   2. LS chain retune A/B (k0=3 vs host loop at r=6/p=4): flip
#      MGTPU_LS_CHAIN default to 3 only if the chain wins.
#   3. hp-amg truncated boomer row at r=6 with the spectral clamp
#      (solvers/amg.py::_lam_max_dinv_a) — the round-4i CPU fix's TPU row.
#   4. Stokes / nsinker TPU throughput rows (profile_stokes_tpu.py).
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
export MGTPU_THP=1
cd /root/repo
mark() { echo "$(date +%H:%M:%S) session5: $1" >> /tmp/tpu_health.log; }

if [ -f /tmp/sweep.pid ]; then
  while kill -0 "$(cat /tmp/sweep.pid)" 2>/dev/null; do sleep 20; done
fi

# 1a. quadrant resume.  The round-4 session captured config 0 into the
# main artifact and configs 19 (r7/p4 GC) + 14,15 (r6/p4) into
# *-r7p4.txt / *-r6p4.txt part files; resume from config 1 — the three
# already-captured configs rerun at warm cache (cheap) and the part
# files remain the canonical rows if the rerun is budget-cut.
mark "1a quadrant resume skip-n=1"
timeout 7200 python experiments/run_experiment.py small-scaling quadrant \
  --max-ref 7 --budget-s 6000 --isolate --skip-n 1 \
  --out results/small-scaling-quadrant-tpu-part2.txt \
  > /tmp/sweep_quadrant_r5.log 2>&1

mark "1b annulus"
timeout 5400 python experiments/run_experiment.py small-scaling annulus \
  --max-ref 7 --budget-s 4800 --isolate \
  --out results/small-scaling-annulus-tpu.txt \
  > /tmp/sweep_annulus_r5.log 2>&1

mark "1c hypercube + gaussian"
timeout 3600 python experiments/run_experiment.py small-scaling-hypercube \
  --max-ref 6 --budget-s 3000 --isolate \
  --out results/small-scaling-hypercube-tpu.txt \
  > /tmp/sweep_hypercube_r5.log 2>&1
timeout 3600 python experiments/run_experiment.py small-scaling-gaussian \
  --max-ref 6 --budget-s 3000 --isolate \
  --out results/small-scaling-gaussian-tpu.txt \
  > /tmp/sweep_gaussian_r5.log 2>&1

mark "1d parameters families"
timeout 3600 python experiments/run_experiment.py parameters_smoother_degree 4 5 6 \
  --budget-s 3000 --isolate \
  --out results/parameters-smoother-degree-tpu.txt \
  > /tmp/sweep_smoother_r5.log 2>&1
timeout 3600 python experiments/run_experiment.py parameters_mgnumber 4 5 6 \
  --budget-s 3000 --isolate \
  --out results/parameters-mgnumber-tpu.txt \
  > /tmp/sweep_mgnumber_r5.log 2>&1

mark "2 LS chain k0=3 A/B"
timeout 3600 python scripts/probe_ls_chain.py 6 4 3 > /tmp/probe_ls_k3.log 2>&1

mark "3 hp-amg boomer r=6 (spectral clamp)"
timeout 3600 python experiments/run_experiment.py parameters_hp_amg 6 \
  --skip-n 6 --budget-s 3000 --isolate \
  --out results/parameters-hp-amg-trunc-tpu-boomer.txt \
  > /tmp/hpamg_boomer_r5.log 2>&1

mark "4 stokes/nsinker rows"
timeout 5400 python scripts/profile_stokes_tpu.py 4 1e4 3 \
  > /tmp/stokes_tpu_r5.log 2>&1

mark "done"
